"""Pure-functional ViT layers (TPU-native redesign of
``/root/reference/src/vit_prisma/models/layers/``).

Every function takes a parameter dict (leaves are jnp arrays), the config,
the input, and a :class:`HookRuntime`; it returns the output and fires the
same hook points, in the same order, as the reference modules.  Parameter
*names and logical layouts* match the reference exactly
(``W_Q [n_heads, d_model, d_head]`` etc., attention.py:37-80) so weight
conversion and interpretability analyses carry over unchanged — but the
computation is expressed as batched einsums that XLA tiles onto the MXU.

Numerics notes:
 * LayerNorm computes in float32 regardless of model dtype
   (reference layer_norm.py:37-45) and caches ``hook_scale``.
 * Softmax NaN→0 guard matches attention.py:148-149.
 * ``precision`` threads the jnp matmul precision: the verification path
   uses HIGHEST to hold atol=1e-4 against the fp32 PyTorch reference; the
   speed path uses the default (bf16-friendly) precision.
"""

from __future__ import annotations

import math
import jax
import jax.numpy as jnp
import numpy as np

from vit_prisma_tpu.configs.vit_config import ViTConfig
from vit_prisma_tpu.prisma.hooks import HookRuntime, NULL_HOOKS

_PRECISIONS = {
    "default": None,
    "float32": jax.lax.Precision.HIGH,
    "high": jax.lax.Precision.HIGH,
    "highest": jax.lax.Precision.HIGHEST,
}


def prec(cfg: ViTConfig):
    return _PRECISIONS[cfg.matmul_precision]


# ---------------------------------------------------------------------------
# Activation functions (reference models/activation_fns.py:19-58)
# ---------------------------------------------------------------------------

def quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


def gelu_new(x):
    return 0.5 * x * (1.0 + jnp.tanh(np.sqrt(2.0 / np.pi) * (x + 0.044715 * x ** 3)))


def gelu_fast(x):
    return 0.5 * x * (1.0 + jnp.tanh(x * 0.7978845608 * (1.0 + 0.044715 * x * x)))


def solu(x):
    return x * jax.nn.softmax(x, axis=-1)


ACT_FNS = {
    "relu": jax.nn.relu,
    "gelu": lambda x: jax.nn.gelu(x, approximate=False),  # torch F.gelu default is exact erf
    "silu": jax.nn.silu,
    "gelu_new": gelu_new,
    "gelu_fast": gelu_fast,
    "quick_gelu": quick_gelu,
    "solu_ln": solu,
}


# ---------------------------------------------------------------------------
# LayerNorm (reference models/layers/layer_norm.py:11-93)
# ---------------------------------------------------------------------------

def layer_norm(params, cfg: ViTConfig, x, hooks: HookRuntime = NULL_HOOKS,
               prefix: str = "ln"):
    """LayerNorm with learned weight/bias; fires ``{prefix}.hook_scale`` and
    ``{prefix}.hook_normalized`` (the latter on the *affine output*,
    layer_norm.py:85-93)."""
    out_dtype = x.dtype
    if cfg.compute_in_fp32:
        x = x.astype(jnp.float32)
    x = x - jnp.mean(x, axis=-1, keepdims=True)
    scale = jnp.sqrt(jnp.mean(jnp.square(x), axis=-1, keepdims=True) + cfg.eps)
    scale = hooks(f"{prefix}.hook_scale", scale)
    x = x / scale
    out = hooks(f"{prefix}.hook_normalized", x * params["w"] + params["b"])
    return out.astype(out_dtype if not cfg.compute_in_fp32 else cfg.jax_dtype)


def layer_norm_pre(cfg: ViTConfig, x, hooks: HookRuntime = NULL_HOOKS,
                   prefix: str = "ln"):
    """Weightless center+normalize, used after LN folding
    (layer_norm.py:11-45); ``hook_normalized`` fires on the pre-affine value."""
    out_dtype = x.dtype
    if cfg.compute_in_fp32:
        x = x.astype(jnp.float32)
    x = x - jnp.mean(x, axis=-1, keepdims=True)
    scale = jnp.sqrt(jnp.mean(jnp.square(x), axis=-1, keepdims=True) + cfg.eps)
    scale = hooks(f"{prefix}.hook_scale", scale)
    out = hooks(f"{prefix}.hook_normalized", x / scale)
    return out.astype(out_dtype if not cfg.compute_in_fp32 else cfg.jax_dtype)


def apply_norm(params, cfg: ViTConfig, x, hooks, prefix):
    """Dispatch on cfg.normalization_type like the reference block __init__."""
    if cfg.normalization_type == "LN":
        return layer_norm(params, cfg, x, hooks, prefix)
    if cfg.normalization_type == "LNPre":
        return layer_norm_pre(cfg, x, hooks, prefix)
    if cfg.normalization_type is None:
        return x
    raise ValueError(f"Invalid normalization type: {cfg.normalization_type}")


# ---------------------------------------------------------------------------
# Embeddings (reference patch_embedding.py, position_embedding.py)
# ---------------------------------------------------------------------------

def patchify(cfg: ViTConfig, x):
    """[B, C, H, W] -> [B, T, C*P*P] with the same element order as
    ``Conv2d.weight.reshape(d_model, -1)`` expects (C, Ph, Pw)."""
    B, C, H, W = x.shape
    P = cfg.patch_size
    x = x.reshape(B, C, H // P, P, W // P, P)
    # -> [B, H/P, W/P, C, P, P]
    x = x.transpose(0, 2, 4, 1, 3, 5)
    return x.reshape(B, (H // P) * (W // P), C * P * P)


def patch_embedding(params, cfg: ViTConfig, x):
    """Patch embedding as patch-extraction + one big matmul — numerically the
    stride=kernel Conv2d of the reference (patch_embedding.py:14-32) but maps
    directly onto the MXU.  ``params['W']: [C*P*P, d_model]``."""
    patches = patchify(cfg, x).astype(params["W"].dtype)
    return jnp.einsum("btp,pd->btd", patches, params["W"], precision=prec(cfg)) + params["b"]


def tubelet_patchify(cfg: ViTConfig, x):
    """[B, C, T, H, W] -> [B, tokens, C*D*P*P] matching Conv3d flatten order."""
    B, C, T, H, W = x.shape
    P, D = cfg.patch_size, cfg.video_tubelet_depth
    x = x.reshape(B, C, T // D, D, H // P, P, W // P, P)
    # -> [B, T/D, H/P, W/P, C, D, P, P]
    x = x.transpose(0, 2, 4, 6, 1, 3, 5, 7)
    return x.reshape(B, (T // D) * (H // P) * (W // P), C * D * P * P)


def tubelet_embedding(params, cfg: ViTConfig, x):
    """Video tubelet embedding (reference patch_embedding.py:36-61)."""
    patches = tubelet_patchify(cfg, x).astype(params["W"].dtype)
    return jnp.einsum("btp,pd->btd", patches, params["W"], precision=prec(cfg)) + params["b"]


# ---------------------------------------------------------------------------
# Attention (reference models/layers/attention.py:23-281)
# ---------------------------------------------------------------------------

def _wants_attn_internals(hooks: HookRuntime, prefix: str) -> bool:
    """True if any hook inside the attention mix is cached or edited."""
    return any(hooks.wants(f"{prefix}.{n}") for n in
               ("hook_q", "hook_k", "hook_v", "hook_attn_scores",
                "hook_pattern", "hook_z", "hook_result"))


def _wants_ln(hooks: HookRuntime, prefix: str) -> bool:
    """True if the LN's internal hooks are cached or edited."""
    return (hooks.wants(f"{prefix}.hook_scale")
            or hooks.wants(f"{prefix}.hook_normalized"))


def _fused_ln_attention(params, ln_params, cfg: ViTConfig, x, prefix: str,
                        causal: bool = False):
    """:func:`_fused_attention` with the ln1 normalize fused into the QKV
    GEMMs' LHS load (ops/ln_matmul.py): the LN output never round-trips
    HBM, and q/k/v leave the kernel as contiguous [R, N*H] slices feeding
    the Pallas mix directly.  Affine ln1 weights fold into W_Q/W_K/W_V at
    trace time (exact algebra; see fold_ln_affine).  Engaged on the same
    hook-free speed path as :func:`_fused_attention`, additionally
    requiring that no ln1 hooks are requested."""
    from vit_prisma_tpu.ops.attention import attention_mix_tnh
    from vit_prisma_tpu.ops.ln_matmul import ln_matmul, fold_ln_affine
    scale = math.sqrt(cfg.d_head) if cfg.use_attn_scale else 1.0
    B, T, D = x.shape
    N, H = cfg.n_heads, cfg.d_head
    Wq = jnp.transpose(params["W_Q"], (1, 0, 2)).reshape(D, N * H) / scale
    Wk = jnp.transpose(params["W_K"], (1, 0, 2)).reshape(D, N * H)
    Wv = jnp.transpose(params["W_V"], (1, 0, 2)).reshape(D, N * H)
    Wo = params["W_O"].reshape(N * H, D)
    W = jnp.stack([Wq, Wk, Wv])
    b = jnp.stack([params["b_Q"].reshape(-1) / scale,
                   params["b_K"].reshape(-1), params["b_V"].reshape(-1)])
    if ln_params is not None:  # normalization_type == "LN"
        W, b = fold_ln_affine(W, b, ln_params["w"], ln_params["b"])
    qkv = ln_matmul(x.reshape(B * T, D), W, b, cfg.eps)  # [3, B*T, N*H]
    z = attention_mix_tnh(qkv[0].reshape(B, T, N * H),
                          qkv[1].reshape(B, T, N * H),
                          qkv[2].reshape(B, T, N * H), N, causal)
    return (z.reshape(B * T, N * H) @ Wo).reshape(B, T, D) + params["b_O"]


def _ln_gemm_fusable(cfg: ViTConfig, hooks: HookRuntime, prefix: str,
                     attn_mask, x) -> bool:
    """Gate for the ln1->QKV fusion: the same conditions under which
    :func:`attention` would take the whole-T fused mix, plus no ln1 hooks
    and a kernel-compatible shape."""
    if not (cfg.use_fused_ln_gemm and cfg.use_fused_attention
            and cfg.normalization_type in ("LN", "LNPre")
            and not (cfg.use_split_qkv_input or cfg.use_attn_in)
            and not cfg.use_attn_result and prec(cfg) is None):
        return False
    causal_marker = isinstance(attn_mask, str) and attn_mask == "causal"
    if not (attn_mask is None or causal_marker):
        return False
    if (_wants_attn_internals(hooks, f"{prefix}.attn")
            or _wants_ln(hooks, f"{prefix}.ln1")):
        return False
    from vit_prisma_tpu.ops.attention import mix_tnh_fits_vmem
    from vit_prisma_tpu.ops.ln_matmul import ln_matmul_fits
    B, T, D = x.shape
    return (mix_tnh_fits_vmem(T, cfg.n_heads * cfg.d_head, x.dtype.itemsize)
            and ln_matmul_fits(B * T, 3, D, cfg.n_heads * cfg.d_head,
                               x.dtype.itemsize))


def _fused_attention(params, cfg: ViTConfig, x, prefix: str,
                     causal: bool = False):
    """Fused speed path (measured +15% full-forward throughput on
    CLIP-B/32 @ batch 256): the QKV projections run as flat
    [B*T, d_model] GEMMs whose natural row-major [B, T, N*H] output feeds
    the Pallas mix kernel directly — no layout copies at the kernel
    boundary (head-major kernel operands cost 4 x ~0.45ms/layer in HBM
    copies; see docs/PERFORMANCE.md) — and the scores/softmax/AV mix runs
    per-head in VMEM with an fp32 softmax island.  Numerically equivalent
    to the einsum path modulo bf16 rounding (the fp32 softmax is the more
    accurate of the two); the NaN guard is a no-op here since unmasked
    softmax of finite scores cannot produce NaNs."""
    from vit_prisma_tpu.ops.attention import attention_mix_tnh
    scale = math.sqrt(cfg.d_head) if cfg.use_attn_scale else 1.0
    B, T, D = x.shape
    N, H = cfg.n_heads, cfg.d_head
    xf = x.reshape(B * T, D)
    Wq = jnp.transpose(params["W_Q"], (1, 0, 2)).reshape(D, N * H)
    Wk = jnp.transpose(params["W_K"], (1, 0, 2)).reshape(D, N * H)
    Wv = jnp.transpose(params["W_V"], (1, 0, 2)).reshape(D, N * H)
    Wo = params["W_O"].reshape(N * H, D)
    q = ((xf @ Wq) / scale + params["b_Q"].reshape(-1) / scale).reshape(B, T, N * H)
    k = (xf @ Wk + params["b_K"].reshape(-1)).reshape(B, T, N * H)
    v = (xf @ Wv + params["b_V"].reshape(-1)).reshape(B, T, N * H)
    z = attention_mix_tnh(q, k, v, N, causal)
    return (z.reshape(B * T, N * H) @ Wo).reshape(B, T, D) + params["b_O"]


def _flash_attention_long(params, cfg: ViTConfig, x, prefix: str,
                          causal: bool = False):
    """Video-scale fused path (T past ``mix_tnh_fits_vmem``, e.g. ViViT/
    V-JEPA tubelet stacks): same projections and epilogue as
    :func:`_fused_attention`, but the mix runs as the tiled flash kernel
    (``ops/attention.py flash_attention_padded`` — online softmax over KV
    blocks, so VMEM holds only [block_q, block_k] score tiles at any T).
    Costs one [B,T,N*H]<->[B,N,T,H] relayout pair, amortized by the T^2
    attention compute at these shapes.  T pads to the kernel's 128-row
    blocks; the padding is masked via segment ids and sliced away —
    numerics match the einsum path exactly (tests/test_perf_paths.py)."""
    from vit_prisma_tpu.ops.attention import flash_attention_padded
    scale = math.sqrt(cfg.d_head) if cfg.use_attn_scale else 1.0
    B, T, D = x.shape
    N, H = cfg.n_heads, cfg.d_head
    xf = x.reshape(B * T, D)
    Wq = jnp.transpose(params["W_Q"], (1, 0, 2)).reshape(D, N * H)
    Wk = jnp.transpose(params["W_K"], (1, 0, 2)).reshape(D, N * H)
    Wv = jnp.transpose(params["W_V"], (1, 0, 2)).reshape(D, N * H)
    Wo = params["W_O"].reshape(N * H, D)
    q = (xf @ Wq) / scale + params["b_Q"].reshape(-1) / scale
    k = xf @ Wk + params["b_K"].reshape(-1)
    v = xf @ Wv + params["b_V"].reshape(-1)

    def heads(t):
        return t.reshape(B, T, N, H).transpose(0, 2, 1, 3)

    q, k, v = heads(q), heads(k), heads(v)
    Tp = -(-T // 128) * 128
    if Tp != T:
        pad = ((0, 0), (0, 0), (0, Tp - T), (0, 0))
        q, k, v = (jnp.pad(a, pad) for a in (q, k, v))
    seg = jnp.broadcast_to(
        jnp.where(jnp.arange(Tp) < T, 1, 2)[None].astype(jnp.int32),
        (B, Tp))
    z = flash_attention_padded(q, k, v, seg, causal)
    z = z[:, :, :T].transpose(0, 2, 1, 3).reshape(B * T, N * H)
    return (z @ Wo).reshape(B, T, D) + params["b_O"]


def attention(params, cfg: ViTConfig, query_input, key_input, value_input,
              hooks: HookRuntime = NULL_HOOKS, prefix: str = "attn",
              attention_mask=None):
    """Multi-head attention with per-head parameter layout.

    Inputs are [B, pos, d_model], or [B, pos, n_heads, d_model] when
    ``use_split_qkv_input``/``use_attn_in`` (attention.py:201-207).
    Hook points: hook_q/k/v [B,pos,head,d_head], hook_attn_scores &
    hook_pattern [B,head,q_pos,k_pos], hook_z [B,pos,head,d_head],
    hook_result [B,pos,head,d_model] (gated by use_attn_result).

    When no attention-internal hook is requested (and there is no mask, no
    split inputs, no hook_result, and matmul precision is the hardware
    default), the whole mix runs as a fused Pallas kernel — see
    :func:`_fused_attention`.
    """
    p = prec(cfg)
    split = cfg.use_split_qkv_input or cfg.use_attn_in

    # `attention_mask` may be the static marker "causal" (text tower with
    # no cls/pad masking) — fusable in-kernel — or an additive array.
    causal_marker = isinstance(attention_mask, str) and \
        attention_mask == "causal"
    from vit_prisma_tpu.ops.attention import mix_tnh_fits_vmem
    fusable = (cfg.use_fused_attention and not split
               and (attention_mask is None or causal_marker)
               and not cfg.use_attn_result and p is None
               and query_input is key_input is value_input
               and not _wants_attn_internals(hooks, prefix))
    if fusable:
        # video-scale token axes (ViViT/V-JEPA tubelet stacks) blow the
        # whole-T kernel's per-head VMEM score temporaries — those shapes
        # take the tiled flash kernel (online softmax) instead
        if mix_tnh_fits_vmem(query_input.shape[1],
                             cfg.n_heads * cfg.d_head,
                             query_input.dtype.itemsize):
            return _fused_attention(params, cfg, query_input, prefix,
                                    causal=causal_marker)
        return _flash_attention_long(params, cfg, query_input, prefix,
                                     causal=causal_marker)
    if causal_marker:
        T = query_input.shape[1]
        tri = jnp.tril(jnp.ones((T, T), bool))
        attention_mask = jnp.where(tri, 0.0, -jnp.inf)

    if not split and cfg.fused_qkv and query_input is key_input is value_input:
        # One [d_model, 3*n_heads*d_head] GEMM instead of three — better MXU
        # utilization; numerically identical (same contractions, same adds).
        Wqkv = jnp.stack([params["W_Q"], params["W_K"], params["W_V"]])
        qkv = jnp.einsum("bpd,sndh->sbpnh", query_input, Wqkv, precision=p)
        q = hooks(f"{prefix}.hook_q", qkv[0] + params["b_Q"])
        k = hooks(f"{prefix}.hook_k", qkv[1] + params["b_K"])
        v = hooks(f"{prefix}.hook_v", qkv[2] + params["b_V"])
    else:
        eq = "bpnd,ndh->bpnh" if split else "bpd,ndh->bpnh"
        q = hooks(f"{prefix}.hook_q",
                  jnp.einsum(eq, query_input, params["W_Q"], precision=p) + params["b_Q"])
        k = hooks(f"{prefix}.hook_k",
                  jnp.einsum(eq, key_input, params["W_K"], precision=p) + params["b_K"])
        v = hooks(f"{prefix}.hook_v",
                  jnp.einsum(eq, value_input, params["W_V"], precision=p) + params["b_V"])

    attn_scale = math.sqrt(cfg.d_head) if cfg.use_attn_scale else 1.0
    scores = jnp.einsum("bqnh,bknh->bnqk", q, k, precision=p) / attn_scale
    if attention_mask is not None:
        scores = scores + attention_mask
    scores = hooks(f"{prefix}.hook_attn_scores", scores)

    pattern = jax.nn.softmax(scores, axis=-1)
    pattern = jnp.where(jnp.isnan(pattern), jnp.zeros_like(pattern), pattern)
    pattern = hooks(f"{prefix}.hook_pattern", pattern)
    pattern = pattern.astype(cfg.jax_dtype)

    z = hooks(f"{prefix}.hook_z",
              jnp.einsum("bknh,bnqk->bqnh", v, pattern, precision=p))

    if not cfg.use_attn_result:
        out = jnp.einsum("bqnh,nhd->bqd", z, params["W_O"], precision=p) + params["b_O"]
    else:
        # Per-head result, exposed via hook_result (attention.py:155-183).
        result = hooks(f"{prefix}.hook_result",
                       jnp.einsum("bqnh,nhd->bqnd", z, params["W_O"], precision=p))
        out = jnp.sum(result, axis=2) + params["b_O"]
    return out


# ---------------------------------------------------------------------------
# MLP (reference models/layers/mlp.py:15-81)
# ---------------------------------------------------------------------------

def mlp(params, cfg: ViTConfig, x, hooks: HookRuntime = NULL_HOOKS,
        prefix: str = "mlp"):
    p = prec(cfg)
    pre = jnp.einsum("bpd,dm->bpm", x, params["W_in"],
                     precision=p) + params["b_in"]
    return _mlp_from_pre(params, cfg, pre, hooks, prefix)


def _fused_ln_mlp(params, ln_params, cfg: ViTConfig, x,
                  hooks: HookRuntime = NULL_HOOKS, prefix: str = "mlp"):
    """MLP with the ln2 normalize fused into the W_in GEMM's LHS load
    (ops/ln_matmul.py).  ``hook_pre`` and everything after it are
    untouched — the fusion only removes the LN output's HBM round trip
    between ln2 and W_in."""
    from vit_prisma_tpu.ops.ln_matmul import ln_matmul, fold_ln_affine
    B, T, D = x.shape
    W = params["W_in"][None]
    b = params["b_in"][None]
    if ln_params is not None:  # normalization_type == "LN"
        W, b = fold_ln_affine(W, b, ln_params["w"], ln_params["b"])
    pre = ln_matmul(x.reshape(B * T, D), W, b, cfg.eps)
    return _mlp_from_pre(params, cfg, pre[0].reshape(B, T, -1), hooks,
                         prefix)


def _ln_mlp_fusable(cfg: ViTConfig, hooks: HookRuntime, prefix: str,
                    x) -> bool:
    if not (cfg.use_fused_ln_gemm
            and cfg.normalization_type in ("LN", "LNPre")
            and prec(cfg) is None):
        return False
    if _wants_ln(hooks, f"{prefix}.ln2"):
        return False
    from vit_prisma_tpu.ops.ln_matmul import ln_matmul_fits
    B, T, D = x.shape
    return ln_matmul_fits(B * T, 1, D, cfg.d_mlp, x.dtype.itemsize)


def _mlp_from_pre(params, cfg: ViTConfig, pre, hooks: HookRuntime,
                  prefix: str):
    p = prec(cfg)
    pre = hooks(f"{prefix}.hook_pre", pre)
    act_fn = ACT_FNS[cfg.activation_name]
    if not cfg.activation_name.endswith("_ln"):
        post = hooks(f"{prefix}.hook_post", act_fn(pre))
    else:
        mid = hooks(f"{prefix}.hook_mid", act_fn(pre))
        if cfg.normalization_type == "LN":
            normed = layer_norm(params["ln"], cfg, mid, hooks, f"{prefix}.ln")
        else:
            normed = layer_norm_pre(cfg, mid, hooks, f"{prefix}.ln")
        post = hooks(f"{prefix}.hook_post", normed)
    return jnp.einsum("bpm,md->bpd", post, params["W_out"], precision=p) + params["b_out"]


# ---------------------------------------------------------------------------
# Head (reference models/layers/head.py:13-38)
# ---------------------------------------------------------------------------

def head(params, cfg: ViTConfig, x):
    return jnp.einsum("...d,dc->...c", x, params["W_H"], precision=prec(cfg)) + params["b_H"]


# ---------------------------------------------------------------------------
# Dropout (reference transformer_block.py:77-78,113,132 — nn.Dropout applied
# to attn_out and mlp_out in the pre-LN block; the BertBlock has none)
# ---------------------------------------------------------------------------

def dropout(x, rate: float, key):
    """Inverted dropout.  A no-op when ``key`` is None (eval mode) or
    ``rate == 0`` — both resolved at trace time, so the eval path compiles
    to the identical XLA program as before."""
    if key is None or rate == 0.0:
        return x
    keep = jax.random.bernoulli(key, 1.0 - rate, x.shape)
    return jnp.where(keep, x / (1.0 - rate), jnp.zeros((), x.dtype)).astype(x.dtype)


# ---------------------------------------------------------------------------
# Transformer blocks (reference models/layers/transformer_block.py:30-246)
# ---------------------------------------------------------------------------

def _add_head_dimension(x, n_heads: int):
    # einops.repeat 'batch pos d_model -> batch pos n_heads d_model'
    return jnp.broadcast_to(x[:, :, None, :], (*x.shape[:2], n_heads, x.shape[-1]))


def _split_inputs(cfg, resid_pre, hooks, prefix):
    """Shared head-dim broadcast + q/k/v-input hook logic
    (transformer_block.py:88-104)."""
    if cfg.use_attn_in or cfg.use_split_qkv_input:
        attn_in = _add_head_dimension(resid_pre, cfg.n_heads)
    else:
        attn_in = resid_pre
    if cfg.use_attn_in:
        attn_in = hooks(f"{prefix}.hook_attn_in", attn_in)
    if cfg.use_split_qkv_input:
        query_input = hooks(f"{prefix}.hook_q_input", attn_in)
        key_input = hooks(f"{prefix}.hook_k_input", attn_in)
        value_input = hooks(f"{prefix}.hook_v_input", attn_in)
    else:
        query_input = key_input = value_input = attn_in
    return query_input, key_input, value_input


def transformer_block(params, cfg: ViTConfig, resid_pre,
                      hooks: HookRuntime = NULL_HOOKS, prefix: str = "blocks.0",
                      attn_mask=None, dropout_key=None):
    """Pre-LN block (transformer_block.py:80-138).  ``dropout_key`` enables
    train-mode dropout at the reference's two sites (:113, :132)."""
    if dropout_key is not None:
        attn_drop_key, mlp_drop_key = jax.random.split(dropout_key)
    else:
        attn_drop_key = mlp_drop_key = None
    resid_pre = hooks(f"{prefix}.hook_resid_pre", resid_pre)
    q_in, k_in, v_in = _split_inputs(cfg, resid_pre, hooks, prefix)

    if _ln_gemm_fusable(cfg, hooks, prefix, attn_mask, q_in):
        # zero-copy LN->QKV epilogue: ln1 never round-trips HBM
        attn_out = _fused_ln_attention(
            params["attn"], params.get("ln1") if
            cfg.normalization_type == "LN" else None, cfg, q_in,
            f"{prefix}.attn",
            causal=isinstance(attn_mask, str) and attn_mask == "causal")
    else:
        if cfg.use_split_qkv_input:
            # The reference LNs each stream separately (transformer_block.py:105-110).
            ln_q = apply_norm(params.get("ln1"), cfg, q_in, hooks, f"{prefix}.ln1")
            ln_k = apply_norm(params.get("ln1"), cfg, k_in, hooks, f"{prefix}.ln1")
            ln_v = apply_norm(params.get("ln1"), cfg, v_in, hooks, f"{prefix}.ln1")
        else:
            # q/k/v inputs are the same array — normalize once (identical math;
            # the reference's three ln1 calls are redundant compute that XLA
            # would CSE anyway, and the cached ln1 hooks see the same value).
            ln_q = ln_k = ln_v = apply_norm(params.get("ln1"), cfg, q_in, hooks, f"{prefix}.ln1")

        attn_out = attention(
            params["attn"], cfg, ln_q, ln_k, ln_v,
            hooks, f"{prefix}.attn", attn_mask,
        )
    attn_out = dropout(attn_out, cfg.attn_dropout_rate, attn_drop_key)
    attn_out = hooks(f"{prefix}.hook_attn_out", attn_out)

    if not cfg.attn_only:
        resid_mid = hooks(f"{prefix}.hook_resid_mid", resid_pre + attn_out)
        mlp_in = hooks(f"{prefix}.hook_mlp_in", resid_mid) if cfg.use_hook_mlp_in else resid_mid
        if _ln_mlp_fusable(cfg, hooks, prefix, mlp_in):
            # zero-copy LN->W_in epilogue (hook_pre onward untouched)
            mlp_out = _fused_ln_mlp(
                params["mlp"], params.get("ln2") if
                cfg.normalization_type == "LN" else None, cfg, mlp_in,
                hooks, f"{prefix}.mlp")
        else:
            normalized = apply_norm(params.get("ln2"), cfg, mlp_in, hooks, f"{prefix}.ln2")
            mlp_out = mlp(params["mlp"], cfg, normalized, hooks, f"{prefix}.mlp")
        mlp_out = dropout(mlp_out, cfg.mlp_dropout_rate, mlp_drop_key)
        mlp_out = hooks(f"{prefix}.hook_mlp_out", mlp_out)
        resid_post = hooks(f"{prefix}.hook_resid_post", resid_mid + mlp_out)
    else:
        resid_post = hooks(f"{prefix}.hook_resid_post", resid_pre + attn_out)
    return resid_post


def bert_block(params, cfg: ViTConfig, resid_pre,
               hooks: HookRuntime = NULL_HOOKS, prefix: str = "blocks.0",
               attn_mask=None, dropout_key=None):
    """Post-LN variant (transformer_block.py:141-246): LN *after* attention
    and after the MLP.  Note the reference fires hook_mlp_out *before* ln2
    here — preserved for cache parity.  The reference BertBlock has no
    dropout sites, so ``dropout_key`` is accepted but unused."""
    del dropout_key
    resid_pre = hooks(f"{prefix}.hook_resid_pre", resid_pre)
    q_in, k_in, v_in = _split_inputs(cfg, resid_pre, hooks, prefix)

    attn_out = attention(params["attn"], cfg, q_in, k_in, v_in,
                         hooks, f"{prefix}.attn", attn_mask)
    attn_out = hooks(f"{prefix}.hook_attn_out", attn_out)
    attn_out = apply_norm(params.get("ln1"), cfg, attn_out, hooks, f"{prefix}.ln1")

    if not cfg.attn_only:
        resid_mid = hooks(f"{prefix}.hook_resid_mid", resid_pre + attn_out)
        mlp_in = hooks(f"{prefix}.hook_mlp_in", resid_mid) if cfg.use_hook_mlp_in else resid_mid
        mlp_out = hooks(f"{prefix}.hook_mlp_out", mlp(params["mlp"], cfg, mlp_in, hooks, f"{prefix}.mlp"))
        mlp_out = apply_norm(params.get("ln2"), cfg, mlp_out, hooks, f"{prefix}.ln2")
        resid_post = hooks(f"{prefix}.hook_resid_post", resid_mid + mlp_out)
    else:
        resid_post = hooks(f"{prefix}.hook_resid_post", resid_pre + attn_out)
    return resid_post
