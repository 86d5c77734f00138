"""HookedViT — TPU-native re-design of
``/root/reference/src/vit_prisma/models/base_vit.py:60``.

The model is a *pure function* over a parameter pytree.  ``run_with_cache``
jit-specializes on the static set of requested hook names: the whole cached
forward compiles to one XLA program whose outputs are (logits, cache-pytree),
so activation capture is free of Python hook machinery and the cache lives in
HBM (and can be donated straight into the SAE activation store).

Parameters are stored *stacked over layers*: ``params['blocks']['attn']['W_Q']``
has shape ``[n_layers, n_heads, d_model, d_head]``.  This gives (a) the
stacked weight properties of the reference (base_vit.py:758-824) for free,
(b) clean pjit sharding specs per logical axis, and (c) a ``lax.scan`` path
for fast compilation of deep models.
"""

from __future__ import annotations

import math
from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vit_prisma_tpu.configs.vit_config import ViTConfig
from vit_prisma_tpu.models import layers as L
from vit_prisma_tpu.prisma.hooks import (
    NULL_HOOKS,
    HookRuntime,
    NamesFilter,
    hook_key,
    resolve_names_filter,
)

Params = Dict[str, Any]


# ---------------------------------------------------------------------------
# Hook-name inventory (the API contract — SURVEY.md §2.13, verified against
# /root/reference/tests/test_cache_hook_names.py:23-51)
# ---------------------------------------------------------------------------

def block_hook_names(cfg: ViTConfig, l: int) -> List[str]:
    p = f"blocks.{l}"
    names = [f"{p}.hook_resid_pre"]
    if cfg.use_attn_in:
        names.append(f"{p}.hook_attn_in")
    if cfg.use_split_qkv_input:
        names += [f"{p}.hook_q_input", f"{p}.hook_k_input", f"{p}.hook_v_input"]

    ln1 = [f"{p}.ln1.hook_scale", f"{p}.ln1.hook_normalized"] if cfg.normalization_type else []
    attn = [f"{p}.attn.hook_q", f"{p}.attn.hook_k", f"{p}.attn.hook_v",
            f"{p}.attn.hook_attn_scores", f"{p}.attn.hook_pattern",
            f"{p}.attn.hook_z"]
    if cfg.use_attn_result:
        attn.append(f"{p}.attn.hook_result")

    if cfg.use_bert_block:
        names += attn + [f"{p}.hook_attn_out"] + ln1
    else:
        names += ln1 + attn + [f"{p}.hook_attn_out"]

    if not cfg.attn_only:
        names.append(f"{p}.hook_resid_mid")
        if cfg.use_hook_mlp_in:
            names.append(f"{p}.hook_mlp_in")
        ln2 = [f"{p}.ln2.hook_scale", f"{p}.ln2.hook_normalized"] if cfg.normalization_type else []
        mlp = [f"{p}.mlp.hook_pre"]
        if cfg.activation_name == "solu_ln":
            mlp.append(f"{p}.mlp.hook_mid")
            if cfg.normalization_type:
                mlp += [f"{p}.mlp.ln.hook_scale", f"{p}.mlp.ln.hook_normalized"]
        mlp.append(f"{p}.mlp.hook_post")
        if cfg.use_bert_block:
            names += mlp + [f"{p}.hook_mlp_out"] + ln2
        else:
            names += ln2 + mlp + [f"{p}.hook_mlp_out"]
    names.append(f"{p}.hook_resid_post")
    return names


def hook_names(cfg: ViTConfig) -> List[str]:
    """All hook names of a HookedViT, in firing order."""
    names = ["hook_embed", "hook_pos_embed", "hook_full_embed"]
    if cfg.layer_norm_pre:
        if cfg.normalization_type:
            names += ["ln_pre.hook_scale", "ln_pre.hook_normalized"]
        names.append("hook_ln_pre")
    for l in range(cfg.n_layers):
        names += block_hook_names(cfg, l)
    if cfg.normalization_type:
        names += ["ln_final.hook_scale", "ln_final.hook_normalized"]
    names += ["hook_ln_final", "hook_post_head_pre_normalize"]
    return names


# ---------------------------------------------------------------------------
# Parameter initialization (reference base_vit.py:219-243)
# ---------------------------------------------------------------------------

def _xavier_uniform(key, shape, dtype):
    fan_in, fan_out = shape[-2], shape[-1]
    limit = math.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, dtype, -limit, limit)


def _kaiming_normal(key, shape, dtype, fan_in):
    std = math.sqrt(2.0 / fan_in)
    return jax.random.normal(key, shape, dtype) * std


def init_vit_params(cfg: ViTConfig, key: jax.Array) -> Params:
    """Random init matching the reference's scheme (xavier-uniform attention,
    kaiming-normal MLP/head/embed, zero biases, base_vit.py:219-243)."""
    dt = cfg.jax_dtype
    ks = iter(jax.random.split(key, 16))
    Lyr, H, D, Dh, M = cfg.n_layers, cfg.n_heads, cfg.d_model, cfg.d_head, cfg.d_mlp

    if cfg.is_video_transformer:
        patch_dim = cfg.n_channels * cfg.video_tubelet_depth * cfg.patch_size ** 2
    else:
        patch_dim = cfg.n_channels * cfg.patch_size ** 2

    params: Params = {
        "embed": {
            "W": _kaiming_normal(next(ks), (patch_dim, D), dt, patch_dim),
            "b": jnp.zeros((D,), dt),
        },
        "pos_embed": {"W_pos": jax.random.normal(next(ks), (cfg.n_tokens, D), dt) * cfg.pos_std},
        "head": {
            "W_H": _kaiming_normal(next(ks), (D, cfg.n_classes), dt, D),
            "b_H": jnp.zeros((cfg.n_classes,), dt),
        },
    }
    if cfg.use_cls_token:
        params["cls_token"] = jax.random.normal(next(ks), (1, 1, D), dt) * cfg.cls_std

    blocks: Params = {
        "attn": {
            "W_Q": _xavier_uniform(next(ks), (Lyr, H, D, Dh), dt),
            "W_K": _xavier_uniform(next(ks), (Lyr, H, D, Dh), dt),
            "W_V": _xavier_uniform(next(ks), (Lyr, H, D, Dh), dt),
            "W_O": _xavier_uniform(next(ks), (Lyr, H, Dh, D), dt),
            "b_Q": jnp.zeros((Lyr, H, Dh), dt),
            "b_K": jnp.zeros((Lyr, H, Dh), dt),
            "b_V": jnp.zeros((Lyr, H, Dh), dt),
            "b_O": jnp.zeros((Lyr, D), dt),
        },
    }
    if cfg.normalization_type == "LN":
        blocks["ln1"] = {"w": jnp.ones((Lyr, D), dt), "b": jnp.zeros((Lyr, D), dt)}
    if not cfg.attn_only:
        blocks["mlp"] = {
            "W_in": _kaiming_normal(next(ks), (Lyr, D, M), dt, M),
            "b_in": jnp.zeros((Lyr, M), dt),
            "W_out": _kaiming_normal(next(ks), (Lyr, M, D), dt, D),
            "b_out": jnp.zeros((Lyr, D), dt),
        }
        if cfg.normalization_type == "LN":
            blocks["ln2"] = {"w": jnp.ones((Lyr, D), dt), "b": jnp.zeros((Lyr, D), dt)}
        if cfg.activation_name == "solu_ln" and cfg.normalization_type == "LN":
            blocks["mlp"]["ln"] = {"w": jnp.ones((Lyr, M), dt), "b": jnp.zeros((Lyr, M), dt)}
    params["blocks"] = blocks

    if cfg.layer_norm_pre and cfg.normalization_type == "LN":
        params["ln_pre"] = {"w": jnp.ones((D,), dt), "b": jnp.zeros((D,), dt)}
    if cfg.normalization_type == "LN":
        params["ln_final"] = {"w": jnp.ones((D,), dt), "b": jnp.zeros((D,), dt)}
    return params


def block_slice(params: Params, l: int) -> Params:
    """View of layer ``l``'s parameters from the stacked block tree."""
    return jax.tree.map(lambda a: a[l], params["blocks"])


# ---------------------------------------------------------------------------
# Forward pass (reference base_vit.py:152-217)
# ---------------------------------------------------------------------------

def embed_tokens(params: Params, cfg: ViTConfig, x, hooks: HookRuntime):
    """Patch-embed + cls token + positional embedding + optional pre-LN."""
    if cfg.is_video_transformer:
        embed = hooks("hook_embed", L.tubelet_embedding(params["embed"], cfg, x))
    else:
        embed = hooks("hook_embed", L.patch_embedding(params["embed"], cfg, x))

    if cfg.use_cls_token:
        B = x.shape[0]
        cls = jnp.broadcast_to(params["cls_token"].astype(embed.dtype),
                               (B, 1, cfg.d_model))
        embed = jnp.concatenate([cls, embed], axis=1)

    pos = jnp.broadcast_to(params["pos_embed"]["W_pos"][None],
                           (x.shape[0], *params["pos_embed"]["W_pos"].shape))
    pos = hooks("hook_pos_embed", pos)
    residual = embed + pos
    # Reference discards the hook's return value here (base_vit.py:181) —
    # cached but not editable.
    residual = hooks("hook_full_embed", residual, editable=False)

    if cfg.layer_norm_pre:
        residual = L.apply_norm(params.get("ln_pre"), cfg, residual, hooks, "ln_pre")
        residual = hooks("hook_ln_pre", residual)
    return residual


def _use_scan(cfg: ViTConfig, hooks: HookRuntime) -> bool:
    """Whether the lax.scan block loop applies (configs/vit_config.py
    ``scan_blocks``): layers share one trace, so intervention editors —
    which may differ per layer — force the unrolled path."""
    mode = getattr(cfg, "scan_blocks", "auto")
    if mode == "never":
        return False
    has_editors = bool(getattr(hooks, "_editors", ()))
    if has_editors or getattr(hooks, "grad_mode", False):
        # grad mode (incl_bwd / bwd_hooks) injects per-name eps taps that
        # can't thread through a shared scan trace — unroll.
        return False
    if mode == "always":
        return True
    return cfg.n_layers >= 16


def _scan_blocks(params: Params, cfg: ViTConfig, residual, hooks: HookRuntime,
                 n_layers: int, dropout_key):
    """Run the block stack as one ``lax.scan`` over the stacked-by-layer
    parameter axis (the layout init_vit_params builds).  Compile time is
    O(1) in depth instead of O(n_layers) — a 48-layer ViT-G trace compiles
    in seconds instead of ~42s unrolled — with identical numerics (the
    same ops per layer).

    Hook capture under scan: the single block trace records the union of
    block-hook names any layer requests; the stacked [L, ...] outputs are
    split into the per-layer ``blocks.{l}.*`` cache entries afterwards."""
    block_fn = L.bert_block if cfg.use_bert_block else L.transformer_block
    stacked = jax.tree.map(lambda a: a[:n_layers], params["blocks"])

    # Union of per-layer-requested block hooks, as layer-0-relative names.
    rel_names: List[str] = []
    if getattr(hooks, "record", False):
        for suffix in {n.split(".", 2)[2] for n in block_hook_names(cfg, 0)}:
            if any(hooks._should_cache(f"blocks.{l}.{suffix}")
                   for l in range(n_layers)):
                rel_names.append(f"blocks.0.{suffix}")

    drop_keys = (jax.random.split(dropout_key, n_layers)
                 if dropout_key is not None else
                 jnp.zeros((n_layers, 2), jnp.uint32))
    use_dropout = dropout_key is not None

    run_block = block_fn
    if cfg.remat_blocks and not rel_names:
        # scan-over-remat: O(1) activation memory in depth — each block's
        # internals recompute in the backward.  Hook capture is a trace
        # side channel that can't cross the checkpoint boundary, so remat
        # applies only when no block hooks are cached (the training
        # forward); a cached forward compiles the plain scan.
        def run_block(bp, _cfg, carry, rt, prefix, dropout_key=None):
            if dropout_key is None:
                return jax.checkpoint(
                    lambda b, c: block_fn(b, _cfg, c, rt, prefix))(bp, carry)
            return jax.checkpoint(
                lambda b, c, k: block_fn(b, _cfg, c, rt, prefix,
                                         dropout_key=k))(bp, carry,
                                                         dropout_key)

    def body(carry, xs):
        bp, key = xs
        rt = HookRuntime(names_filter=tuple(rel_names)) if rel_names \
            else NULL_HOOKS
        out = run_block(bp, cfg, carry, rt, "blocks.0",
                        dropout_key=key if use_dropout else None)
        return out, dict(rt.cache)

    residual, stacked_cache = jax.lax.scan(body, residual,
                                           (stacked, drop_keys))
    for rel, arr in stacked_cache.items():
        suffix = rel[len("blocks.0."):]
        for l in range(n_layers):
            name = f"blocks.{l}.{suffix}"
            if hooks._should_cache(name):
                hooks.cache[name] = arr[l]
    return residual


def vit_forward(params: Params, cfg: ViTConfig, x,
                hooks: HookRuntime = NULL_HOOKS,
                stop_at_layer: Optional[int] = None,
                dropout_key: Optional[jax.Array] = None,
                start_at_layer: int = 0):
    """Full HookedViT forward.  ``stop_at_layer`` (exclusive, supports
    negative indexing) returns the residual stream early — XLA dead-code
    eliminates everything after it (base_vit.py:152-217).

    ``start_at_layer`` (our TPU-first addition; the reference always runs
    from the embedding) treats ``x`` as the residual stream ``[B, T,
    d_model]`` entering block ``start_at_layer`` and runs only the suffix.
    The all-layer SAE sweep eval uses this to amortize one clean prefix
    across every spliced layer instead of re-running the embedding + early
    blocks per layer.

    ``dropout_key`` enables train-mode dropout (reference
    transformer_block.py:113,132); leaving it ``None`` compiles the exact
    eval-mode program."""
    if start_at_layer:
        residual = x
    else:
        residual = embed_tokens(params, cfg, x, hooks)

    layer_idxs = range(cfg.n_layers)[start_at_layer:stop_at_layer]
    if _use_scan(cfg, hooks) and len(layer_idxs) > 0 and start_at_layer == 0:
        residual = _scan_blocks(params, cfg, residual, hooks,
                                len(layer_idxs), dropout_key)
    else:
        block_fn = L.bert_block if cfg.use_bert_block else L.transformer_block
        drop_keys = (jax.random.split(dropout_key, cfg.n_layers)
                     if dropout_key is not None else None)
        for l in layer_idxs:
            residual = block_fn(
                block_slice(params, l), cfg, residual, hooks, f"blocks.{l}",
                dropout_key=None if drop_keys is None else drop_keys[l])
    if stop_at_layer is not None:
        return residual

    x_out = L.apply_norm(params.get("ln_final"), cfg, residual, hooks, "ln_final")
    x_out = hooks("hook_ln_final", x_out, editable=False)

    if cfg.classification_type == "gaap":
        x_out = jnp.mean(x_out, axis=1)
    elif cfg.classification_type == "cls":
        cls_tok = x_out[:, 0]
        if "dino-vitb" in cfg.model_name:
            # DINO concat output (base_vit.py:198-204)
            patches_pooled = jnp.mean(x_out[:, 1:], axis=1)
            x_out = jnp.concatenate([cls_tok[..., None], patches_pooled[..., None]],
                                    axis=-1)
        else:
            x_out = cls_tok

    if cfg.return_type != "pre_logits":
        x_out = L.head(params["head"], cfg, x_out)

    x_out = hooks("hook_post_head_pre_normalize", x_out, editable=False)

    if cfg.normalize_output:
        x_out = x_out / jnp.linalg.norm(x_out, axis=-1, keepdims=True)
    return x_out


# ---------------------------------------------------------------------------
# HookedViT — thin stateful wrapper with jit caching
# ---------------------------------------------------------------------------

class HookedViT:
    """API-compatible counterpart of the reference ``HookedViT``.

    Holds ``cfg`` + ``params`` and compiles specialized XLA programs per
    (names-filter, hooks, stop_at_layer) combination.  Re-using the same hook
    *function objects* across calls avoids recompilation.
    """

    cfg: ViTConfig
    params: Params

    def __init__(self, cfg: ViTConfig, params: Optional[Params] = None,
                 key: Optional[jax.Array] = None):
        self.cfg = cfg
        if params is None:
            params = init_vit_params(cfg, key if key is not None else jax.random.PRNGKey(0))
        self.params = params
        self._jit_cache: Dict[Any, Callable] = {}

    # -- plain forward ---------------------------------------------------
    def __call__(self, x, stop_at_layer: Optional[int] = None,
                 dropout_key: Optional[jax.Array] = None):
        return self.forward(x, stop_at_layer=stop_at_layer,
                            dropout_key=dropout_key)

    def forward(self, x, stop_at_layer: Optional[int] = None,
                dropout_key: Optional[jax.Array] = None):
        if dropout_key is not None:
            fn = self._jit_cache.get(("fwd_train", stop_at_layer))
            if fn is None:
                cfg = self.cfg
                fn = jax.jit(lambda p, x, k: vit_forward(
                    p, cfg, x, NULL_HOOKS, stop_at_layer, dropout_key=k))
                self._jit_cache[("fwd_train", stop_at_layer)] = fn
            return fn(self.params, x, dropout_key)
        fn = self._get_jitted(("fwd", stop_at_layer), fwd_hooks=(),
                              names=None, stop_at_layer=stop_at_layer,
                              with_cache=False)
        return fn(self.params, x)

    # -- cached forward --------------------------------------------------
    def run_with_cache(self, x, names_filter: NamesFilter = None,
                       return_cache_object: bool = True,
                       stop_at_layer: Optional[int] = None,
                       fwd_hooks: Sequence[Tuple] = (),
                       remove_batch_dim: bool = False,
                       incl_bwd: bool = False,
                       bwd_hooks: Sequence[Tuple] = (),
                       loss_fn: Optional[Callable] = None):
        """Mirror of base_vit.py:245-269 / hooked_root_module.py:255.

        ``incl_bwd=True`` additionally caches, for every cached hook point
        the gradient can physically reach, the gradient of the reduced
        output under ``{name}_grad`` — the reference's
        ``run_with_cache(..., incl_bwd=True)`` + ``model_out.backward()``
        (hooked_root_module.py:283-287).  ``loss_fn(out) -> scalar`` picks
        the backward seed (default: ``out.sum()``, i.e. a ones cotangent —
        identical to ``.backward()`` on the scalar outputs torch supports).
        ``bwd_hooks`` are pure gradient editors ``f(grad, hook) -> grad``
        (the reference's ``dir="bwd"`` hooks, hook_point.py:60-79), applied
        to the cotangent before it is cached or propagated upstream.
        Forward + backward compile to ONE XLA program.

        Returns ``(output, ActivationCache)`` (or a plain dict)."""
        names = self._resolve_names(names_filter, stop_at_layer)
        grad_mode = incl_bwd or bool(bwd_hooks)
        if grad_mode:
            key = ("cache_bwd", names, hook_key(fwd_hooks),
                   hook_key(bwd_hooks), stop_at_layer, incl_bwd,
                   None if loss_fn is None else id(loss_fn))
            fn = self._get_jitted(key, fwd_hooks=tuple(fwd_hooks),
                                  names=names, stop_at_layer=stop_at_layer,
                                  with_cache=True,
                                  bwd_hooks=tuple(bwd_hooks),
                                  loss_fn=loss_fn, incl_bwd=incl_bwd)
        else:
            key = ("cache", names, hook_key(fwd_hooks), stop_at_layer)
            fn = self._get_jitted(key, fwd_hooks=tuple(fwd_hooks),
                                  names=names, stop_at_layer=stop_at_layer,
                                  with_cache=True)
        out, cache = fn(self.params, x)
        # jax pytrees sort dict keys; restore firing order (the reference's
        # cache-key order is part of the API contract).  Backward entries
        # follow in reverse firing order, as the cotangent propagates.
        ordered = {k: cache[k] for k in names if k in cache}
        if grad_mode:
            for k in reversed(names):
                if k + "_grad" in cache:
                    ordered[k + "_grad"] = cache[k + "_grad"]
        cache = ordered
        if remove_batch_dim:
            batch = next(iter(cache.values())).shape[0] if cache else 1
            assert batch == 1, (
                f"remove_batch_dim requires batch size 1, got {batch} "
                "(the reference asserts the same)")
            cache = {k: v[0] for k, v in cache.items()}
        if return_cache_object:
            from vit_prisma_tpu.prisma.cache import ActivationCache
            cache = ActivationCache(cache, self, has_batch_dim=not remove_batch_dim)
        return out, cache

    # -- intervened forward ----------------------------------------------
    def run_with_hooks(self, x, fwd_hooks: Sequence[Tuple] = (),
                       stop_at_layer: Optional[int] = None,
                       return_type: str = "output"):
        """Forward with pure intervention hooks ``(name_or_pred, fn)`` where
        ``fn(value, hook) -> value`` (hooked_root_module.py:176)."""
        key = ("hooks", hook_key(fwd_hooks), stop_at_layer)
        fn = self._get_jitted(key, fwd_hooks=tuple(fwd_hooks), names=None,
                              stop_at_layer=stop_at_layer, with_cache=False)
        return fn(self.params, x)

    # -- internals -------------------------------------------------------
    def _resolve_names(self, names_filter: NamesFilter,
                       stop_at_layer: Optional[int]) -> Tuple[str, ...]:
        """Resolve any filter to the concrete static tuple of hook names that
        can fire, preserving firing order."""
        pred = resolve_names_filter(names_filter)
        all_names = hook_names(self.cfg)
        if stop_at_layer is not None:
            keep_layers = set(range(self.cfg.n_layers)[:stop_at_layer])
            pre = {"hook_embed", "hook_pos_embed", "hook_full_embed",
                   "ln_pre.hook_scale", "ln_pre.hook_normalized", "hook_ln_pre"}
            def alive(n):
                if n in pre:
                    return True
                if n.startswith("blocks."):
                    return int(n.split(".")[1]) in keep_layers
                return False
            all_names = [n for n in all_names if alive(n)]
        return tuple(n for n in all_names if pred(n))

    def _get_jitted(self, key, *, fwd_hooks, names, stop_at_layer, with_cache,
                    bwd_hooks=(), loss_fn=None, incl_bwd=False):
        fn = self._jit_cache.get(key)
        if fn is None:
            cfg = self.cfg

            if bwd_hooks or incl_bwd:
                from vit_prisma_tpu.prisma.hooks import grad_cached_traced
                traced = grad_cached_traced(
                    lambda p, x, rt: vit_forward(p, cfg, x, rt, stop_at_layer),
                    names, fwd_hooks=fwd_hooks, bwd_hooks=bwd_hooks,
                    loss_fn=loss_fn, incl_bwd=incl_bwd)
            else:
                def traced(params, x):
                    hooks = HookRuntime(names_filter=names, fwd_hooks=fwd_hooks,
                                        record=with_cache) if (with_cache or fwd_hooks) else NULL_HOOKS
                    out = vit_forward(params, cfg, x, hooks, stop_at_layer)
                    if with_cache:
                        return out, dict(hooks.cache)
                    return out

            fn = jax.jit(traced)
            self._jit_cache[key] = fn
        return fn

    # -- multi-chip --------------------------------------------------------
    def shard(self, mesh) -> "HookedViT":
        """Place the parameters tensor-parallel on a ``jax.sharding.Mesh``
        (axes 'data'/'model'; parallel/mesh.py ``vit_param_shardings``).
        Subsequent ``forward``/``run_with_cache`` calls propagate the
        shardings through GSPMD — pass dp-sharded image batches for a fully
        sharded inference/harvest path.  Returns self.

        The fused attention kernel stays on under the mesh: its
        custom_partitioning (ops/attention.py) splits the mix over batch
        and head blocks, so each device runs the unmodified Pallas kernel
        on its shard with no collectives."""
        from vit_prisma_tpu.parallel.mesh import vit_param_shardings
        self.params = jax.device_put(self.params,
                                     vit_param_shardings(mesh, self.params))
        self.mesh = mesh
        # programs compiled pre-shard captured unsharded inputs — drop them
        self._jit_cache.clear()
        return self

    # -- state-dict round trip -------------------------------------------
    def state_dict(self) -> Dict[str, jax.Array]:
        from vit_prisma_tpu.models.loading.state_dict import unstack_params
        return unstack_params(self.params, self.cfg)

    def load_state_dict(self, flat: Dict[str, Any]):
        from vit_prisma_tpu.models.loading.state_dict import stack_params
        self.params = stack_params(flat, self.cfg)
        return self

    # -- stacked weight properties (base_vit.py:758-824) -----------------
    @property
    def W_Q(self): return self.params["blocks"]["attn"]["W_Q"]
    @property
    def W_K(self): return self.params["blocks"]["attn"]["W_K"]
    @property
    def W_V(self): return self.params["blocks"]["attn"]["W_V"]
    @property
    def W_O(self): return self.params["blocks"]["attn"]["W_O"]
    @property
    def b_Q(self): return self.params["blocks"]["attn"]["b_Q"]
    @property
    def b_K(self): return self.params["blocks"]["attn"]["b_K"]
    @property
    def b_V(self): return self.params["blocks"]["attn"]["b_V"]
    @property
    def b_O(self): return self.params["blocks"]["attn"]["b_O"]
    @property
    def W_in(self): return self.params["blocks"]["mlp"]["W_in"]
    @property
    def W_out(self): return self.params["blocks"]["mlp"]["W_out"]
    @property
    def b_in(self): return self.params["blocks"]["mlp"]["b_in"]
    @property
    def b_out(self): return self.params["blocks"]["mlp"]["b_out"]
    @property
    def W_E(self): return self.params["embed"]["W"]
    @property
    def W_pos(self): return self.params["pos_embed"]["W_pos"]
    @property
    def W_H(self): return self.params["head"]["W_H"]
    @property
    def b_H(self): return self.params["head"]["b_H"]

    @property
    def OV(self):
        from vit_prisma_tpu.prisma.factored_matrix import FactoredMatrix
        return FactoredMatrix(self.W_V, self.W_O)

    @property
    def QK(self):
        from vit_prisma_tpu.prisma.factored_matrix import FactoredMatrix
        return FactoredMatrix(self.W_Q, jnp.swapaxes(self.W_K, -2, -1))

    def tokens_to_residual_directions(self, labels) -> jax.Array:
        """Residual directions for label indices: columns of W_H
        (base_vit.py:271-287).  labels [batch] -> [batch, d_model]."""
        return jnp.swapaxes(self.W_H[:, jnp.asarray(labels)], -2, -1)

    def accumulated_bias(self, layer: int, mlp_input: bool = False,
                         include_mlp_biases: bool = True) -> jax.Array:
        """Accumulated output biases (b_O, b_out) up to the input of ``layer``
        (base_vit.py:721-754)."""
        bias = jnp.zeros((self.cfg.d_model,), jnp.float32)
        if layer > 0:
            bias = bias + self.params["blocks"]["attn"]["b_O"][:layer].sum(0)
            if include_mlp_biases and "mlp" in self.params["blocks"]:
                bias = bias + self.params["blocks"]["mlp"]["b_out"][:layer].sum(0)
        if mlp_input:
            assert layer < self.cfg.n_layers, \
                "Cannot include attn_bias from beyond the final layer"
            bias = bias + self.params["blocks"]["attn"]["b_O"][layer]
        return bias

    # -- loading ----------------------------------------------------------
    @classmethod
    def from_pretrained(cls, model_name: str, **kwargs) -> "HookedViT":
        from vit_prisma_tpu.models.loading.loader import load_hooked_model
        return load_hooked_model(model_name, **kwargs)

    @classmethod
    def from_local(cls, cfg: ViTConfig, checkpoint_path: str) -> "HookedViT":
        """Load a locally-saved checkpoint (reference base_vit.py:653-668):
        either a supervised-trainer .ckpt (pickle) or a flat state dict
        (.npz / torch .pt in reference naming)."""
        import numpy as np
        if checkpoint_path.endswith(".ckpt"):
            from vit_prisma_tpu.training.trainer import load_checkpoint
            ckpt = load_checkpoint(checkpoint_path)
            return cls(cfg, params=jax.tree.map(jnp.asarray, ckpt["params"]))
        if checkpoint_path.endswith(".npz"):
            with np.load(checkpoint_path) as z:
                flat = {k: z[k] for k in z.files}
        else:
            from vit_prisma_tpu.models.loading.loader import _load_checkpoint
            flat = _load_checkpoint(checkpoint_path)
        from vit_prisma_tpu.models.loading.state_dict import stack_params
        return cls(cfg, params=stack_params(flat, cfg))

    def save_local(self, path: str):
        """Save the flat reference-named state dict as .npz."""
        import numpy as np
        flat = {k: np.asarray(v) for k, v in self.state_dict().items()}
        np.savez(path if path.endswith(".npz") else path + ".npz", **flat)
