"""Sparse autoencoders (standard / gated / transcoder) as pure JAX functions.

Behavioral counterpart of ``/root/reference/src/vit_prisma/sae/sae.py:29``
(``SparseAutoencoder`` + ``StandardSparseAutoencoder`` :535-645,
``GatedSparseAutoencoder`` :648-793, ``TopK`` :795-810,
``get_activation_fn`` :813-839) and ``transcoder.py:6-117``.

TPU-native design: the forward is one fused XLA program (two MXU GEMMs +
elementwise activation); the dead-neuron ghost-grad path is expressed with a
multiplicative mask instead of boolean gather so shapes stay static under
jit.  The TopK activation uses ``jax.lax.top_k`` + scatter.  Decoder
unit-norm projection and gradient-parallel removal are pure transforms used
by the jitted train step (``vit_prisma_tpu.sae.train``).

Hook points (sae.py:54-57): ``hook_sae_in``, ``hook_hidden_pre``,
``hook_hidden_post``, ``hook_sae_out``.
"""

from __future__ import annotations

import json
import math
import os
from typing import Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from vit_prisma_tpu.prisma.hooks import NULL_HOOKS, HookRuntime
from vit_prisma_tpu.sae.config import SAERunnerConfig

Params = Dict[str, jax.Array]


class SAEOutput(NamedTuple):
    """The reference's 7-tuple (sae.py:634-645) as a named tuple."""
    sae_out: jax.Array
    feature_acts: jax.Array
    loss: jax.Array
    mse_loss: jax.Array
    l1_loss: Optional[jax.Array]
    ghost_grad_loss: jax.Array
    aux_reconstruction_loss: jax.Array


# ---------------------------------------------------------------------------
# Activation functions (sae.py:795-839)
# ---------------------------------------------------------------------------

def topk_activation(x: jax.Array, k: int) -> jax.Array:
    """Keep the top-k entries (post-ReLU), zero elsewhere — TopK module
    (sae.py:795-810) via lax.top_k + scatter along the last axis."""
    vals, idx = jax.lax.top_k(x, k)
    vals = jax.nn.relu(vals)
    return jnp.put_along_axis(jnp.zeros_like(x), idx, vals, axis=-1,
                              inplace=False)


def get_activation_fn(cfg: SAERunnerConfig):
    name = cfg.activation_fn_str
    if name == "relu":
        return jax.nn.relu
    if name == "tanh-relu":
        return lambda x: jnp.tanh(jax.nn.relu(x))
    if name == "topk":
        k = cfg.topk_k
        if cfg.topk_use_approx and jax.default_backend() == "tpu":
            # opt-in ~95%-recall fast path (ops/topk.py)
            from vit_prisma_tpu.ops.topk import topk_mask_activation_approx
            return lambda x: topk_mask_activation_approx(x, k)
        if cfg.fused_topk and jax.default_backend() == "tpu":
            # Pallas threshold kernel: one HBM read + 32 VPU passes instead
            # of XLA's full sort (~8x faster train step, see ops/topk.py).
            from vit_prisma_tpu.ops.topk import topk_mask_activation
            return lambda x: topk_mask_activation(x, k)
        return lambda x: topk_activation(x, k)
    raise ValueError(f"Unknown activation function: {name}")


# ---------------------------------------------------------------------------
# Runtime activation normalization (sae.py:59-96)
# ---------------------------------------------------------------------------

def norm_in(cfg: SAERunnerConfig, x: jax.Array):
    """Returns (normalized_x, inverse_context)."""
    if cfg.normalize_activations == "constant_norm_rescale":
        coeff = (cfg.d_in ** 0.5) / jnp.linalg.norm(x, axis=-1, keepdims=True)
        return x * coeff, ("rescale", coeff)
    if cfg.normalize_activations == "layer_norm":
        mu = x.mean(axis=-1, keepdims=True)
        xc = x - mu
        std = xc.std(axis=-1, keepdims=True, ddof=1)
        return xc / (std + 1e-5), ("ln", (mu, std))
    return x, ("none", None)


def norm_out(ctx, y: jax.Array) -> jax.Array:
    kind, data = ctx
    if kind == "rescale":
        return y / data
    if kind == "ln":
        mu, std = data
        return y * std + mu
    return y


# ---------------------------------------------------------------------------
# Initialization (sae.py:535-555, 675-695; Kaiming-uniform + unit rows)
# ---------------------------------------------------------------------------

def _kaiming_uniform(key, shape, dtype):
    # torch kaiming_uniform_(a=sqrt(5)) on [out, in]: bound = sqrt(6/((1+5)/2? ))
    # gain = sqrt(2/(1+a^2)) = sqrt(1/3); bound = gain * sqrt(3/fan_in)
    fan_in = shape[-1]
    bound = math.sqrt(1.0 / 3.0) * math.sqrt(3.0 / fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def _unit_rows(W: jax.Array) -> jax.Array:
    return W / jnp.linalg.norm(W, axis=-1, keepdims=True)


def init_sae_params(cfg: SAERunnerConfig, key: jax.Array) -> Params:
    dt = cfg.jax_dtype
    k1, k2, k3 = jax.random.split(key, 3)
    d_in, d_sae = cfg.d_in, cfg.d_sae

    if cfg.architecture == "gated":
        # GatedSparseAutoencoder.initialize_sae_weights (sae.py:658-695)
        return {
            "W_enc": _kaiming_uniform(k1, (d_in, d_sae), dt),
            "W_dec": _kaiming_uniform(k2, (d_sae, d_in), dt),
            "b_gate": jnp.zeros((d_sae,), dt),
            "r_mag": jnp.zeros((d_sae,), dt),
            "b_mag": jnp.zeros((d_sae,), dt),
            "b_enc": jnp.zeros((d_sae,), dt),
            "b_dec": jnp.zeros((d_in,), dt),
        }

    if cfg.architecture == "transcoder":
        # Transcoder.initialize_sae_weights (transcoder.py:8-27); weights are
        # unit-row kaiming like the standard SAE.
        params = {
            "W_enc": _unit_rows(_kaiming_uniform(k1, (d_in, d_sae), dt).T).T,
            "W_dec": _unit_rows(_kaiming_uniform(k2, (d_sae, cfg.d_out), dt)),
            "b_enc": jnp.zeros((d_sae,), dt),
            "b_dec": jnp.zeros((d_in,), dt),
            "b_dec_out": jnp.zeros((cfg.d_out,), dt),
        }
        if cfg.transcoder_with_skip_connection:
            params["W_skip"] = _unit_rows(_kaiming_uniform(k3, (d_in, d_in), dt))
        return params

    # standard (sae.py:537-555): W_dec kaiming-uniform with unit rows;
    # W_enc independent or tied to W_dec^T.
    W_dec = _unit_rows(_kaiming_uniform(k2, (d_sae, d_in), dt))
    if cfg.initialization_method == "encoder_transpose_decoder":
        W_enc = W_dec.T
    elif cfg.initialization_method == "independent":
        W_enc = _unit_rows(_kaiming_uniform(k1, (d_in, d_sae), dt).T).T
    else:
        raise ValueError(f"Unknown initialization method: {cfg.initialization_method}")
    return {
        "W_enc": W_enc,
        "W_dec": W_dec,
        "b_enc": jnp.zeros((d_sae,), dt),
        "b_dec": jnp.zeros((d_in,), dt),
    }


# ---------------------------------------------------------------------------
# Losses (sae.py:144-179)
# ---------------------------------------------------------------------------

def _mse_loss(x: jax.Array, sae_out: jax.Array) -> jax.Array:
    """Normalized MSE: elementwise MSE scaled by 1/||x - x̄||₂ per row
    (sae.py:144-149).

    Reductions accumulate in fp32 (`dtype=`); under bf16 compute
    (``cfg.compute_dtype``) the elementwise ops — and therefore the
    cotangent reaching ``sae_out``'s decoder GEMM — stay bf16."""
    x = jax.lax.stop_gradient(x)
    x_centred = x - x.mean(axis=0, keepdims=True)
    mse = jnp.square(sae_out - x)
    norm_factor = jnp.sqrt(jnp.square(x_centred).sum(
        axis=-1, keepdims=True, dtype=jnp.float32)).astype(x.dtype)
    return (mse / norm_factor).mean(dtype=jnp.float32)


def _ghost_residual_loss(cfg: SAERunnerConfig, params: Params, x, sae_out,
                         hidden_pre, dead_neuron_mask) -> jax.Array:
    """Ghost-grads dead-neuron resurrection loss (sae.py:151-179).  The
    reference gathers dead columns; we use a multiplicative mask (identical
    math, static shapes)."""
    residual = x - sae_out
    residual_centred = residual - residual.mean(axis=0, keepdims=True)
    l2_norm_residual = jnp.linalg.norm(residual, axis=-1)

    mask = dead_neuron_mask.astype(hidden_pre.dtype)
    ghost_feats = jnp.exp(hidden_pre) * mask
    ghost_out = ghost_feats @ params["W_dec"]
    l2_norm_ghost_out = jnp.linalg.norm(ghost_out, axis=-1)
    norm_scaling = l2_norm_residual / (1e-6 + l2_norm_ghost_out * 2)
    ghost_out = ghost_out * jax.lax.stop_gradient(norm_scaling)[:, None]

    mse_ghost = jnp.square(ghost_out - jax.lax.stop_gradient(residual)) / \
        jnp.sqrt(jnp.sum(jax.lax.stop_gradient(residual_centred) ** 2,
                         axis=-1, keepdims=True))
    rescale = jax.lax.stop_gradient(_mse_loss(x, sae_out) / (mse_ghost + 1e-6))
    return (rescale * mse_ghost).mean()


# ---------------------------------------------------------------------------
# Encode / decode / forward
# ---------------------------------------------------------------------------

def encode(params: Params, cfg: SAERunnerConfig, x: jax.Array,
           hooks: HookRuntime = NULL_HOOKS, prefix: str = ""):
    """Returns (sae_in, feature_acts, hidden_pre, norm_ctx).  ``prefix``
    namespaces the hook names (e.g. 'blocks.9.hook_resid_post.' when the
    SAE is spliced into a HookedSAEViT).

    Compute follows the *parameter* dtype: the train step casts params to
    ``cfg.compute_dtype`` for mixed-precision fwd/bwd; everywhere else the
    params carry ``cfg.jax_dtype`` and behavior is unchanged."""
    x = x.astype(params["W_enc"].dtype)
    act_fn = get_activation_fn(cfg)
    xn, ctx = norm_in(cfg, x)
    sae_in = hooks(f"{prefix}hook_sae_in", xn - params["b_dec"])

    if cfg.architecture == "gated":
        # Gated encode (sae.py:696-713)
        gate_pre = sae_in @ params["W_enc"] + params["b_gate"]
        active = (gate_pre > 0).astype(gate_pre.dtype)
        mag_pre = sae_in @ (params["W_enc"] * jnp.exp(params["r_mag"])) + params["b_mag"]
        feature_acts = hooks(f"{prefix}hook_hidden_post", active * act_fn(mag_pre))
        return sae_in, feature_acts, gate_pre, ctx

    hidden_pre = hooks(f"{prefix}hook_hidden_pre",
                       sae_in @ params["W_enc"] + params["b_enc"])
    feature_acts = hooks(f"{prefix}hook_hidden_post", act_fn(hidden_pre))
    return sae_in, feature_acts, hidden_pre, ctx


def decode(params: Params, cfg: SAERunnerConfig, feature_acts: jax.Array,
           ctx=("none", None), hooks: HookRuntime = NULL_HOOKS,
           prefix: str = "") -> jax.Array:
    if cfg.architecture == "transcoder":
        sae_out = hooks(f"{prefix}hook_sae_out",
                        feature_acts @ params["W_dec"] + params["b_dec_out"])
        return sae_out
    sae_out = hooks(f"{prefix}hook_sae_out",
                    feature_acts @ params["W_dec"] + params["b_dec"])
    return norm_out(ctx, sae_out)


def sae_forward(params: Params, cfg: SAERunnerConfig, x: jax.Array,
                y: Optional[jax.Array] = None,
                dead_neuron_mask: Optional[jax.Array] = None,
                hooks: HookRuntime = NULL_HOOKS,
                training: bool = True, prefix: str = "") -> SAEOutput:
    """Full forward with losses — StandardSparseAutoencoder.forward
    (sae.py:597-645), GatedSparseAutoencoder.forward (:726-771), or
    Transcoder.forward (transcoder.py:68-117) depending on
    ``cfg.architecture``."""
    x = x.astype(params["W_enc"].dtype)
    zero = jnp.zeros((), jnp.float32)
    sae_in, feature_acts, hidden_pre, ctx = encode(params, cfg, x, hooks,
                                                   prefix)
    sae_out = decode(params, cfg, feature_acts, ctx, hooks, prefix)

    if cfg.architecture == "transcoder":
        if cfg.transcoder_with_skip_connection:
            sae_out = sae_out + x @ params["W_skip"].T
        sae_out = norm_out(ctx, sae_out)
        target = y if y is not None else x
        mse_loss = _mse_loss(target, sae_out)
    else:
        mse_loss = _mse_loss(x, sae_out)

    ghost_loss = zero
    if (cfg.use_ghost_grads and training and dead_neuron_mask is not None
            and cfg.architecture in ("standard", "transcoder")):
        ghost_loss = _ghost_residual_loss(cfg, params, x, sae_out, hidden_pre,
                                          dead_neuron_mask)

    aux_loss = jnp.zeros(())
    if cfg.architecture == "gated":
        # Gate-path L1 weighted by decoder norms + aux reconstruction
        # (sae.py:773-792)
        pi_gate = sae_in @ params["W_enc"] + params["b_gate"]
        act_fn = get_activation_fn(cfg)
        pi_gate_act = act_fn(pi_gate) if cfg.activation_fn_str == "topk" \
            else jax.nn.relu(pi_gate)
        l1_loss = zero if cfg.activation_fn_str == "topk" else (
            cfg.l1_coefficient * jnp.sum(
                pi_gate_act * jnp.linalg.norm(params["W_dec"], axis=1),
                axis=-1, dtype=jnp.float32).mean())
        via_gate = pi_gate_act @ params["W_dec"] + params["b_dec"]
        aux_loss = jnp.sum((via_gate - sae_in) ** 2, axis=-1,
                           dtype=jnp.float32).mean()
        loss = mse_loss + l1_loss + aux_loss
        return SAEOutput(sae_out, feature_acts, loss, mse_loss, l1_loss,
                         zero, aux_loss)

    # standard / transcoder sparsity (sae.py:617-626)
    if cfg.activation_fn_str == "topk":
        l1_loss = None
        loss = mse_loss + ghost_loss
    else:
        if cfg.lp_norm == 1.0:
            sparsity = jnp.abs(feature_acts).sum(
                axis=1, dtype=jnp.float32).mean()
        else:
            sparsity = jnp.linalg.norm(feature_acts, ord=cfg.lp_norm,
                                       axis=1).mean(dtype=jnp.float32)
        l1_loss = cfg.l1_coefficient * sparsity
        loss = mse_loss + l1_loss + ghost_loss
    return SAEOutput(sae_out, feature_acts, loss, mse_loss, l1_loss,
                     ghost_loss, aux_loss)


# ---------------------------------------------------------------------------
# Constraint transforms (sae.py:276-297)
# ---------------------------------------------------------------------------

def set_decoder_norm_to_unit_norm(params: Params) -> Params:
    # axis=-1 so the same transform covers a stacked [L, d_sae, d_in]
    # sweep W_dec (identical to the reference's axis=1 on the 2D case)
    out = dict(params)
    out["W_dec"] = params["W_dec"] / jnp.linalg.norm(
        params["W_dec"], axis=-1, keepdims=True)
    return out


def remove_gradient_parallel_to_decoder_directions(grads: Params,
                                                   params: Params) -> Params:
    """Project the W_dec gradient off the direction of each (unit-norm)
    decoder row (sae.py:279-297) — keeps the unit-norm constraint to first
    order.  Last-axis contractions, so stacked [L, d_sae, d_in] sweep
    grads work unchanged."""
    g = dict(grads)
    parallel = jnp.sum(grads["W_dec"] * params["W_dec"], axis=-1,
                       keepdims=True)
    g["W_dec"] = grads["W_dec"] - parallel * params["W_dec"]
    return g


# ---------------------------------------------------------------------------
# Class wrapper with save/load (sae.py:299-528)
# ---------------------------------------------------------------------------

class SparseAutoencoder:
    """Thin stateful wrapper: params + cfg + jitted forward, with the
    reference's save/load surface."""

    def __init__(self, cfg: SAERunnerConfig, params: Optional[Params] = None,
                 key: Optional[jax.Array] = None):
        self.cfg = cfg
        if params is None:
            params = init_sae_params(
                cfg, key if key is not None else jax.random.PRNGKey(cfg.seed))
        self.params = params
        self._fwd = jax.jit(
            lambda p, x: sae_forward(p, cfg, x, training=False))
        self._fwd_out_only = jax.jit(
            lambda p, x: sae_forward(p, cfg, x, training=False).sae_out)

    def __call__(self, x, dead_neuron_mask=None) -> SAEOutput:
        return self._fwd(self.params, x)

    def encode(self, x):
        _, feats, _, _ = encode(self.params, self.cfg, x)
        return feats

    def decode(self, feats):
        return decode(self.params, self.cfg, feats)

    def reconstruct(self, x):
        """Just the reconstruction — the `return_out_only` path used for SAE
        splicing (sae.py:637-639)."""
        return self._fwd_out_only(self.params, x)

    @property
    def W_enc(self): return self.params["W_enc"]
    @property
    def W_dec(self): return self.params["W_dec"]
    @property
    def b_enc(self): return self.params.get("b_enc")
    @property
    def b_dec(self): return self.params["b_dec"]

    def get_name(self) -> str:
        return (f"sparse_autoencoder_{self.cfg.model_name}_"
                f"{self.cfg.hook_point}_{self.cfg.d_sae}").replace("/", "_")

    # -- persistence ------------------------------------------------------
    def save_model(self, path: str):
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        arrays = {k: np.asarray(v) for k, v in self.params.items()}
        np.savez(path if path.endswith(".npz") else path + ".npz",
                 __config__=json.dumps(self.cfg.to_dict()), **arrays)

    @classmethod
    def load_from_pretrained(cls, path: str) -> "SparseAutoencoder":
        if not path.endswith(".npz") and os.path.exists(path + ".npz"):
            path = path + ".npz"
        with np.load(path, allow_pickle=False) as z:
            cfg = SAERunnerConfig.from_dict(json.loads(str(z["__config__"])))
            params = {k: jnp.asarray(z[k]) for k in z.files if k != "__config__"}
        return cls(cfg, params=params)


def build_sae(cfg: SAERunnerConfig, key: Optional[jax.Array] = None) -> SparseAutoencoder:
    """Factory mirroring the trainer's Standard/Gated/Transcoder choice
    (train_sae.py:73-81)."""
    return SparseAutoencoder(cfg, key=key)
