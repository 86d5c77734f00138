"""Fused clip + parallel-projection + Adam optimizer pass (Pallas TPU).

The SAE train step's optimizer side (reference ``train_sae.py:392-411``:
grad-clip -> ``remove_gradient_parallel_to_decoder_directions`` -> Adam) is
pure memory traffic: on the 24-SAE ViT-L/14 sweep it reads/writes the 1.6 GB
parameter set and the 3.2 GB fp32 Adam moments in several separate XLA
passes (~26 ms of the 61 ms step — docs/PERFORMANCE.md).  This module fuses
scale-by-clip, the W_dec row projection, the Adam moment updates, and the
parameter update into ONE read and ONE write of every tensor:

    g'   = g * clip_scale
    g''  = g' - <g', w_row> w_row          (W_dec rows only — keeps the
                                            unit-norm constraint to 1st order,
                                            reference sae.py:279-297)
    mu   = b1 mu + (1-b1) g''
    nu   = b2 nu + (1-b2) g''^2
    p   += -lr * (mu / bc1) / (sqrt(nu / bc2) + eps)

which is exactly ``optax.adam`` (scale_by_adam + scale_by_learning_rate)
applied after the clip/projection, so the optax opt_state structure is
preserved — checkpoints and resumes are unchanged.

Moments may be stored in bfloat16 (``cfg.adam_dtype``): the kernel reads
them, runs the update math in fp32, and stores back in the storage dtype —
halving the dominant moment traffic.  The quality risk (nu in bf16 is
noisy) is gated by the config-3 training rehearsal.

A pure-XLA twin (:func:`_adam_update_ref`) implements the identical math
for the CPU test platform and for tensors whose shapes don't tile; the
kernel-vs-twin equivalence test runs the Pallas path in interpreter mode.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_VMEM_BUDGET = 13 * 1024 * 1024


def _pick_rows(R: int, C: int, itemsize_m: int) -> int | None:
    """Largest row-block so that param+grad (fp32) and moments (storage
    dtype), double-buffered in and out, fit the VMEM budget."""
    per_elem = 2 * (2 * 4 + 2 * 4 + 2 * itemsize_m + 2 * itemsize_m)
    for rb in (512, 256, 128, 64, 32, 16, 8, 4, 2, 1):
        if R % rb:
            continue
        # Mosaic block rule: the sublane dim must be 8-divisible or equal
        # the whole array dim.
        if rb % 8 and rb != R:
            continue
        if rb * C * per_elem <= _VMEM_BUDGET:
            return rb
    return None


def _adam_kernel(s_ref, p_ref, g_ref, mu_ref, nu_ref,
                 po_ref, muo_ref, nuo_ref, *,
                 b1: float, b2: float, eps: float, project: bool):
    # s_ref holds the WHOLE [L, 4] scalar table (Mosaic requires SMEM
    # blocks to equal the array dims unless 8/128-tiled — a (1, 4) block
    # over (L, 4) fails to lower for L > 1); index the layer here.
    l = pl.program_id(0)
    sc = s_ref[l, 0]
    lr = s_ref[l, 1]
    rbc1 = s_ref[l, 2]   # 1 / (1 - b1^t)
    sbc2 = s_ref[l, 3]   # 1 / sqrt(1 - b2^t)
    p = p_ref[0].astype(jnp.float32)
    g = g_ref[0].astype(jnp.float32) * sc
    if project:
        # rows are unit-norm here (set_decoder_norm ran before the forward)
        g = g - jnp.sum(g * p, axis=-1, keepdims=True) * p
    mu = b1 * mu_ref[0].astype(jnp.float32) + (1.0 - b1) * g
    nu = b2 * nu_ref[0].astype(jnp.float32) + (1.0 - b2) * (g * g)
    upd = (-lr) * (mu * rbc1) / (jnp.sqrt(nu) * sbc2 + eps)
    po_ref[0] = (p + upd).astype(po_ref.dtype)
    muo_ref[0] = mu.astype(muo_ref.dtype)
    nuo_ref[0] = nu.astype(nuo_ref.dtype)


def _adam_update_kernel(p, g, mu, nu, scal, *, b1, b2, eps, project):
    """One fused pass over a [L, R, C] tensor.  ``scal``: [L, 4] fp32
    (clip_scale, lr, 1/bc1, 1/sqrt(bc2)) per layer."""
    L, R, C = p.shape
    rb = _pick_rows(R, C, jnp.dtype(mu.dtype).itemsize)
    if rb is None:  # callers gate via _kernel_ok; defend anyway
        return _adam_update_ref(p, g, mu, nu, scal, b1=b1, b2=b2, eps=eps,
                                project=project)
    grid = (L, R // rb)
    tile = lambda: pl.BlockSpec((1, rb, C), lambda l, r: (l, r, 0),
                                memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_adam_kernel, b1=b1, b2=b2, eps=eps,
                          project=project),
        grid=grid,
        in_specs=[
            pl.BlockSpec((L, 4), lambda l, r: (0, 0),
                         memory_space=pltpu.SMEM),
            tile(), tile(), tile(), tile(),
        ],
        out_specs=(tile(), tile(), tile()),
        out_shape=(
            jax.ShapeDtypeStruct(p.shape, p.dtype),
            jax.ShapeDtypeStruct(mu.shape, mu.dtype),
            jax.ShapeDtypeStruct(nu.shape, nu.dtype),
        ),
        cost_estimate=pl.CostEstimate(
            flops=12 * L * R * C,
            bytes_accessed=L * R * C * (4 * 4 + 4 * jnp.dtype(mu.dtype).itemsize),
            transcendentals=L * R * C,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=(jax.default_backend() == "cpu"),
    )(scal, p, g, mu, nu)


def _adam_update_ref(p, g, mu, nu, scal, *, b1, b2, eps, project):
    """Pure-XLA twin of the kernel (identical math, any shape).  ``p``/``g``
    [L, ...]; ``scal`` [L, 4]."""
    bshape = (slice(None),) + (None,) * (p.ndim - 1)
    sc, lr, rbc1, sbc2 = (scal[:, i][bshape] for i in range(4))
    pf = p.astype(jnp.float32)
    gf = g.astype(jnp.float32) * sc
    if project:
        gf = gf - jnp.sum(gf * pf, axis=-1, keepdims=True) * pf
    mu_n = b1 * mu.astype(jnp.float32) + (1.0 - b1) * gf
    nu_n = b2 * nu.astype(jnp.float32) + (1.0 - b2) * (gf * gf)
    upd = (-lr) * (mu_n * rbc1) / (jnp.sqrt(nu_n) * sbc2 + eps)
    return ((pf + upd).astype(p.dtype), mu_n.astype(mu.dtype),
            nu_n.astype(nu.dtype))


def _kernel_ok(shape, itemsize_m: int) -> bool:
    """``itemsize_m`` must be the REAL Adam-moment itemsize (4 for the
    default fp32 moments) — probing with a smaller itemsize than the kernel
    uses would let shapes through whose row pick then fails at trace time
    (advisor finding r3: fp32 moments with d_sae in (26624, 35498])."""
    if jax.default_backend() == "cpu":
        return False  # interpreter mode is for the dedicated equivalence test
    if len(shape) != 3:
        return False
    _, R, C = shape
    return C % 128 == 0 and C >= 128 and _pick_rows(R, C, itemsize_m) is not None


def fused_clip_project_adam(params, grads, opt_state, *,
                            lr, b1, b2, eps=1e-8, max_grad_norm=None,
                            use_kernel=True):
    """Apply clip -> W_dec projection -> Adam in fused single passes.

    ``params``/``grads``: dicts of [L, ...]-stacked tensors (pass L=1 via
    ``jnp.expand_dims`` tree for the single-SAE step).  ``opt_state``: the
    optax.adam state tuple with [L]-stacked leaves.  ``lr``: [L] fp32 (the
    scheduled learning rate, cfg.lr * schedule(count)).  Returns
    ``(new_params, new_opt_state)`` with the optax structure intact.
    """
    adam_st, sched_st = opt_state
    L = next(iter(params.values())).shape[0]
    count1 = adam_st.count + 1                       # optax safe_increment
    cnt = count1.astype(jnp.float32)
    rbc1 = 1.0 / (1.0 - jnp.power(b1, cnt))
    sbc2 = 1.0 / jnp.sqrt(1.0 - jnp.power(b2, cnt))
    rbc1 = jnp.broadcast_to(rbc1, (L,))
    sbc2 = jnp.broadcast_to(sbc2, (L,))
    lr = jnp.broadcast_to(jnp.asarray(lr, jnp.float32), (L,))

    if max_grad_norm:
        axes = {k: tuple(range(1, g.ndim)) for k, g in grads.items()}
        sumsq = sum(jnp.sum(jnp.square(g), axis=axes[k])
                    for k, g in grads.items())
        gnorm = jnp.sqrt(sumsq)
        scale = jnp.minimum(1.0, max_grad_norm / (gnorm + 1e-6))
    else:
        scale = jnp.ones((L,), jnp.float32)
    scal = jnp.stack([scale, lr, rbc1, sbc2], axis=1)  # [L, 4]

    new_params, new_mu, new_nu = {}, {}, {}
    for k in params:
        p, g = params[k], grads[k]
        mu, nu = adam_st.mu[k], adam_st.nu[k]
        project = (k == "W_dec")
        shape3 = p.shape if p.ndim == 3 else (L, 1, -1)
        p3 = p.reshape(shape3) if p.ndim != 3 else p
        if use_kernel and _kernel_ok(p3.shape, jnp.dtype(mu.dtype).itemsize):
            out = _adam_update_kernel(
                p3, g.reshape(p3.shape), mu.reshape(p3.shape),
                nu.reshape(p3.shape), scal,
                b1=b1, b2=b2, eps=eps, project=project)
            new_params[k], new_mu[k], new_nu[k] = (
                o.reshape(p.shape) for o in out)
        else:
            new_params[k], new_mu[k], new_nu[k] = _adam_update_ref(
                p, g, mu, nu, scal, b1=b1, b2=b2, eps=eps, project=project)

    new_opt_state = (
        adam_st._replace(count=count1, mu=new_mu, nu=new_nu),
        sched_st._replace(count=sched_st.count + 1),
    )
    return new_params, new_opt_state
