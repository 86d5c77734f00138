"""Pallas TPU kernel: per-row k-th-largest threshold for TopK SAEs.

Motivation: TopK-SAE training needs ``top_k`` over the feature axis
(d_sae = 12k-50k) every step.  XLA lowers ``lax.top_k`` to a full sort —
measured 44 ms/step vs 5.5 ms for the ReLU path at d_sae=12288, batch 4096
(8x slowdown; the sort dominates).  The TopK *activation* doesn't need
sorted values though — only "zero everything below the k-th largest".

This kernel finds each row's k-th largest value by a 32-step bitwise binary
search over the IEEE-754 bit pattern (monotone under the standard
sign-flip transform), keeping the row block in VMEM the whole time: one HBM
read of x total, 32 VPU compare+reduce passes over VMEM.  The activation
then becomes a cheap elementwise mask in the caller — and autodiff flows
through the mask for free (the threshold is a constant wrt gradients,
matching torch.topk+scatter's subgradient).

Tie semantics: rows with duplicated k-th value keep >= k entries (the exact
top-k keeps an arbitrary k of the ties); distinct values give exactly k.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def _kth_value_kernel(x_ref, t_ref, *, k: int, n_bits: int):
    """x_ref: [R, D] f32 block; t_ref: [R, 1] f32 k-th largest per row.

    ``n_bits``: how many leading bit positions the binary search visits.
    32 is exact for arbitrary f32; 16 is exact when every input is a
    bf16-representable value (its f32 pattern has zero low mantissa bits),
    halving the VPU compare+reduce passes for the bf16 compute path."""
    x = x_ref[:]
    _SIGN = jnp.uint32(0x80000000)
    bits = pltpu.bitcast(x, jnp.uint32)
    # Order-preserving map float -> uint32: positives set the sign bit,
    # negatives are bit-flipped; unsigned order == float order.
    u = jnp.where((bits & _SIGN) != 0, ~bits, bits | _SIGN)

    R = x.shape[0]
    kk = jnp.int32(k)

    def body(i, acc):
        b = jnp.uint32(31) - i.astype(jnp.uint32)
        cand = acc | (jnp.uint32(1) << b)
        # count per row of u >= cand (monotone non-increasing in cand);
        # Mosaic can't reduce uints, so count in int32.
        cnt = jnp.sum((u >= cand[:, None]).astype(jnp.int32), axis=1)
        return jnp.where(cnt >= kk, cand, acc)

    acc = jax.lax.fori_loop(0, n_bits, body, jnp.zeros((R,), jnp.uint32))
    # invert the map: acc is the bit pattern (in u-space) of the k-th value
    back = jnp.where((acc & _SIGN) != 0, acc & ~_SIGN, ~acc)
    t_ref[:] = pltpu.bitcast(back[:, None], jnp.float32)  # bitcast needs 2D


def _pick_block_rows(n_rows: int, d: int) -> int:
    # x block + u copy must fit comfortably in VMEM; round DOWN to a power
    # of two first — halving from a non-power-of-2 cap (e.g. 107 for
    # d=12288) would skip every aligned divisor and bottom out at R=8,
    # leaving the per-pass lane reduce with an 8-sublane block (measured
    # 3.3ms at [4096, 12288]; 256-row blocks cut it to ~1ms).
    budget = 48 * 1024 * 1024
    r = max(8, budget // (2 * 4 * d))
    r = min(1 << (r.bit_length() - 1), 256)
    while n_rows % r:
        r //= 2
        if r < 8:
            return 8
    return r


@functools.partial(jax.jit, static_argnames=("k", "interpret"))
def kth_value(x: jax.Array, k: int, interpret: bool = False) -> jax.Array:
    """Per-row k-th largest of x [B, D] -> [B, 1] float32.

    For f32 inputs the result IS the k-th value.  For bf16 inputs the
    16-position search returns a SEPARATOR ``t`` with the exact mask
    property ``(x >= t) == (x in top-k, ties >= k)``; for rows whose
    k-th value is negative, ``t`` sits infinitesimally below it rather
    than equaling it bit-for-bit (the low u-space bits of negative bf16
    patterns are ones, not zeros).  The TopK activation only uses the
    mask, which stays exact."""
    B, D = x.shape
    # bf16 inputs: every value's f32 pattern has zero low mantissa bits,
    # so a 16-position search is EXACT and half the passes
    n_bits = 16 if x.dtype == jnp.bfloat16 else 32
    x = x.astype(jnp.float32)
    R = _pick_block_rows(B, D)
    pad = (-B) % R
    if pad:
        x = jnp.pad(x, ((0, pad), (0, 0)))
    out = pl.pallas_call(
        functools.partial(_kth_value_kernel, k=k, n_bits=n_bits),
        out_shape=jax.ShapeDtypeStruct((x.shape[0], 1), jnp.float32),
        grid=(x.shape[0] // R,),
        in_specs=[pl.BlockSpec((R, D), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((R, 1), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
        interpret=interpret,
    )(x)
    return out[:B]


def _use_pallas() -> bool:
    return jax.default_backend() == "tpu"


def topk_mask_activation(x: jax.Array, k: int) -> jax.Array:
    """TopK activation via threshold masking: keep (ReLU'd) entries >= the
    k-th largest, zero the rest.  Drop-in fast path for
    ``vit_prisma_tpu.sae.sae.topk_activation`` on 2-D inputs."""
    orig_shape = x.shape
    x2 = x.reshape(-1, orig_shape[-1])
    t = jax.lax.stop_gradient(
        kth_value(jax.lax.stop_gradient(x2), k, interpret=not _use_pallas()))
    out = jnp.where(x2 >= t, jax.nn.relu(x2), 0.0).astype(x.dtype)
    return out.reshape(orig_shape)


def topk_mask_activation_approx(x: jax.Array, k: int) -> jax.Array:
    """Approximate TopK activation using TPU's specialized
    ``lax.approx_max_k`` (PartialReduce op, ~95% recall, measured 2.4x
    faster than the exact bitwise-search kernel at d_sae=12288).

    The threshold is the minimum of the approximate top-k, so the mask
    keeps >= ~k entries with ~95% overlap with the exact top-k per row.
    Opt-in via ``SAERunnerConfig.topk_use_approx`` — training quality is
    empirically indistinguishable, but numerics diverge from the exact
    reference semantics, so the default stays exact."""
    orig_shape = x.shape
    x2 = x.reshape(-1, orig_shape[-1])
    vals = jax.lax.approx_max_k(jax.lax.stop_gradient(x2), k)[0]
    t = jax.lax.stop_gradient(jnp.min(vals, axis=-1, keepdims=True))
    out = jnp.where(x2 >= t, jax.nn.relu(x2), 0.0).astype(x.dtype)
    return out.reshape(orig_shape)
