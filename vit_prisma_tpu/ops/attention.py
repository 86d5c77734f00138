"""Fused attention-mix Pallas kernel (scores -> softmax -> AV).

Why: the reference attention hot loop
(``/root/reference/src/vit_prisma/models/layers/attention.py:126-184``)
materializes scores and pattern; under XLA the equivalent einsum chain costs
~38% of the CLIP-B/32 forward step (measured: 22.6ms -> 14.0ms with the mix
ablated) — almost none of it FLOPs (the two matmuls are ~2% of model FLOPs).
The loss is HBM round-trips for the [B,N,T,T] scores/pattern plus
[B,T,N,H]<->[B,N,T,H] layout changes around tiny per-head matmuls.

This kernel keeps one (batch-block x heads) tile of q/k/v in VMEM, computes
scores in fp32, softmaxes, and applies the value matmul — nothing but z ever
touches HBM.  Inputs/outputs use the [B, N, T, H] head-major layout so the
surrounding projection GEMMs fuse the layout into their epilogues (the
caller only uses this path when no attention-internal hooks are requested,
so the [B,T,N,H] hook layout contract is untouched).

The VJP recomputes the pattern with plain XLA einsums (exact softmax
gradients); the forward is the hot path (SAE activation harvest is
forward-only), and the backward matches the unfused path's cost.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Per-program VMEM budget for picking the batch-block size (bytes); the
# physical limit is ~16MB/core, leave headroom for compiler temporaries.
_VMEM_BUDGET = 10 * 1024 * 1024


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _pick_batch_block(B: int, N: int, T: int, H: int, itemsize: int,
                      g: int) -> int:
    """Largest power-of-two batch block whose working set fits in VMEM.

    Accounts for Mosaic's physical tiling — the minor dim pads to 128
    lanes, the second-minor to 8 sublanes — and for the 2x double-buffering
    of the pipelined in/out blocks.  ``g`` is the head-group packing (the
    scores temporaries are [G*T, G*T] per group)."""
    rows_sub = _round_up(g * T, 8)
    rows_lane = _round_up(g * T, 128)
    h_lane = _round_up(H, 128)
    qkvz = 4 * (N // g) * rows_sub * h_lane * itemsize * 2  # double-buffered
    scores = 3 * (N // g) * rows_sub * rows_lane * 4  # s/e/p fp32 temporaries
    per_item = qkvz + scores
    gb = 1
    while gb * 2 <= B and B % (gb * 2) == 0 and (gb * 2) * per_item <= _VMEM_BUDGET:
        gb *= 2
    return gb


def _pick_head_group(N: int, T: int) -> int:
    """Heads per packed matmul group.

    Per-head [T,H]x[H,T] matmuls are tiny (T~50, H=64 on ViT-B) and the mix
    becomes MXU-issue-bound.  Packing G heads along the row axis turns
    B*N tiny matmuls into B*N/G matmuls of G^2 blocks — G x the FLOPs (the
    off-diagonal blocks are masked out before the softmax) but far fewer,
    far better-shaped MXU ops.  Pick the largest divisor of N with
    G*T <= ~512 (beyond that the wasted FLOPs start to dominate)."""
    best = 1
    for g in range(1, N + 1):
        if N % g == 0 and g * T <= 512:
            best = g
    return best


def _mix_kernel(q_ref, k_ref, v_ref, z_ref, *, t: int):
    # blocks: [GB, N/G, G*T, H], pre-grouped by the caller (a free reshape
    # of the contiguous [B,N,T,H] HBM array — grouping inside the kernel
    # would cross sublane tiles and force a relayout).  ``t`` is the true
    # per-head sequence length; cross-head blocks of the packed scores are
    # masked to -inf before the fp32 softmax.
    gb, m, rows, h = q_ref.shape
    q = q_ref[...].reshape(gb * m, rows, h)
    k = k_ref[...].reshape(gb * m, rows, h)
    v = v_ref[...].reshape(gb * m, rows, h)
    s = jax.lax.dot_general(
        q, k,
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # [GB*N/G, G*T, G*T]
    if rows != t:
        row_blk = jax.lax.broadcasted_iota(jnp.int32, (rows, rows), 0) // t
        col_blk = jax.lax.broadcasted_iota(jnp.int32, (rows, rows), 1) // t
        s = jnp.where((row_blk == col_blk)[None], s, -jnp.inf)
    s = s - jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s)
    p = e / jnp.sum(e, axis=-1, keepdims=True)
    p = p.astype(v.dtype)
    z = jax.lax.dot_general(
        p, v,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    z_ref[...] = z.reshape(gb, m, rows, h).astype(z_ref.dtype)


def _mix_forward(q, k, v, head_group=None):
    """z = softmax(q @ k^T) @ v over [B, N, T, H] inputs (pre-scaled q)."""
    import functools
    B, N, T, H = q.shape
    g = _pick_head_group(N, T) if head_group is None else head_group
    gb = _pick_batch_block(B, N, T, H, q.dtype.itemsize, g)
    rows = g * T
    # Free metadata reshape of the contiguous HBM array: pack G heads'
    # rows per matmul group.
    qg = q.reshape(B, N // g, rows, H)
    kg = k.reshape(B, N // g, rows, H)
    vg = v.reshape(B, N // g, rows, H)
    spec = pl.BlockSpec((gb, N // g, rows, H), lambda i: (i, 0, 0, 0),
                        memory_space=pltpu.VMEM)
    zg = pl.pallas_call(
        functools.partial(_mix_kernel, t=T),
        grid=(B // gb,),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((B, N // g, rows, H), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * B * N * T * T * H * g,
            bytes_accessed=4 * B * N * T * H * q.dtype.itemsize,
            transcendentals=B * N * T * T * g,
        ),
        # The CI/test platform is CPU (tests/conftest.py); the kernel runs
        # there in interpreter mode with identical semantics.
        interpret=(jax.default_backend() == "cpu"),
    )(qg, kg, vg)
    return zg.reshape(B, N, T, H)


@jax.custom_vjp
def attention_mix(q, k, v):
    """Fused softmax attention over head-major [B, N, T, H] tensors.

    ``q`` must already carry the 1/sqrt(d_head) scale.  Equivalent to::

        p = softmax(q @ k.mT, axis=-1)
        z = p @ v

    with an fp32 softmax island (more accurate than the bf16 einsum chain
    it replaces).  No attention mask: callers with masks (the causal text
    path) use the unfused einsum path.
    """
    return _mix_forward(q, k, v)


def _mix_fwd(q, k, v):
    return _mix_forward(q, k, v), (q, k, v)


def _mix_bwd(res, dz):
    q, k, v = res
    # Recompute the pattern in fp32 (cheap relative to the projections) and
    # apply the exact softmax VJP: ds = p * (dp - sum(dp * p)).
    s = jnp.einsum("bnqh,bnkh->bnqk", q, k,
                   preferred_element_type=jnp.float32)
    s = s - jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s)
    p = e / jnp.sum(e, axis=-1, keepdims=True)
    dzf = dz.astype(jnp.float32)
    vf = v.astype(jnp.float32)
    dp = jnp.einsum("bnqh,bnkh->bnqk", dzf, vf)
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    dq = jnp.einsum("bnqk,bnkh->bnqh", ds, k.astype(jnp.float32))
    dk = jnp.einsum("bnqk,bnqh->bnkh", ds, q.astype(jnp.float32))
    dv = jnp.einsum("bnqk,bnqh->bnkh", p, dzf)
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)


attention_mix.defvjp(_mix_fwd, _mix_bwd)


def attention_mix_reference(q, k, v):
    """Unfused XLA reference of :func:`attention_mix` (same layout/scaling),
    used by the exactness tests."""
    s = jnp.einsum("bnqh,bnkh->bnqk", q, k,
                   preferred_element_type=jnp.float32)
    p = jax.nn.softmax(s, axis=-1).astype(v.dtype)
    return jnp.einsum("bnqk,bnkh->bnqh", p, v)
