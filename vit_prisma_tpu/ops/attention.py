"""Fused attention-mix Pallas kernel (scores -> softmax -> AV).

Why: the reference attention hot loop
(``/root/reference/src/vit_prisma/models/layers/attention.py:126-184``)
materializes scores and pattern; under XLA the equivalent einsum chain costs
~38% of the CLIP-B/32 forward step (measured: 22.6ms -> 14.0ms with the mix
ablated) — almost none of it FLOPs (the two matmuls are ~2% of model FLOPs).
The loss is HBM round-trips for the [B,N,T,T] scores/pattern plus
[B,T,N,H]<->[B,N,T,H] layout changes around tiny per-head matmuls.

The kernels keep one (batch-block x heads) tile of q/k/v in VMEM, compute
scores in fp32, softmax, and apply the value matmul — nothing but z ever
touches HBM.  Two layouts exist: the original head-major [B, N, T, H]
``attention_mix`` (einsum-recompute VJP) and the token-major [B, T, N*H]
``attention_mix_tnh`` — the production path: zero relayout copies at the
kernel boundary, an in-kernel causal mask, a registered
custom_partitioning for mesh sharding, and a second Pallas kernel as its
exact backward (flash-style pattern recompute in VMEM).  The callers only
use these paths when no attention-internal hooks are requested, so the
[B,T,N,H] hook layout contract is untouched.  Video-scale token axes
fail :func:`mix_tnh_fits_vmem` and take the einsum path instead.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.custom_partitioning import custom_partitioning
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


def _mix_kernel_tnh(q_ref, k_ref, v_ref, z_ref, *, n: int, t: int, g: int,
                    causal: bool = False):
    # blocks: [GB, T, N*H] — the natural row-major output of the QKV
    # projection GEMMs, so NO layout copies appear at the pallas boundary
    # (measured 4 x ~0.45ms/layer of HBM copies with head-major kernel
    # operands; see PERFORMANCE.md).  Heads live as 128-aligned lane
    # slices; each head's scores/softmax/AV stay entirely in VMEM.
    gb, tt, nh = q_ref.shape
    h = nh // n
    if causal:
        row = jax.lax.broadcasted_iota(jnp.int32, (tt, tt), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (tt, tt), 1)
        causal_ok = (col <= row)[None]
    for i in range(n):
        sl = slice(i * h, (i + 1) * h)
        q = q_ref[:, :, sl]
        k = k_ref[:, :, sl]
        v = v_ref[:, :, sl]
        s = jax.lax.dot_general(
            q, k, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)  # [gb, t, t]
        if causal:
            s = jnp.where(causal_ok, s, -jnp.inf)
        s = s - jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s)
        p = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(v.dtype)
        z_ref[:, :, sl] = jax.lax.dot_general(
            p, v, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32).astype(z_ref.dtype)


def mix_tnh_fits_vmem(T: int, NH: int, itemsize: int, *,
                      blocks: int = 7, temps: int = 5) -> bool:
    """Whether the token-major kernels fit VMEM at the minimum batch block
    (gb=1).  Video-scale T (ViViT/V-JEPA tubelet stacks, thousands of
    tokens) blows the per-head fp32 score temporaries (~temps*T*T*4 bytes)
    past the ~16MB/core VMEM — those models must take the einsum path.
    This is a real-chip constraint the CPU tests can't see (they run the
    kernel in interpret mode, which has no VMEM).  Defaults describe the
    backward kernel, the larger of the pair — the model-level gate
    (models/layers.py) uses it so a fused forward is never built whose
    training backward can't compile."""
    t_sub = _round_up(T, 8)
    per_item = blocks * t_sub * _round_up(NH, 128) * itemsize * 2 \
        + temps * t_sub * _round_up(T, 128) * 4
    return per_item <= 13 * 1024 * 1024


def _pick_batch_block_tnh(B: int, T: int, NH: int, itemsize: int) -> int:
    """Batch block for the token-major kernel: 4 pipelined [T, NH] blocks
    plus the per-head fp32 score temporaries (serial over heads).

    The budget is deliberately generous — swept empirically at ViT-B/32
    shapes (gb 2..32): gb=16 is fastest (14.2k img/s vs 13.7k at gb=8);
    the conservative double-buffer accounting here overestimates Mosaic's
    real allocation, so 13MB of budget selects gb=16 safely."""
    t_sub = _round_up(T, 8)
    t_lane = _round_up(T, 128)
    per_item = 4 * t_sub * _round_up(NH, 128) * itemsize * 2 \
        + 3 * t_sub * t_lane * 4
    budget = 13 * 1024 * 1024
    gb = 1
    while gb * 2 <= B and B % (gb * 2) == 0 and (gb * 2) * per_item <= budget:
        gb *= 2
    return gb


def _mix_tnh_forward(q, k, v, n_heads: int, head_group=None,
                     causal: bool = False):
    import functools
    B, T, NH = q.shape
    H = NH // n_heads
    gb = _pick_batch_block_tnh(B, T, NH, q.dtype.itemsize)
    spec = pl.BlockSpec((gb, T, NH), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_mix_kernel_tnh, n=n_heads, t=T,
                          g=head_group or 1, causal=causal),
        grid=(B // gb,),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((B, T, NH), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * B * n_heads * T * T * H,
            bytes_accessed=4 * B * T * NH * q.dtype.itemsize,
            transcendentals=B * n_heads * T * T,
        ),
        interpret=(jax.default_backend() == "cpu"),
    )(q, k, v)


import functools as _functools


# -- mesh partitioning of the mix kernel ------------------------------------
# A pallas_call is a custom call the partitioner can't split on its own,
# which previously forced every mesh-sharded forward onto the einsum path
# (round-2 models/vit.py:shard()).  The mix is embarrassingly parallel over
# batch AND heads (softmax runs per head over the full T), so we register a
# custom_partitioning: batch may shard over any axis, T is forced
# replicated, and the N*H dim may shard on head boundaries (the tp layout
# of vit_param_shardings puts contiguous head blocks per device).  Each
# device then runs the unmodified kernel on its [B_loc, T, N_loc*H] shard —
# no collectives.

def _mix_tnh_aligned(sharding, shape, n_heads):
    """The nearest supported sharding: T replicated; the head dim kept only
    if it splits on head boundaries."""
    if sharding is None or not hasattr(sharding, "spec"):
        return None
    spec = sharding.spec
    b_ax = spec[0] if len(spec) > 0 else None
    nh_ax = spec[2] if len(spec) > 2 else None
    if nh_ax is not None:
        axes = (nh_ax,) if isinstance(nh_ax, str) else tuple(nh_ax)
        n_shards = int(np.prod([sharding.mesh.shape[a] for a in axes]))
        h = shape[2] // n_heads
        if (shape[2] // n_shards) % h:
            nh_ax = None
    from jax.sharding import NamedSharding
    return NamedSharding(sharding.mesh, jax.sharding.PartitionSpec(
        b_ax, None, nh_ax))


def _mix_tnh_infer(n_heads, causal, mesh, arg_infos, result_infos):
    sh = _mix_tnh_aligned(arg_infos[0].sharding, arg_infos[0].shape, n_heads)
    if sh is None:
        from jax.sharding import NamedSharding
        sh = NamedSharding(mesh, jax.sharding.PartitionSpec())
    return sh


def _mix_tnh_partition(n_heads, causal, mesh, arg_infos, result_infos):
    sh = _mix_tnh_infer(n_heads, causal, mesh, arg_infos, result_infos)
    nh_ax = sh.spec[2]
    n_shards = 1
    if nh_ax is not None:
        axes = (nh_ax,) if isinstance(nh_ax, str) else tuple(nh_ax)
        n_shards = int(np.prod([mesh.shape[a] for a in axes]))
    local_heads = n_heads // n_shards

    def lower_fn(q, k, v):
        return _mix_tnh_forward(q, k, v, local_heads, causal=causal)

    return mesh, lower_fn, sh, (sh, sh, sh)


@_functools.partial(custom_partitioning, static_argnums=(3, 4))
def _mix_tnh_sharded(q, k, v, n_heads, causal):
    return _mix_tnh_forward(q, k, v, n_heads, causal=causal)


_mix_tnh_sharded.def_partition(
    infer_sharding_from_operands=_mix_tnh_infer,
    partition=_mix_tnh_partition,
    # Shardy propagation rule (JAX >= 0.7 default partitioner): elementwise
    # over (b, nh); the partition callback then snaps nh to head boundaries
    # and replicates t.
    sharding_rule="b t nh, b t nh, b t nh -> b t nh",
)


@_functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def attention_mix_tnh(q, k, v, n_heads: int, causal: bool = False):
    """Fused mix over token-major [B, T, N*H] tensors (pre-scaled q) —
    the zero-copy variant: inputs/outputs keep the projection GEMMs'
    natural row-major layout, so no relayout copies appear at the kernel
    boundary.  Per-head softmax attention with an fp32 softmax island;
    ``causal`` applies the autoregressive mask in-kernel (text tower).
    The backward is a second Pallas kernel in the same token-major layout
    (exact softmax VJP with the pattern recomputed in VMEM — see
    :func:`_mix_tnh_backward`), so gradient workloads (supervised ViT
    training, ``incl_bwd`` attribution) avoid the einsum path's
    [B,T,N,H]<->[B,N,T,H] relayout copies too.  Mesh-sharded callers
    partition over batch and head blocks via the registered
    custom_partitioning (see above), in both directions."""
    return _mix_tnh_sharded(q, k, v, n_heads, causal)


def _mix_tnh_fwd(q, k, v, n_heads, causal):
    return _mix_tnh_sharded(q, k, v, n_heads, causal), (q, k, v)


def _mix_tnh_bwd_kernel(q_ref, k_ref, v_ref, dz_ref, dq_ref, dk_ref, dv_ref,
                        *, n: int, causal: bool):
    # blocks: [GB, T, N*H] like the forward kernel; per head the pattern is
    # recomputed in VMEM (flash-style remat: p is never saved to HBM) and
    # the exact softmax VJP ds = p*(dp - rowsum(dp*p)) feeds the three
    # gradient matmuls.  All score-space math is fp32; the MXU matmuls run
    # in the input dtype with fp32 accumulation.
    gb, tt, nh = q_ref.shape
    h = nh // n
    if causal:
        row = jax.lax.broadcasted_iota(jnp.int32, (tt, tt), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (tt, tt), 1)
        causal_ok = (col <= row)[None]
    for i in range(n):
        sl = slice(i * h, (i + 1) * h)
        q = q_ref[:, :, sl]
        k = k_ref[:, :, sl]
        v = v_ref[:, :, sl]
        dz = dz_ref[:, :, sl]
        s = jax.lax.dot_general(
            q, k, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)  # [gb, tq, tk]
        if causal:
            s = jnp.where(causal_ok, s, -jnp.inf)
        s = s - jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s)
        p = e / jnp.sum(e, axis=-1, keepdims=True)  # fp32; 0 where masked
        dp = jax.lax.dot_general(
            dz, v, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)  # [gb, tq, tk]
        ds = (p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))).astype(
            q.dtype)
        pc = p.astype(v.dtype)
        dq_ref[:, :, sl] = jax.lax.dot_general(
            ds, k, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32).astype(dq_ref.dtype)
        dk_ref[:, :, sl] = jax.lax.dot_general(
            ds, q, dimension_numbers=(((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32).astype(dk_ref.dtype)
        dv_ref[:, :, sl] = jax.lax.dot_general(
            pc, dz, dimension_numbers=(((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32).astype(dv_ref.dtype)


def _pick_batch_block_tnh_bwd(B: int, T: int, NH: int, itemsize: int) -> int:
    """Batch block for the backward kernel: 7 pipelined [T, NH] blocks
    (q/k/v/dz in, dq/dk/dv out) plus the per-head fp32 score temporaries
    (s/e/p/dp/ds, serial over heads)."""
    t_sub = _round_up(T, 8)
    t_lane = _round_up(T, 128)
    per_item = 7 * t_sub * _round_up(NH, 128) * itemsize * 2 \
        + 5 * t_sub * t_lane * 4
    budget = 13 * 1024 * 1024
    gb = 1
    while gb * 2 <= B and B % (gb * 2) == 0 and (gb * 2) * per_item <= budget:
        gb *= 2
    return gb


def _mix_tnh_backward(q, k, v, dz, n_heads: int, causal: bool = False):
    B, T, NH = q.shape
    H = NH // n_heads
    gb = _pick_batch_block_tnh_bwd(B, T, NH, q.dtype.itemsize)
    spec = pl.BlockSpec((gb, T, NH), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    shape = jax.ShapeDtypeStruct((B, T, NH), q.dtype)
    return pl.pallas_call(
        _functools.partial(_mix_tnh_bwd_kernel, n=n_heads, causal=causal),
        grid=(B // gb,),
        in_specs=[spec, spec, spec, spec],
        out_specs=(spec, spec, spec),
        out_shape=(shape, shape, shape),
        cost_estimate=pl.CostEstimate(
            flops=5 * 2 * B * n_heads * T * T * H,
            bytes_accessed=7 * B * T * NH * q.dtype.itemsize,
            transcendentals=B * n_heads * T * T,
        ),
        interpret=(jax.default_backend() == "cpu"),
    )(q, k, v, dz)


def _mix_tnh_bwd_infer(n_heads, causal, mesh, arg_infos, result_infos):
    sh = _mix_tnh_aligned(arg_infos[0].sharding, arg_infos[0].shape, n_heads)
    if sh is None:
        from jax.sharding import NamedSharding
        sh = NamedSharding(mesh, jax.sharding.PartitionSpec())
    return (sh, sh, sh)


def _mix_tnh_bwd_partition(n_heads, causal, mesh, arg_infos, result_infos):
    sh, _, _ = _mix_tnh_bwd_infer(n_heads, causal, mesh, arg_infos,
                                  result_infos)
    nh_ax = sh.spec[2]
    n_shards = 1
    if nh_ax is not None:
        axes = (nh_ax,) if isinstance(nh_ax, str) else tuple(nh_ax)
        n_shards = int(np.prod([mesh.shape[a] for a in axes]))
    local_heads = n_heads // n_shards

    def lower_fn(q, k, v, dz):
        return _mix_tnh_backward(q, k, v, dz, local_heads, causal=causal)

    return mesh, lower_fn, (sh, sh, sh), (sh, sh, sh, sh)


@_functools.partial(custom_partitioning, static_argnums=(4, 5))
def _mix_tnh_bwd_sharded(q, k, v, dz, n_heads, causal):
    return _mix_tnh_backward(q, k, v, dz, n_heads, causal=causal)


_mix_tnh_bwd_sharded.def_partition(
    infer_sharding_from_operands=_mix_tnh_bwd_infer,
    partition=_mix_tnh_bwd_partition,
    # Like the forward rule: elementwise over (b, nh); the partition
    # callback snaps nh to head boundaries and replicates t.
    sharding_rule="b t nh, b t nh, b t nh, b t nh -> "
                  "b t nh, b t nh, b t nh",
)


def _mix_tnh_bwd(n_heads, causal, res, dz):
    q, k, v = res
    B, T, NH = q.shape
    if not mix_tnh_fits_vmem(T, NH, q.dtype.itemsize):
        # score temporaries too large for VMEM at gb=1 (very long token
        # axes) — exact einsum VJP instead; numerics identical.
        return _mix_tnh_bwd_reference(q, k, v, dz, n_heads, causal)
    return _mix_tnh_bwd_sharded(q, k, v, dz, n_heads, causal)


def _mix_tnh_bwd_reference(q, k, v, dz, n_heads, causal):
    """Pure-XLA einsum VJP of the mix (fp32 operands throughout) — the
    exactness oracle for the backward kernel's tests, and the VJP taken
    when the backward kernel's VMEM footprint doesn't fit (rare: a fused
    forward at T where only the backward is over budget)."""
    B, T, NH = q.shape
    H = NH // n_heads

    def heads(x):
        return x.reshape(B, T, n_heads, H)

    qf, kf, vf = heads(q), heads(k), heads(v)
    s = jnp.einsum("bqnh,bknh->bnqk", qf, kf,
                   preferred_element_type=jnp.float32)
    if causal:
        tri = jnp.tril(jnp.ones((T, T), bool))
        s = jnp.where(tri[None, None], s, -jnp.inf)
    s = s - jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s)
    p = e / jnp.sum(e, axis=-1, keepdims=True)
    dzf = heads(dz).astype(jnp.float32)
    dp = jnp.einsum("bqnh,bknh->bnqk", dzf, vf.astype(jnp.float32))
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    dq = jnp.einsum("bnqk,bknh->bqnh", ds, kf.astype(jnp.float32))
    dk = jnp.einsum("bnqk,bqnh->bknh", ds, qf.astype(jnp.float32))
    dv = jnp.einsum("bnqk,bqnh->bknh", p, dzf)
    flat = lambda x, ref: x.reshape(B, T, NH).astype(ref.dtype)
    return flat(dq, q), flat(dk, k), flat(dv, v)


attention_mix_tnh.defvjp(_mix_tnh_fwd, _mix_tnh_bwd)


# ---------------------------------------------------------------------------
# Video-scale attention: tiled flash kernel (online softmax over KV blocks).
# The whole-T mix kernels above hold the full [T, T] per-head score tile in
# VMEM — impossible for ViViT/V-JEPA tubelet stacks (T in the thousands,
# mix_tnh_fits_vmem False).  Here we route those shapes to the Pallas TPU
# flash-attention op (jax.experimental.pallas.ops.tpu.flash_attention): VMEM
# holds only [block_q, block_k] score tiles so any T fits, and both
# directions stay fused (its backward kernels recompute the pattern
# flash-style).  The kernel wants head-major [B, N, T, H] and T divisible
# by its 128-row blocks, so callers pad T and mask the padding with segment
# ids (exact: tested vs einsum incl. gradients and causal).  Like the mix,
# it is wrapped custom_vjp-outside / custom_partitioning-inside so GSPMD
# splits batch and heads per shard (heads are dim 1 here, so any head
# split is aligned); the backward re-enters the library's own VJP per
# shard via jax.vjp (flash-style recompute — no stats cross the boundary).
# ---------------------------------------------------------------------------

def _flash_call(q, k, v, seg, causal):
    if jax.default_backend() == "cpu":
        # Plain-XLA equivalent for the CPU test platform (incl. the
        # virtual 8-device meshes): the TPU interpret mode lowers pallas
        # through IO-effect callbacks that custom_partitioning cannot
        # stage, so CPU runs the same math as fp32 einsums instead.
        s = jnp.einsum("bnqh,bnkh->bnqk", q.astype(jnp.float32),
                       k.astype(jnp.float32))
        ok = (seg[:, None, :, None] == seg[:, None, None, :])
        if causal:
            t = q.shape[2]
            row = jax.lax.broadcasted_iota(jnp.int32, (t, t), 0)
            col = jax.lax.broadcasted_iota(jnp.int32, (t, t), 1)
            ok = ok & (col <= row)[None, None]
        s = jnp.where(ok, s, -jnp.inf)
        p = jax.nn.softmax(s, axis=-1)
        return jnp.einsum("bnqk,bnkh->bnqh", p,
                          v.astype(jnp.float32)).astype(q.dtype)
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        SegmentIds, flash_attention)
    return flash_attention(q, k, v, segment_ids=SegmentIds(seg, seg),
                           causal=causal, sm_scale=1.0)


def _flash_aligned(sharding, mesh):
    """Nearest supported sharding for [B, N, T, H]: T and H replicated;
    batch/head axes kept (any head split is head-aligned — heads are a
    whole dim here)."""
    from jax.sharding import NamedSharding, PartitionSpec
    if sharding is None or not hasattr(sharding, "spec"):
        return NamedSharding(mesh, PartitionSpec())
    spec = sharding.spec
    b_ax = spec[0] if len(spec) > 0 else None
    n_ax = spec[1] if len(spec) > 1 else None
    return NamedSharding(sharding.mesh, PartitionSpec(b_ax, n_ax, None, None))


def _flash_seg_sharding(qsh):
    from jax.sharding import NamedSharding, PartitionSpec
    return NamedSharding(qsh.mesh, PartitionSpec(qsh.spec[0], None))


def _flash_fwd_infer(causal, mesh, arg_infos, result_infos):
    return _flash_aligned(arg_infos[0].sharding, mesh)


def _flash_fwd_partition(causal, mesh, arg_infos, result_infos):
    sh = _flash_aligned(arg_infos[0].sharding, mesh)

    def lower_fn(q, k, v, seg):
        return _flash_call(q, k, v, seg, causal)

    return mesh, lower_fn, sh, (sh, sh, sh, _flash_seg_sharding(sh))


@_functools.partial(custom_partitioning, static_argnums=(4,))
def _flash_fwd_sharded(q, k, v, seg, causal):
    return _flash_call(q, k, v, seg, causal)


_flash_fwd_sharded.def_partition(
    infer_sharding_from_operands=_flash_fwd_infer,
    partition=_flash_fwd_partition,
    sharding_rule="b n t h, b n t h, b n t h, b t -> b n t h",
)


def _flash_bwd_infer(causal, mesh, arg_infos, result_infos):
    sh = _flash_aligned(arg_infos[0].sharding, mesh)
    return (sh, sh, sh)


def _flash_bwd_partition(causal, mesh, arg_infos, result_infos):
    sh = _flash_aligned(arg_infos[0].sharding, mesh)

    def lower_fn(q, k, v, seg, dz):
        _, vjp = jax.vjp(lambda a, b, c: _flash_call(a, b, c, seg, causal),
                         q, k, v)
        return vjp(dz)

    return mesh, lower_fn, (sh, sh, sh), \
        (sh, sh, sh, _flash_seg_sharding(sh), sh)


@_functools.partial(custom_partitioning, static_argnums=(5,))
def _flash_bwd_sharded(q, k, v, seg, dz, causal):
    _, vjp = jax.vjp(lambda a, b, c: _flash_call(a, b, c, seg, causal),
                     q, k, v)
    return vjp(dz)


_flash_bwd_sharded.def_partition(
    infer_sharding_from_operands=_flash_bwd_infer,
    partition=_flash_bwd_partition,
    sharding_rule="b n t h, b n t h, b n t h, b t, b n t h -> "
                  "b n t h, b n t h, b n t h",
)


@_functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def flash_attention_padded(q, k, v, seg, causal: bool = False):
    """Tiled flash attention over head-major [B, N, T, H] (pre-scaled q,
    T a multiple of 128; ``seg`` is the [B, T] int segment-id vector —
    padding rows get a different id so they can't attend across).  Exact
    softmax attention in both directions at any T; mesh-sharded callers
    split batch and heads via the registered custom_partitioning."""
    return _flash_fwd_sharded(q, k, v, seg, causal)


def _fap_fwd(q, k, v, seg, causal):
    return _flash_fwd_sharded(q, k, v, seg, causal), (q, k, v, seg)


def _fap_bwd(causal, res, dz):
    q, k, v, seg = res
    dq, dk, dv = _flash_bwd_sharded(q, k, v, seg, dz, causal)
    dseg = np.zeros(seg.shape, dtype=jax.dtypes.float0)
    return dq, dk, dv, dseg


flash_attention_padded.defvjp(_fap_fwd, _fap_bwd)


# ---------------------------------------------------------------------------
# Full attention-block kernel: QKV projection + per-head softmax mix +
# output projection in ONE pallas call.  q/k/v/z never touch HBM: per layer
# this removes ~160MB of HBM round-trips plus the GEMM dispatch gaps and
# boundary reshapes of the mix-only kernel.
# ---------------------------------------------------------------------------

def _attn_block_kernel(x_ref, wqkv_ref, bqkv_ref, wo_ref, out_ref,
                       *, n: int, inv_scale: float):
    gb, t, d = x_ref.shape
    nh3 = wqkv_ref.shape[1]
    nh = nh3 // 3
    h = nh // n
    xf = x_ref[...].reshape(gb * t, d)
    qkv = jax.lax.dot_general(
        xf, wqkv_ref[...], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    qkv = (qkv + bqkv_ref[...].astype(jnp.float32)).astype(x_ref.dtype)
    zs = []
    for i in range(n):
        q = qkv[:, i * h:(i + 1) * h].reshape(gb, t, h) * inv_scale
        k = qkv[:, nh + i * h:nh + (i + 1) * h].reshape(gb, t, h)
        v = qkv[:, 2 * nh + i * h:2 * nh + (i + 1) * h].reshape(gb, t, h)
        s = jax.lax.dot_general(
            q, k, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        s = s - jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s)
        p = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(v.dtype)
        z = jax.lax.dot_general(
            p, v, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32).astype(x_ref.dtype)
        zs.append(z.reshape(gb * t, h))
    zf = jnp.concatenate(zs, axis=-1)  # lane concat, [gb*t, nh]
    out = jax.lax.dot_general(
        zf, wo_ref[...], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    out_ref[...] = out.astype(out_ref.dtype).reshape(gb, t, d)


def _pick_batch_block_attn(B: int, T: int, D: int, NH: int,
                           itemsize: int) -> int:
    t_sub = _round_up(T, 8)
    # x + out blocks (double-buffered) + the qkv/z intermediates + scores
    per_item = (2 * t_sub * _round_up(D, 128) * itemsize * 2
                + 4 * t_sub * _round_up(NH, 128) * itemsize
                + 3 * t_sub * _round_up(T, 128) * 4)
    # the weight blocks are grid-invariant (constant index_map) — resident
    # once, not double-buffered
    weights = (D * 3 * NH + NH * D + 3 * NH) * itemsize
    budget = 13 * 1024 * 1024 - weights
    gb = 1
    while gb * 2 <= B and B % (gb * 2) == 0 and (gb * 2) * per_item <= budget:
        gb *= 2
    return gb


def _attn_block_forward(x, Wqkv, bqkv, Wo, n_heads: int, inv_scale: float):
    import functools
    B, T, D = x.shape
    NH = Wo.shape[0]
    gb = _pick_batch_block_attn(B, T, D, NH, x.dtype.itemsize)
    xspec = pl.BlockSpec((gb, T, D), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    const = lambda shape: pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape),
                                       memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_attn_block_kernel, n=n_heads,
                          inv_scale=inv_scale),
        grid=(B // gb,),
        in_specs=[xspec, const(Wqkv.shape), const(bqkv.shape),
                  const(Wo.shape)],
        out_specs=xspec,
        out_shape=jax.ShapeDtypeStruct((B, T, D), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * T * D * 4 * NH + 2 * 2 * B * n_heads * T * T * (NH // n_heads),
            bytes_accessed=2 * B * T * D * x.dtype.itemsize,
            transcendentals=B * n_heads * T * T,
        ),
        interpret=(jax.default_backend() == "cpu"),
    )(x, Wqkv, bqkv, Wo)


def _attn_block_ref(x, Wqkv, bqkv, Wo, n_heads: int, inv_scale: float):
    """Pure-XLA equivalent used for the backward pass and tests."""
    B, T, D = x.shape
    NH = Wo.shape[0]
    H = NH // n_heads
    qkv = x.reshape(B * T, D) @ Wqkv + bqkv
    q, k, v = jnp.split(qkv.reshape(B, T, 3 * NH), 3, axis=-1)
    qf = q.reshape(B, T, n_heads, H) * inv_scale
    kf = k.reshape(B, T, n_heads, H)
    vf = v.reshape(B, T, n_heads, H)
    s = jnp.einsum("bqnh,bknh->bnqk", qf, kf,
                   preferred_element_type=jnp.float32)
    p = jax.nn.softmax(s, axis=-1).astype(x.dtype)
    z = jnp.einsum("bnqk,bknh->bqnh", p, vf)
    return (z.reshape(B * T, NH) @ Wo).reshape(B, T, D)


import functools as _ft


@_ft.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def fused_attention_block(x, Wqkv, bqkv, Wo, n_heads: int, inv_scale: float):
    """QKV projection + softmax attention + output projection as one
    Pallas kernel over [B, T, D] (pre-LN'd) input.  ``Wqkv``:
    [D, 3*N*H] (q|k|v lane-packed), ``bqkv``: [3*N*H], ``Wo``: [N*H, D].
    The output bias is left to the caller (it fuses into the residual
    add).  Backward = exact VJP of the XLA-equivalent reference."""
    return _attn_block_forward(x, Wqkv, bqkv, Wo, n_heads, inv_scale)


def _fab_fwd(x, Wqkv, bqkv, Wo, n_heads, inv_scale):
    return _attn_block_forward(x, Wqkv, bqkv, Wo, n_heads, inv_scale), \
        (x, Wqkv, bqkv, Wo)


def _fab_bwd(n_heads, inv_scale, res, g):
    _, vjp = jax.vjp(
        lambda *a: _attn_block_ref(*a, n_heads, inv_scale), *res)
    return vjp(g)


fused_attention_block.defvjp(_fab_fwd, _fab_bwd)


def attention_mix_reference(q, k, v):
    """Unfused XLA reference of :func:`attention_mix` (same layout/scaling),
    used by the exactness tests."""
    s = jnp.einsum("bnqh,bnkh->bnqk", q, k,
                   preferred_element_type=jnp.float32)
    p = jax.nn.softmax(s, axis=-1).astype(v.dtype)
    return jnp.einsum("bnqk,bnkh->bnqh", p, v)
