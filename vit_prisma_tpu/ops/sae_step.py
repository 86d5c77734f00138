"""Fused SAE train-step compute kernel (Pallas TPU).

The SURVEY §7 "hard part": the SAE step's natural XLA lowering materializes
the [B, d_sae] feature activations (and their pre-acts) to HBM between the
encoder GEMM, the activation/counter ops, and the decoder GEMM — on the
all-layer ViT-L/14 sweep that is ~0.8GB of bf16 traffic *per materialization*
and the step profiles bandwidth-bound at ~1/3 of the MXU ceiling (measured
breakdown in docs/PERFORMANCE.md: 50ms GEMM fusions + ~21ms copies/reduce
passes at 24 x [2048, 8192]).

This kernel computes, for L stacked SAEs at once::

    h      = relu((x - b_dec) @ W_enc + b_enc)      # never leaves VMEM
    y      = h @ W_dec + b_dec
    l1[l]  = sum(h)                                  # sparsity penalty value
    nact[l, j] = #rows with h[.., j] > 0             # fired/act-freq counters

with one VMEM-resident pass per (layer, row-block, feature-block) tile, and
a custom VJP that *recomputes* h tile-by-tile in the backward (flash-attention
style rematerialization: ~20% more MXU work, several GB less HBM traffic).

Semantics match the unfused path of ``sae_forward`` for the standard-ReLU
architecture (reference ``sae.py:597-645`` restricted to
architecture='standard', activation='relu', normalize_activations='none',
no ghost grads): y and the loss pieces are bit-comparable at f32-accumulation
tolerance; the counters are exact.  ``vit_prisma_tpu.sae.train`` gates use of
this kernel on exactly those config conditions (plus tile-aligned shapes) and
falls back to the XLA path otherwise.

Counterpart workload: reference ``train_sae.py:278-411`` (the eager train
step this feeds); counters at ``:356-365``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Per-program VMEM working-set budget (bytes); ~16MB physical per core,
# leave headroom for compiler temporaries (house convention, see
# ops/attention.py).
_VMEM_BUDGET = 13 * 1024 * 1024


def _pick_blocks_fwd(B: int, d_in: int, d_sae: int, itemsize: int,
                     save_h: bool = False):
    """(Bb, Sb) for the forward: prefer LARGE row blocks — the weight
    blocks are re-streamed once per row block (nB full W_enc+W_dec reads),
    so big Bb minimizes HBM weight traffic.  ``save_h`` adds the streamed
    [Bb, Sb] activation out-block (stored-acts VJP, see
    :func:`sae_fused_apply`)."""
    for Bb in (1024, 512, 256):
        if B % Bb:
            continue
        for Sb in (512, 256):
            if d_sae % Sb:
                continue
            need = (2 * 2 * Bb * d_in * itemsize       # x in + y out (2x buf)
                    + 2 * 2 * d_in * Sb * itemsize     # W_enc, W_dec blocks
                    + 4 * Bb * d_in                    # fp32 y accumulator
                    + 3 * 4 * Bb * Sb                  # fp32 hpre/h tiles
                    + (2 * Bb * Sb * itemsize if save_h else 0))
            if need <= _VMEM_BUDGET:
                return Bb, Sb
    return None


def _pick_blocks_bwd(B: int, d_in: int, d_sae: int, itemsize: int):
    """(Bb, Sb) for the backward: prefer LARGE feature blocks — x/dy are
    re-streamed once per feature block (nS reads of both), so big Sb
    minimizes HBM activation traffic.  The fp32 dW accumulators live in
    VMEM across the row sweep."""
    for Sb in (1024, 512, 256):
        if d_sae % Sb:
            continue
        for Bb in (512, 256):
            if B % Bb:
                continue
            need = (2 * 2 * Bb * d_in * itemsize       # x, dy (2x buffered)
                    + 2 * 2 * d_in * Sb * itemsize     # W_enc, W_dec blocks
                    + 2 * 4 * d_in * Sb                # fp32 dW accumulators
                    + 3 * 4 * Bb * Sb)                 # fp32 hpre/h/dh tiles
            if need <= _VMEM_BUDGET:
                return Bb, Sb
    return None


def fused_step_eligible(B: int, d_in: int, d_sae: int, itemsize: int) -> bool:
    """Tile-alignment gate (the caller checks the config conditions)."""
    return (d_in % 128 == 0 and d_sae % 256 == 0 and B % 256 == 0
            and _pick_blocks_fwd(B, d_in, d_sae, itemsize) is not None
            and _pick_blocks_bwd(B, d_in, d_sae, itemsize) is not None)


# ---------------------------------------------------------------------------
# Forward: grid (L, nB, nS), feature blocks innermost; y accumulates in a
# VMEM scratch across the S sweep and is written once per (l, b).
# ---------------------------------------------------------------------------

def _fwd_kernel(x_ref, we_ref, be_ref, wd_ref, bd_ref,
                y_ref, l1_ref, nact_ref, *rest, n_s: int):
    if len(rest) == 2:                # stored-acts variant: h streams out
        h_out_ref, acc_ref = rest
    else:
        (acc_ref,) = rest
        h_out_ref = None
    s = pl.program_id(2)
    x = x_ref[0]                      # [Bb, d_in]
    bd = bd_ref[0, 0]                 # [d_in]
    xc = x - bd
    hpre = jax.lax.dot_general(
        xc, we_ref[0], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + be_ref[0, 0].astype(jnp.float32)
    h = jnp.maximum(hpre, 0.0)        # [Bb, Sb] fp32, VMEM-only
    hc = h.astype(x.dtype)
    if h_out_ref is not None:
        # exactly the decode operand: the stored-acts backward's h-derived
        # mask and dWd GEMM then match the remat backward bit-for-bit
        h_out_ref[0] = hc

    @pl.when(s == 0)
    def _():
        acc_ref[...] = jnp.broadcast_to(bd.astype(jnp.float32)[None, :],
                                        acc_ref.shape)

    acc_ref[...] += jax.lax.dot_general(
        hc, wd_ref[0],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    nact_ref[0, 0, 0] = jnp.sum((hpre > 0.0).astype(jnp.float32), axis=0)

    @pl.when(s == 0)
    def _():
        l1_ref[0, 0, 0, 0] = 0.0

    l1_ref[0, 0, 0, 0] += jnp.sum(h)  # relu: sum|h| == sum(h)

    @pl.when(s == n_s - 1)
    def _():
        y_ref[0] = acc_ref[...].astype(y_ref.dtype)


def _fused_forward(x, We, be, Wd, bd, save_h: bool = False):
    L, B, d_in = x.shape
    d_sae = We.shape[-1]
    Bb, Sb = _pick_blocks_fwd(B, d_in, d_sae, x.dtype.itemsize,
                              save_h=save_h)
    nB, nS = B // Bb, d_sae // Sb
    out_specs = [
        pl.BlockSpec((1, Bb, d_in), lambda l, b, s: (l, b, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, 1, 1), lambda l, b, s: (l, b, 0, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((1, 1, 1, Sb), lambda l, b, s: (l, b, 0, s),
                     memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((L, B, d_in), x.dtype),
        jax.ShapeDtypeStruct((L, nB, 1, 1), jnp.float32),
        jax.ShapeDtypeStruct((L, nB, 1, d_sae), jnp.float32),
    ]
    if save_h:
        out_specs.append(pl.BlockSpec((1, Bb, Sb), lambda l, b, s: (l, b, s),
                                      memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((L, B, d_sae), x.dtype))
    outs = pl.pallas_call(
        functools.partial(_fwd_kernel, n_s=nS),
        grid=(L, nB, nS),
        in_specs=[
            pl.BlockSpec((1, Bb, d_in), lambda l, b, s: (l, b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d_in, Sb), lambda l, b, s: (l, 0, s),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Sb), lambda l, b, s: (l, 0, s),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Sb, d_in), lambda l, b, s: (l, s, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, d_in), lambda l, b, s: (l, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        scratch_shapes=[pltpu.VMEM((Bb, d_in), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * L * B * d_in * d_sae,
            bytes_accessed=(2 * L * B * d_in + nB * 2 * L * d_in * d_sae
                            + (L * B * d_sae if save_h else 0))
            * x.dtype.itemsize,
            transcendentals=0,
        ),
        # the tile estimates leave Mosaic needing ~17MB scoped VMEM in the
        # backward (its double-buffering outcounts the estimate); raise the
        # scoped limit well under the chip's physical VMEM instead of
        # shrinking tiles (smaller tiles re-stream x/dy more)
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        # CI/test platform is CPU (tests/conftest.py): interpreter mode,
        # identical semantics (house convention, ops/attention.py).
        interpret=(jax.default_backend() == "cpu"),
    )(x, We, be[:, None, :], Wd, bd[:, None, :])
    y, l1p, nactp = outs[0], outs[1], outs[2]
    base = (y, l1p.sum(axis=(1, 2, 3)), nactp.sum(axis=(1, 2)))
    return base + (outs[3],) if save_h else base


# ---------------------------------------------------------------------------
# Backward: grid (L, nS, nB), row blocks innermost; h/dh are recomputed per
# tile and the dW/db accumulators stay resident in VMEM across the B sweep.
# ---------------------------------------------------------------------------

def _bwd_kernel(x_ref, dy_ref, we_ref, be_ref, wd_ref, bd_ref, dl1_ref,
                dwe_ref, dwd_ref, dbe_ref):
    b = pl.program_id(2)
    x = x_ref[0]
    dy = dy_ref[0]
    bd = bd_ref[0, 0]
    xc = x - bd
    hpre = jax.lax.dot_general(
        xc, we_ref[0], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + be_ref[0, 0].astype(jnp.float32)
    mask = hpre > 0.0
    h = jnp.maximum(hpre, 0.0).astype(x.dtype)
    # dh = (dy @ W_dec^T) * mask + dl1 * mask  (d|h|/dh = 1 on the active set)
    dh_f = jax.lax.dot_general(
        dy, wd_ref[0], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    dh = jnp.where(mask, dh_f + dl1_ref[0, 0, 0], 0.0)
    dhc = dh.astype(x.dtype)

    @pl.when(b == 0)
    def _():
        dwe_ref[...] = jnp.zeros(dwe_ref.shape, dwe_ref.dtype)
        dwd_ref[...] = jnp.zeros(dwd_ref.shape, dwd_ref.dtype)
        dbe_ref[...] = jnp.zeros(dbe_ref.shape, dbe_ref.dtype)

    dwe_ref[0] += jax.lax.dot_general(
        xc, dhc, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dwd_ref[0] += jax.lax.dot_general(
        h, dy, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dbe_ref[0, 0] += jnp.sum(dh, axis=0)


def _fused_backward(x, We, be, Wd, bd, dy, dl1):
    L, B, d_in = x.shape
    d_sae = We.shape[-1]
    Bb, Sb = _pick_blocks_bwd(B, d_in, d_sae, x.dtype.itemsize)
    nB, nS = B // Bb, d_sae // Sb
    dl1_arr = jnp.reshape(dl1.astype(jnp.float32), (L, 1, 1))
    dWe, dWd, dbe = pl.pallas_call(
        _bwd_kernel,
        grid=(L, nS, nB),
        in_specs=[
            pl.BlockSpec((1, Bb, d_in), lambda l, s, b: (l, b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Bb, d_in), lambda l, s, b: (l, b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d_in, Sb), lambda l, s, b: (l, 0, s),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Sb), lambda l, s, b: (l, 0, s),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Sb, d_in), lambda l, s, b: (l, s, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, d_in), lambda l, s, b: (l, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1), lambda l, s, b: (l, 0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, d_in, Sb), lambda l, s, b: (l, 0, s),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Sb, d_in), lambda l, s, b: (l, s, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Sb), lambda l, s, b: (l, 0, s),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((L, d_in, d_sae), jnp.float32),
            jax.ShapeDtypeStruct((L, d_sae, d_in), jnp.float32),
            jax.ShapeDtypeStruct((L, 1, d_sae), jnp.float32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * 2 * L * B * d_in * d_sae,
            bytes_accessed=(nS * 2 * 2 * L * B * d_in
                            + 2 * L * d_in * d_sae) * x.dtype.itemsize,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=(jax.default_backend() == "cpu"),
    )(x, dy, We, be[:, None, :], Wd, bd[:, None, :], dl1_arr)
    return dWe, dWd, dbe[:, 0]


# ---------------------------------------------------------------------------
# Stored-acts backward: the forward streams the (compute-dtype) activations
# h to HBM and the backward reads them back instead of recomputing the
# encoder GEMM.  The remat-vs-store tradeoff INVERTS with scale: at the
# bench shape (L=1, B=4096, 768->12288 bf16) the recompute GEMM costs
# ~0.55ms while the h round-trip is ~200MB ≈ 0.25ms of HBM traffic — so
# storing wins whenever the activation block fits a modest HBM cap, and
# rematerialization remains the fallback for bigger-than-cap shapes (where
# it is also the right call: traffic grows linearly while the recompute
# stays one GEMM pass of several).  Auto-selected per shape in
# :func:`sae_fused_apply` / :func:`sae_fused_apply_topk`.
#
# Exactness: h is stored exactly as the forward's decode operand
# (fp32-accumulated pre-acts relu'd and rounded to the compute dtype), so
# dWd = h^T dy matches the remat backward bit-for-bit, and the active-set
# mask (h > 0) matches the remat mask (hpre > 0) except for positive fp32
# pre-acts that round to +0 in bf16 (< 2^-133; unreachable for real
# activation scales — and those entries contribute 0 to y either way).
# ---------------------------------------------------------------------------

# Stored-activation budget: the sweep bench's largest shape
# (24 x [4096, 8192] bf16 = 1.6 GiB) measured faster stored than remat
# (790k vs 756k tok/s incl. refills) and fits alongside the 2.4 GiB
# buffer + 4.8 GiB optimizer state on a 16 GiB v5e; above this, remat's
# constant one-GEMM cost beats the linearly-growing HBM round trip.
_SAVE_ACTS_CAP = 2 << 30


def _pick_blocks_bwd_stored(B: int, d_in: int, d_sae: int, itemsize: int):
    """(Bb, Sb) for the stored-acts backward: like :func:`_pick_blocks_bwd`
    minus the W_enc block, plus the streamed h block."""
    for Sb in (1024, 512, 256):
        if d_sae % Sb:
            continue
        for Bb in (512, 256):
            if B % Bb:
                continue
            need = (2 * 2 * Bb * d_in * itemsize       # x, dy (2x buffered)
                    + 2 * Bb * Sb * itemsize           # h block (2x buffered)
                    + 2 * Sb * d_in * itemsize         # W_dec block
                    + 2 * 4 * d_in * Sb                # fp32 dWe/dWd accums
                    + 2 * 4 * Bb * Sb)                 # fp32 dh/mask temps
            if need <= _VMEM_BUDGET:
                return Bb, Sb
    return None


def _save_acts_ok(L: int, B: int, d_in: int, d_sae: int,
                  itemsize: int) -> bool:
    return (L * B * d_sae * itemsize <= _SAVE_ACTS_CAP
            and _pick_blocks_fwd(B, d_in, d_sae, itemsize,
                                 save_h=True) is not None
            and _pick_blocks_bwd_stored(B, d_in, d_sae, itemsize) is not None)


def _bwd_kernel_stored(x_ref, dy_ref, h_ref, wd_ref, bd_ref, dl1_ref,
                       dwe_ref, dwd_ref, dbe_ref):
    b = pl.program_id(2)
    x = x_ref[0]
    dy = dy_ref[0]
    h = h_ref[0]                                        # compute-dtype acts
    xc = x - bd_ref[0, 0]
    # the forward masked/thresholded BEFORE the cast-to-compute-dtype of h,
    # but kept entries are > 0 post-cast too (see section comment); bf16
    # compares don't lower on v5e, so test in fp32
    hf = h.astype(jnp.float32)
    mask = hf > 0.0
    dh_f = jax.lax.dot_general(
        dy, wd_ref[0], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    dh = jnp.where(mask, dh_f + dl1_ref[0, 0, 0], 0.0)
    dhc = dh.astype(x.dtype)

    @pl.when(b == 0)
    def _():
        dwe_ref[...] = jnp.zeros(dwe_ref.shape, dwe_ref.dtype)
        dwd_ref[...] = jnp.zeros(dwd_ref.shape, dwd_ref.dtype)
        dbe_ref[...] = jnp.zeros(dbe_ref.shape, dbe_ref.dtype)

    dwe_ref[0] += jax.lax.dot_general(
        xc, dhc, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dwd_ref[0] += jax.lax.dot_general(
        h, dy, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dbe_ref[0, 0] += jnp.sum(dh, axis=0)


def _fused_backward_stored(x, h, Wd, bd, dy, dl1):
    L, B, d_in = x.shape
    d_sae = h.shape[-1]
    Bb, Sb = _pick_blocks_bwd_stored(B, d_in, d_sae, x.dtype.itemsize)
    nB, nS = B // Bb, d_sae // Sb
    dl1_arr = jnp.reshape(dl1.astype(jnp.float32), (L, 1, 1))
    dWe, dWd, dbe = pl.pallas_call(
        _bwd_kernel_stored,
        grid=(L, nS, nB),
        in_specs=[
            pl.BlockSpec((1, Bb, d_in), lambda l, s, b: (l, b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Bb, d_in), lambda l, s, b: (l, b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Bb, Sb), lambda l, s, b: (l, b, s),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Sb, d_in), lambda l, s, b: (l, s, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, d_in), lambda l, s, b: (l, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1), lambda l, s, b: (l, 0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, d_in, Sb), lambda l, s, b: (l, 0, s),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Sb, d_in), lambda l, s, b: (l, s, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Sb), lambda l, s, b: (l, 0, s),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((L, d_in, d_sae), jnp.float32),
            jax.ShapeDtypeStruct((L, d_sae, d_in), jnp.float32),
            jax.ShapeDtypeStruct((L, 1, d_sae), jnp.float32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=3 * 2 * L * B * d_in * d_sae,
            bytes_accessed=(nS * 2 * 2 * L * B * d_in + L * B * d_sae
                            + 2 * L * d_in * d_sae) * x.dtype.itemsize,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=(jax.default_backend() == "cpu"),
    )(x, dy, h, Wd, bd[:, None, :], dl1_arr)
    return dWe, dWd, dbe[:, 0]


@functools.lru_cache(maxsize=None)
def _make_relu_apply(save_acts: bool):
    @jax.custom_vjp
    def apply(x, We, be, Wd, bd):
        return _fused_forward(x, We, be, Wd, bd)

    def fwd(x, We, be, Wd, bd):
        if save_acts:
            y, l1, nact, h = _fused_forward(x, We, be, Wd, bd, save_h=True)
            return (y, l1, nact), (x, We, be, Wd, bd, h)
        return _fused_forward(x, We, be, Wd, bd), (x, We, be, Wd, bd, None)

    def bwd(res, cts):
        x, We, be, Wd, bd, h = res
        dy, dl1, _ = cts
        dy = dy.astype(x.dtype)
        if save_acts:
            dWe, dWd, dbe = _fused_backward_stored(x, h, Wd, bd, dy, dl1)
        else:
            dWe, dWd, dbe = _fused_backward(x, We, be, Wd, bd, dy, dl1)
        # b_dec enters twice: sae_in = x - b_dec (encode) and y = h @ W_dec
        # + b_dec (decode) => db_dec = sum_B dy - W_enc @ db_enc.
        dbd = dy.sum(axis=-2, dtype=jnp.float32) \
            - jnp.einsum("lds,ls->ld", We, dbe.astype(We.dtype),
                         preferred_element_type=jnp.float32)
        cast = lambda g, ref: g.astype(ref.dtype)
        return (jnp.zeros_like(x), cast(dWe, We), cast(dbe, be),
                cast(dWd, Wd), cast(dbd, bd))

    apply.defvjp(fwd, bwd)
    return apply


def sae_fused_apply(x, We, be, Wd, bd, *, save_acts=None):
    """Standard-ReLU SAE forward over ``L`` stacked SAEs, feature acts
    VMEM-only in the forward.

    ``x``: [L, B, d_in]; ``We``: [L, d_in, d_sae]; ``be``: [L, d_sae];
    ``Wd``: [L, d_sae, d_in]; ``bd``: [L, d_in].  Returns
    ``(y, l1, nact)``: the reconstruction [L, B, d_in], the per-layer
    sparsity penalty value sum|h| [L] (differentiable — its cotangent
    becomes the +dl1-on-active-set term in dh), and the per-feature
    active-row counts [L, d_sae] (non-differentiable; exact, for the
    fired/act-freq bookkeeping of train_sae.py:356-365).

    The VJP returns a ZERO cotangent for ``x`` (the train step never
    differentiates w.r.t. the activation batch); all weight/bias grads are
    exact (fp32 accumulation).  ``save_acts`` picks the VJP strategy:
    ``True`` streams h to HBM in the forward and skips the backward's
    encoder recompute (faster when the acts fit ``_SAVE_ACTS_CAP``);
    ``False`` rematerializes h tile-wise; ``None`` (default) decides by
    shape — see the stored-acts section comment."""
    if save_acts is None:
        L, B, d_in = x.shape
        save_acts = _save_acts_ok(L, B, d_in, We.shape[-1],
                                  x.dtype.itemsize)
    return _make_relu_apply(bool(save_acts))(x, We, be, Wd, bd)


def sae_fused_reference(x, We, be, Wd, bd):
    """Unfused XLA equivalent (same signature/outputs) for the exactness
    tests."""
    xc = x - bd[:, None, :]
    hpre = jnp.einsum("lbd,lds->lbs", xc, We) + be[:, None, :]
    h = jax.nn.relu(hpre)
    y = jnp.einsum("lbs,lsd->lbd", h, Wd) + bd[:, None, :]
    l1 = h.sum(axis=(1, 2), dtype=jnp.float32)
    nact = (hpre > 0).sum(axis=1).astype(jnp.float32)
    return y, l1, nact


# ===========================================================================
# TopK variant: the same fused step with the TopK activation (reference
# sae.py:795-810 / train_sae.py:278-411 with activation_fn='topk').
#
# The per-row k-th-largest threshold is found INSIDE the forward kernel by
# the bitwise binary search of ops/topk.py, run over the VMEM-resident
# pre-activation scratch after the encoder sweep — the [B, d_sae]
# pre-activations never round-trip HBM, and the threshold is emitted as a
# tiny [L, B] residual so the backward rematerializes the masked acts
# without re-searching.
#
# Two exactness notes (parity-tested against the lax.top_k path):
#   * the search runs over relu-clamped pre-acts: a negative k-th value
#     would only keep entries that relu to 0 anyway, so clamping the
#     threshold at +0.0 leaves y / l1 / nact / gradients identical and
#     saves the sign-handling pass;
#   * ties at the threshold keep >= k entries (same semantics as
#     ops/topk.py's mask and torch.topk's arbitrary-tie variant on
#     non-tied data).
# ===========================================================================


def _pick_blocks_fwd_topk(B: int, d_in: int, d_sae: int, itemsize: int,
                          save_h: bool = False):
    """(Bb, Sb) for the TopK forward.  Adds the [Bb, d_sae] pre-act scratch
    and the search temporaries (one fp32 copy + one pass temp) to the
    budget; v5e VMEM is 128MB (probed), so the budget is far above the
    13MB house default for the plain kernels."""
    budget = 100 * 1024 * 1024
    for Bb in (512, 256):
        if B % Bb:
            continue
        for Sb in (512, 256):
            if d_sae % Sb:
                continue
            need = (2 * 2 * Bb * d_in * itemsize     # x in + y out (2x buf)
                    + 2 * 2 * d_in * Sb * itemsize   # W_enc, W_dec blocks
                    + 4 * Bb * d_in                  # fp32 y accumulator
                    + 3 * 4 * Bb * Sb                # fp32 tile temps
                    + Bb * d_sae * itemsize          # hpre scratch
                    + 2 * 4 * Bb * d_sae             # search fp32 copy+temp
                    + (2 * Bb * Sb * itemsize if save_h else 0))
            if need <= budget:
                return Bb, Sb
    return None


def _save_acts_ok_topk(L: int, B: int, d_in: int, d_sae: int,
                       itemsize: int) -> bool:
    return (L * B * d_sae * itemsize <= _SAVE_ACTS_CAP
            and _pick_blocks_fwd_topk(B, d_in, d_sae, itemsize,
                                      save_h=True) is not None
            and _pick_blocks_bwd_stored(B, d_in, d_sae, itemsize) is not None)


def fused_topk_step_eligible(B: int, d_in: int, d_sae: int,
                             itemsize: int) -> bool:
    return (d_in % 128 == 0 and d_sae % 256 == 0 and B % 256 == 0
            and _pick_blocks_fwd_topk(B, d_in, d_sae, itemsize) is not None
            and _pick_blocks_bwd(B, d_in, d_sae, itemsize) is not None)


def _row_kth_threshold(h: jax.Array, k: int, n_bits: int) -> jax.Array:
    """Bitwise binary search for the per-row k-th-largest of relu(h)
    (ops/topk.py style), specialized to non-negative values: the IEEE
    pattern of x >= 0 is monotone as a plain unsigned integer, so the sign
    pass is skipped and the compare runs in FLOAT space (bf16 comparisons
    don't lower on v5e; fp32 compares do, and the candidate is exactly
    representable by construction).  ``h``: [R, D] fp32 (>= 0).  Returns
    the separator t [R, 1] fp32 with (h >= t) == (h in top-k, ties kept).

    Count note: an MXU formulation of the per-pass count (mask_bf16 @
    ones[D, 1]) MEASURED SLOWER than this VPU reduce — 670k vs 752k tok/s
    on the full fused bf16 TopK step — because an N=1 matmul streams the
    whole [R, D] block through the MXU at 1/128 output utilization every
    pass.  The lane-axis tree reduce stays."""
    R = h.shape[0]
    kf = jnp.float32(k)

    def body(i, acc):
        b = jnp.uint32(30) - i.astype(jnp.uint32)
        cand = acc | (jnp.uint32(1) << b)
        cf = pltpu.bitcast(cand[:, None], jnp.float32)  # [R, 1], >= 0
        cnt = jnp.sum(jnp.where(h >= cf, jnp.float32(1), jnp.float32(0)),
                      axis=1)
        return jnp.where(cnt >= kf, cand, acc)

    acc = jax.lax.fori_loop(0, n_bits - 1, body, jnp.zeros((R,), jnp.uint32))
    return pltpu.bitcast(acc[:, None], jnp.float32)


def _fwd_kernel_topk(x_ref, we_ref, be_ref, wd_ref, bd_ref,
                     y_ref, l1_ref, nact_ref, t_ref, *rest, n_s: int, k: int,
                     n_bits: int):
    if len(rest) == 4:                # stored-acts variant: h streams out
        h_out_ref, acc_ref, hs_ref, ts_ref = rest
    else:
        acc_ref, hs_ref, ts_ref = rest
        h_out_ref = None
    s = pl.program_id(2)
    Sb = we_ref.shape[-1]

    @pl.when(s < n_s)
    def _encode():
        x = x_ref[0]
        bd = bd_ref[0, 0]
        hpre = jax.lax.dot_general(
            x - bd, we_ref[0], dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) \
            + be_ref[0, 0].astype(jnp.float32)
        # stored in the compute dtype: bf16 rounding here is what makes the
        # threshold/mask bit-match the unfused bf16 path
        hs_ref[:, pl.ds(s * Sb, Sb)] = hpre.astype(hs_ref.dtype)

    @pl.when(s == n_s)
    def _threshold():
        hr = jnp.maximum(hs_ref[...].astype(jnp.float32), 0.0)
        t = _row_kth_threshold(hr, k, n_bits)
        ts_ref[...] = t
        t_ref[0] = t
        acc_ref[...] = jnp.broadcast_to(
            bd_ref[0, 0].astype(jnp.float32)[None, :], acc_ref.shape)
        l1_ref[0, 0, 0, 0] = 0.0

    @pl.when(s >= n_s)
    def _decode():
        sb = s - n_s
        hp = hs_ref[:, pl.ds(sb * Sb, Sb)]
        t = ts_ref[...]                               # [Bb, 1] fp32
        hpf = hp.astype(jnp.float32)                  # bf16 cmp doesn't lower
        active = (hpf >= t) & (hpf > 0)
        h = jnp.where(active, hp, jnp.zeros((), hp.dtype))
        if h_out_ref is not None:
            # the masked decode operand: the stored-acts backward's mask
            # (h > 0) IS the active set (active implies hp > 0)
            h_out_ref[0] = h
        acc_ref[...] += jax.lax.dot_general(
            h, wd_ref[0], dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        nact_ref[0, 0, 0] = jnp.sum(active.astype(jnp.float32), axis=0)
        l1_ref[0, 0, 0, 0] += jnp.sum(h.astype(jnp.float32))

        @pl.when(s == 2 * n_s - 1)
        def _():
            y_ref[0] = acc_ref[...].astype(y_ref.dtype)


def _fused_forward_topk(x, We, be, Wd, bd, k, save_h: bool = False):
    L, B, d_in = x.shape
    d_sae = We.shape[-1]
    n_bits = 16 if x.dtype == jnp.bfloat16 else 32
    Bb, Sb = _pick_blocks_fwd_topk(B, d_in, d_sae, x.dtype.itemsize,
                                   save_h=save_h)
    nB, nS = B // Bb, d_sae // Sb
    outs = pl.pallas_call(
        functools.partial(_fwd_kernel_topk, n_s=nS, k=k, n_bits=n_bits),
        grid=(L, nB, 2 * nS),
        in_specs=[
            pl.BlockSpec((1, Bb, d_in), lambda l, b, s: (l, b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d_in, Sb),
                         lambda l, b, s, n=nS: (l, 0, jnp.minimum(s, n - 1)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Sb),
                         lambda l, b, s, n=nS: (l, 0, jnp.minimum(s, n - 1)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Sb, d_in),
                         lambda l, b, s, n=nS: (l, jnp.maximum(s - n, 0), 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, d_in), lambda l, b, s: (l, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=tuple(
            [pl.BlockSpec((1, Bb, d_in), lambda l, b, s: (l, b, 0),
                          memory_space=pltpu.VMEM),
             pl.BlockSpec((1, 1, 1, 1), lambda l, b, s: (l, b, 0, 0),
                          memory_space=pltpu.SMEM),
             pl.BlockSpec((1, 1, 1, Sb),
                          lambda l, b, s, n=nS: (l, b, 0,
                                                 jnp.maximum(s - n, 0)),
                          memory_space=pltpu.VMEM),
             pl.BlockSpec((1, Bb, 1), lambda l, b, s: (l, b, 0),
                          memory_space=pltpu.VMEM)]
            + ([pl.BlockSpec((1, Bb, Sb),
                             lambda l, b, s, n=nS: (l, b,
                                                    jnp.maximum(s - n, 0)),
                             memory_space=pltpu.VMEM)] if save_h else [])),
        out_shape=tuple(
            [jax.ShapeDtypeStruct((L, B, d_in), x.dtype),
             jax.ShapeDtypeStruct((L, nB, 1, 1), jnp.float32),
             jax.ShapeDtypeStruct((L, nB, 1, d_sae), jnp.float32),
             jax.ShapeDtypeStruct((L, B, 1), jnp.float32)]
            + ([jax.ShapeDtypeStruct((L, B, d_sae), x.dtype)]
               if save_h else [])),
        scratch_shapes=[
            pltpu.VMEM((Bb, d_in), jnp.float32),
            pltpu.VMEM((Bb, d_sae), x.dtype),
            pltpu.VMEM((Bb, 1), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * L * B * d_in * d_sae
            + (n_bits - 1) * 2 * L * B * d_sae,
            bytes_accessed=(2 * L * B * d_in + nB * 2 * L * d_in * d_sae
                            + (L * B * d_sae if save_h else 0))
            * x.dtype.itemsize,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=112 * 1024 * 1024),
        interpret=(jax.default_backend() == "cpu"),
    )(x, We, be[:, None, :], Wd, bd[:, None, :])
    y, l1p, nactp, t = outs[:4]
    base = (y, l1p.sum(axis=(1, 2, 3)), nactp.sum(axis=(1, 2)), t)
    return base + (outs[4],) if save_h else base


def _bwd_kernel_topk(x_ref, dy_ref, we_ref, be_ref, wd_ref, bd_ref, dl1_ref,
                     t_ref, dwe_ref, dwd_ref, dbe_ref):
    b = pl.program_id(2)
    x = x_ref[0]
    dy = dy_ref[0]
    bd = bd_ref[0, 0]
    xc = x - bd
    hpre = jax.lax.dot_general(
        xc, we_ref[0], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + be_ref[0, 0].astype(jnp.float32)
    # round to the compute dtype FIRST — the forward thresholded/masked the
    # rounded values, and the active set must match it exactly
    hp = hpre.astype(x.dtype)
    t = t_ref[0]                                       # [Bb, 1] fp32
    hpf = hp.astype(jnp.float32)                       # bf16 cmp doesn't lower
    active = (hpf >= t) & (hpf > 0)
    h = jnp.where(active, hp, jnp.zeros((), hp.dtype))
    dh_f = jax.lax.dot_general(
        dy, wd_ref[0], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    dh = jnp.where(active, dh_f + dl1_ref[0, 0, 0], 0.0)
    dhc = dh.astype(x.dtype)

    @pl.when(b == 0)
    def _():
        dwe_ref[...] = jnp.zeros(dwe_ref.shape, dwe_ref.dtype)
        dwd_ref[...] = jnp.zeros(dwd_ref.shape, dwd_ref.dtype)
        dbe_ref[...] = jnp.zeros(dbe_ref.shape, dbe_ref.dtype)

    dwe_ref[0] += jax.lax.dot_general(
        xc, dhc, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dwd_ref[0] += jax.lax.dot_general(
        h, dy, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dbe_ref[0, 0] += jnp.sum(dh, axis=0)


def _fused_backward_topk(x, We, be, Wd, bd, dy, dl1, t):
    L, B, d_in = x.shape
    d_sae = We.shape[-1]
    Bb, Sb = _pick_blocks_bwd(B, d_in, d_sae, x.dtype.itemsize)
    nB, nS = B // Bb, d_sae // Sb
    dl1_arr = jnp.reshape(dl1.astype(jnp.float32), (L, 1, 1))
    dWe, dWd, dbe = pl.pallas_call(
        _bwd_kernel_topk,
        grid=(L, nS, nB),
        in_specs=[
            pl.BlockSpec((1, Bb, d_in), lambda l, s, b: (l, b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Bb, d_in), lambda l, s, b: (l, b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d_in, Sb), lambda l, s, b: (l, 0, s),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Sb), lambda l, s, b: (l, 0, s),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Sb, d_in), lambda l, s, b: (l, s, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, d_in), lambda l, s, b: (l, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1), lambda l, s, b: (l, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, Bb, 1), lambda l, s, b: (l, b, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, d_in, Sb), lambda l, s, b: (l, 0, s),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Sb, d_in), lambda l, s, b: (l, s, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Sb), lambda l, s, b: (l, 0, s),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((L, d_in, d_sae), jnp.float32),
            jax.ShapeDtypeStruct((L, d_sae, d_in), jnp.float32),
            jax.ShapeDtypeStruct((L, 1, d_sae), jnp.float32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * 2 * L * B * d_in * d_sae,
            bytes_accessed=(nS * 2 * 2 * L * B * d_in
                            + 2 * L * d_in * d_sae) * x.dtype.itemsize,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=(jax.default_backend() == "cpu"),
    )(x, dy, We, be[:, None, :], Wd, bd[:, None, :], dl1_arr, t)
    return dWe, dWd, dbe[:, 0]


@functools.lru_cache(maxsize=None)
def _make_topk_apply(k: int, save_acts: bool = False):
    @jax.custom_vjp
    def apply(x, We, be, Wd, bd):
        y, l1, nact, _ = _fused_forward_topk(x, We, be, Wd, bd, k)
        return y, l1, nact

    def fwd(x, We, be, Wd, bd):
        if save_acts:
            y, l1, nact, _, h = _fused_forward_topk(x, We, be, Wd, bd, k,
                                                    save_h=True)
            return (y, l1, nact), (x, We, be, Wd, bd, None, h)
        y, l1, nact, t = _fused_forward_topk(x, We, be, Wd, bd, k)
        return (y, l1, nact), (x, We, be, Wd, bd, t, None)

    def bwd(res, cts):
        x, We, be, Wd, bd, t, h = res
        dy, dl1, _ = cts
        dy = dy.astype(x.dtype)
        if save_acts:
            # the stored acts already carry the top-k mask (h > 0 iff
            # active): the same stored-acts backward as ReLU applies
            dWe, dWd, dbe = _fused_backward_stored(x, h, Wd, bd, dy, dl1)
        else:
            dWe, dWd, dbe = _fused_backward_topk(x, We, be, Wd, bd, dy,
                                                 dl1, t)
        dbd = dy.sum(axis=-2, dtype=jnp.float32) \
            - jnp.einsum("lds,ls->ld", We, dbe.astype(We.dtype),
                         preferred_element_type=jnp.float32)
        cast = lambda g, ref: g.astype(ref.dtype)
        return (jnp.zeros_like(x), cast(dWe, We), cast(dbe, be),
                cast(dWd, Wd), cast(dbd, bd))

    apply.defvjp(fwd, bwd)
    return apply


def sae_fused_apply_topk(x, We, be, Wd, bd, *, k: int, save_acts=None):
    """TopK-SAE forward over ``L`` stacked SAEs with the threshold search
    fused into the kernel (see module section comment).  Same signature
    contract as :func:`sae_fused_apply`; ``l1`` is the sum of the kept
    activations (all non-negative).  ``save_acts`` picks the VJP strategy
    (see :func:`sae_fused_apply`): ``True`` streams the masked acts to HBM
    (the mask rides along — h > 0 iff active — so no re-search AND no
    encoder recompute); ``False`` rematerializes the masked acts from the
    saved per-row thresholds; ``None`` decides by shape.  Counterpart of
    the reference's TopK module + eager train step (sae.py:795-810,
    train_sae.py:278-411)."""
    if save_acts is None:
        L, B, d_in = x.shape
        save_acts = _save_acts_ok_topk(L, B, d_in, We.shape[-1],
                                       x.dtype.itemsize)
    return _make_topk_apply(int(k), bool(save_acts))(x, We, be, Wd, bd)


# ===========================================================================
# Gated variant (reference sae.py:648-793): the same fused step for
# GatedSparseAutoencoder with ReLU.
#
# TPU-first reformulation: the reference runs TWO encoder GEMMs —
# sae_in @ W_enc (gate path) and sae_in @ (W_enc * exp(r_mag)) (magnitude
# path, sae.py:696-713).  exp(r_mag) scales *columns* of W_enc, so the
# magnitude pre-act equals (sae_in @ W_enc) * exp(r_mag) + b_mag: ONE
# shared encoder GEMM and a VPU column scale (identical math; fp32-
# accumulation-level rounding difference only).
#
# The kernel emits FOUR differentiable pieces the gated loss needs
# (sae.py:726-792): the reconstruction y, the gate-path reconstruction
# ``via`` (relu(gate_pre) @ W_dec + b_dec, for the aux loss), the decoder-
# norm-weighted gate L1 value, and the exact h>0 counters.  The mse/aux
# loss expressions stay in XLA on [L, B, d_in] arrays — cheap elementwise —
# and their cotangents (dy, dvia, dl1) drive the rematerializing VJP, so
# the [B, d_sae] feature activations never touch HBM in either direction.
# ===========================================================================


def _pick_blocks_fwd_gated(B: int, d_in: int, d_sae: int, itemsize: int):
    """(Bb, Sb) for the gated forward: like the standard forward but with a
    second [Bb, d_in] fp32 accumulator (via) and two extra [Bb, Sb] fp32
    tile temps (hg / hm)."""
    for Bb in (1024, 512, 256):
        if B % Bb:
            continue
        for Sb in (512, 256):
            if d_sae % Sb:
                continue
            need = (3 * 2 * Bb * d_in * itemsize       # x in + y/via out
                    + 2 * 2 * d_in * Sb * itemsize     # W_enc, W_dec blocks
                    + 2 * 4 * Bb * d_in                # fp32 y + via accs
                    + 5 * 4 * Bb * Sb)                 # fp32 g/hg/hm/h/hga
            if need <= _VMEM_BUDGET:
                return Bb, Sb
    return None


def _pick_blocks_bwd_gated(B: int, d_in: int, d_sae: int, itemsize: int):
    """(Bb, Sb) for the gated backward: standard backward + dvia stream and
    the extra per-tile temps."""
    for Sb in (1024, 512, 256):
        if d_sae % Sb:
            continue
        for Bb in (512, 256):
            if B % Bb:
                continue
            need = (3 * 2 * Bb * d_in * itemsize       # x, dy, dvia
                    + 2 * 2 * d_in * Sb * itemsize     # W_enc, W_dec blocks
                    + 2 * 4 * d_in * Sb                # fp32 dWe/dWd accs
                    + 6 * 4 * Bb * Sb)                 # g/hg/hm/dh/dhg/dhm
            if need <= _VMEM_BUDGET:
                return Bb, Sb
    return None


def fused_gated_step_eligible(B: int, d_in: int, d_sae: int,
                              itemsize: int) -> bool:
    return (d_in % 128 == 0 and d_sae % 256 == 0 and B % 256 == 0
            and _pick_blocks_fwd_gated(B, d_in, d_sae, itemsize) is not None
            and _pick_blocks_bwd_gated(B, d_in, d_sae, itemsize) is not None)


def _gated_pre(xc, we_blk, bg, e, bm, dtype):
    """Shared fwd/bwd tile compute: one GEMM -> (g, hg, hm) fp32.

    ``hg``/``hm`` are rounded through the compute dtype so the forward's
    masks and the backward's rematerialized masks agree bit-for-bit.
    ``e`` = exp(r_mag) fp32, precomputed ONCE by the wrapper — computing it
    per tile re-ran the transcendental nB times per layer (and the same
    hoist applies to the decoder column norms ``wdn``: in-kernel they cost
    a full extra VPU pass over the W_dec block per tile)."""
    g = jax.lax.dot_general(
        xc, we_blk, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    hg = (g + bg.astype(jnp.float32)).astype(dtype).astype(jnp.float32)
    hm = (g * e + bm.astype(jnp.float32)).astype(dtype).astype(jnp.float32)
    return g, hg, hm


def _fwd_kernel_gated(x_ref, we_ref, bg_ref, e_ref, bm_ref, wd_ref, bd_ref,
                      wdn_ref, y_ref, via_ref, l1_ref, nact_ref,
                      yacc_ref, vacc_ref, *, n_s: int):
    s = pl.program_id(2)
    x = x_ref[0]
    bd = bd_ref[0, 0]
    xc = x - bd
    _, hg, hm = _gated_pre(xc, we_ref[0], bg_ref[0, 0], e_ref[0, 0],
                           bm_ref[0, 0], x.dtype)
    gate = hg > 0.0
    h = jnp.where(gate, jnp.maximum(hm, 0.0), 0.0)      # [Bb, Sb] fp32
    hga = jnp.maximum(hg, 0.0)                           # gate-path acts

    @pl.when(s == 0)
    def _():
        init = jnp.broadcast_to(bd.astype(jnp.float32)[None, :],
                                yacc_ref.shape)
        yacc_ref[...] = init
        vacc_ref[...] = init
        l1_ref[0, 0, 0, 0] = 0.0

    hc = h.astype(x.dtype)
    hgac = hga.astype(x.dtype)
    yacc_ref[...] += jax.lax.dot_general(
        hc, wd_ref[0], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    vacc_ref[...] += jax.lax.dot_general(
        hgac, wd_ref[0], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    nact_ref[0, 0, 0] = jnp.sum((h > 0.0).astype(jnp.float32), axis=0)
    # decoder-norm-weighted gate L1 (sae.py:773-781): sum_j hga_j ||Wd_j||
    l1_ref[0, 0, 0, 0] += jnp.sum(hga * wdn_ref[0, 0][None, :])

    @pl.when(s == n_s - 1)
    def _():
        y_ref[0] = yacc_ref[...].astype(y_ref.dtype)
        via_ref[0] = vacc_ref[...].astype(via_ref.dtype)


def _gated_hoisted(rmag, Wd):
    """The per-tile invariants hoisted out of the gated kernels: e =
    exp(r_mag) and the decoder column norms, both fp32 [L, d_sae]."""
    e = jnp.exp(rmag.astype(jnp.float32))
    wdn = jnp.sqrt(jnp.sum(jnp.square(Wd.astype(jnp.float32)), axis=-1))
    return e, wdn


def _fused_forward_gated(x, We, bg, rmag, bm, Wd, bd):
    L, B, d_in = x.shape
    d_sae = We.shape[-1]
    Bb, Sb = _pick_blocks_fwd_gated(B, d_in, d_sae, x.dtype.itemsize)
    nB, nS = B // Bb, d_sae // Sb
    vec = lambda v: v[:, None, :]
    e, wdn = _gated_hoisted(rmag, Wd)
    s_spec = pl.BlockSpec((1, 1, Sb), lambda l, b, s: (l, 0, s),
                          memory_space=pltpu.VMEM)
    y, via, l1p, nactp = pl.pallas_call(
        functools.partial(_fwd_kernel_gated, n_s=nS),
        grid=(L, nB, nS),
        in_specs=[
            pl.BlockSpec((1, Bb, d_in), lambda l, b, s: (l, b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d_in, Sb), lambda l, b, s: (l, 0, s),
                         memory_space=pltpu.VMEM),
            s_spec,
            s_spec,
            s_spec,
            pl.BlockSpec((1, Sb, d_in), lambda l, b, s: (l, s, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, d_in), lambda l, b, s: (l, 0, 0),
                         memory_space=pltpu.VMEM),
            s_spec,
        ],
        out_specs=(
            pl.BlockSpec((1, Bb, d_in), lambda l, b, s: (l, b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Bb, d_in), lambda l, b, s: (l, b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, 1), lambda l, b, s: (l, b, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, 1, Sb), lambda l, b, s: (l, b, 0, s),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((L, B, d_in), x.dtype),
            jax.ShapeDtypeStruct((L, B, d_in), x.dtype),
            jax.ShapeDtypeStruct((L, nB, 1, 1), jnp.float32),
            jax.ShapeDtypeStruct((L, nB, 1, d_sae), jnp.float32),
        ),
        scratch_shapes=[pltpu.VMEM((Bb, d_in), jnp.float32),
                        pltpu.VMEM((Bb, d_in), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=3 * 2 * L * B * d_in * d_sae,
            bytes_accessed=(3 * L * B * d_in + nB * 2 * L * d_in * d_sae)
            * x.dtype.itemsize,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=(jax.default_backend() == "cpu"),
    )(x, We, vec(bg), vec(e), vec(bm), Wd, vec(bd), vec(wdn))
    return y, via, l1p.sum(axis=(1, 2, 3)), nactp.sum(axis=(1, 2))


def _bwd_kernel_gated(x_ref, dy_ref, dv_ref, we_ref, bg_ref, e_ref, bm_ref,
                      wd_ref, bd_ref, wdn_ref, dl1_ref,
                      dwe_ref, dwd_ref, dbg_ref, dbm_ref, drm_ref):
    b = pl.program_id(2)
    x = x_ref[0]
    dy = dy_ref[0]
    dv = dv_ref[0]
    bd = bd_ref[0, 0]
    xc = x - bd
    e = e_ref[0, 0]
    g, hg, hm = _gated_pre(xc, we_ref[0], bg_ref[0, 0], e,
                           bm_ref[0, 0], x.dtype)
    gate = hg > 0.0
    h = jnp.where(gate, jnp.maximum(hm, 0.0), 0.0).astype(x.dtype)
    hga = jnp.maximum(hg, 0.0).astype(x.dtype)
    wd = wd_ref[0]
    wdn = wdn_ref[0, 0]

    dh_f = jax.lax.dot_general(
        dy, wd, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    dvia_f = jax.lax.dot_general(
        dv, wd, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    dl1 = dl1_ref[0, 0, 0]
    # magnitude path: h = gate * relu(hm); gate (heaviside) has zero grad
    dhm = jnp.where(gate & (hm > 0.0), dh_f, 0.0)
    # gate path: via & l1 read hga = relu(hg)
    dhg = jnp.where(gate, dvia_f + dl1 * wdn[None, :], 0.0)
    dg = dhg + dhm * e[None, :]
    dgc = dg.astype(x.dtype)

    @pl.when(b == 0)
    def _():
        dwe_ref[...] = jnp.zeros(dwe_ref.shape, dwe_ref.dtype)
        dwd_ref[...] = jnp.zeros(dwd_ref.shape, dwd_ref.dtype)
        dbg_ref[...] = jnp.zeros(dbg_ref.shape, dbg_ref.dtype)
        dbm_ref[...] = jnp.zeros(dbm_ref.shape, dbm_ref.dtype)
        drm_ref[...] = jnp.zeros(drm_ref.shape, drm_ref.dtype)

    dwe_ref[0] += jax.lax.dot_general(
        xc, dgc, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    # dWd = h^T dy + hga^T dvia + dl1 * colsum(hga) * unit-rows(Wd)
    dwd_ref[0] += jax.lax.dot_general(
        h, dy, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dwd_ref[0] += jax.lax.dot_general(
        hga, dv, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    colsum_hga = jnp.sum(jnp.maximum(hg, 0.0), axis=0)           # [Sb] fp32
    dwd_ref[0] += (dl1 * colsum_hga / jnp.maximum(wdn, 1e-30)
                   )[:, None] * wd.astype(jnp.float32)
    dbg_ref[0, 0] += jnp.sum(dhg, axis=0)
    dbm_ref[0, 0] += jnp.sum(dhm, axis=0)
    drm_ref[0, 0] += jnp.sum(dhm * g, axis=0) * e


def _fused_backward_gated(x, We, bg, rmag, bm, Wd, bd, dy, dvia, dl1):
    L, B, d_in = x.shape
    d_sae = We.shape[-1]
    Bb, Sb = _pick_blocks_bwd_gated(B, d_in, d_sae, x.dtype.itemsize)
    nB, nS = B // Bb, d_sae // Sb
    dl1_arr = jnp.reshape(dl1.astype(jnp.float32), (L, 1, 1))
    vec = lambda v: v[:, None, :]
    e, wdn = _gated_hoisted(rmag, Wd)
    b_spec = pl.BlockSpec((1, Bb, d_in), lambda l, s, b: (l, b, 0),
                          memory_space=pltpu.VMEM)
    s_spec = pl.BlockSpec((1, 1, Sb), lambda l, s, b: (l, 0, s),
                          memory_space=pltpu.VMEM)
    dWe, dWd, dbg, dbm, drm = pl.pallas_call(
        _bwd_kernel_gated,
        grid=(L, nS, nB),
        in_specs=[
            b_spec, b_spec, b_spec,
            pl.BlockSpec((1, d_in, Sb), lambda l, s, b: (l, 0, s),
                         memory_space=pltpu.VMEM),
            s_spec, s_spec, s_spec,
            pl.BlockSpec((1, Sb, d_in), lambda l, s, b: (l, s, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, d_in), lambda l, s, b: (l, 0, 0),
                         memory_space=pltpu.VMEM),
            s_spec,
            pl.BlockSpec((1, 1, 1), lambda l, s, b: (l, 0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, d_in, Sb), lambda l, s, b: (l, 0, s),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Sb, d_in), lambda l, s, b: (l, s, 0),
                         memory_space=pltpu.VMEM),
            s_spec, s_spec, s_spec,
        ),
        out_shape=(
            jax.ShapeDtypeStruct((L, d_in, d_sae), jnp.float32),
            jax.ShapeDtypeStruct((L, d_sae, d_in), jnp.float32),
            jax.ShapeDtypeStruct((L, 1, d_sae), jnp.float32),
            jax.ShapeDtypeStruct((L, 1, d_sae), jnp.float32),
            jax.ShapeDtypeStruct((L, 1, d_sae), jnp.float32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=6 * 2 * L * B * d_in * d_sae,
            bytes_accessed=(nS * 3 * 2 * L * B * d_in
                            + 2 * L * d_in * d_sae) * x.dtype.itemsize,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=(jax.default_backend() == "cpu"),
    )(x, dy, dvia, We, vec(bg), vec(e), vec(bm), Wd, vec(bd), vec(wdn),
      dl1_arr)
    return dWe, dWd, dbg[:, 0], dbm[:, 0], drm[:, 0]


@jax.custom_vjp
def sae_gated_fused_apply(x, We, bg, rmag, bm, Wd, bd):
    """Gated-SAE fused forward over ``L`` stacked SAEs, feature acts
    VMEM-only (reference sae.py:648-793 minus the loss scalars).

    Returns ``(y, via, l1, nact)``: the reconstruction [L, B, d_in], the
    gate-path reconstruction relu(gate_pre) @ W_dec + b_dec [L, B, d_in]
    (feed it to the aux loss), the decoder-norm-weighted gate L1 value
    sum_j relu(gate_pre)_j ||W_dec_j|| [L] (differentiable, incl. the
    W_dec-norm term), and the exact h>0 counters [L, d_sae]
    (non-differentiable).  The VJP returns a ZERO cotangent for ``x``
    (the step never differentiates the batch); weight/bias grads remat h
    tile-wise with fp32 accumulation."""
    return _fused_forward_gated(x, We, bg, rmag, bm, Wd, bd)


def _sga_fwd(x, We, bg, rmag, bm, Wd, bd):
    out = _fused_forward_gated(x, We, bg, rmag, bm, Wd, bd)
    return out, (x, We, bg, rmag, bm, Wd, bd)


def _sga_bwd(res, cts):
    x, We, bg, rmag, bm, Wd, bd = res
    dy, dvia, dl1, _ = cts
    dy = dy.astype(x.dtype)
    dvia = dvia.astype(x.dtype)
    dWe, dWd, dbg, dbm, drm = _fused_backward_gated(
        x, We, bg, rmag, bm, Wd, bd, dy, dvia, dl1)
    # b_dec enters y AND via additively, and the encoder input xc = x - b_dec
    # => db_dec = sum_B dy + sum_B dvia - W_enc @ (sum_B dg), with
    # sum_B dg = dbg + exp(r_mag) * dbm (dg = dhg + e*dhm summed over rows).
    dsum_g = dbg + jnp.exp(rmag.astype(jnp.float32)) * dbm
    dbd = dy.sum(axis=-2, dtype=jnp.float32) \
        + dvia.sum(axis=-2, dtype=jnp.float32) \
        - jnp.einsum("lds,ls->ld", We, dsum_g.astype(We.dtype),
                     preferred_element_type=jnp.float32)
    cast = lambda g, ref: g.astype(ref.dtype)
    return (jnp.zeros_like(x), cast(dWe, We), cast(dbg, bg),
            cast(drm, rmag), cast(dbm, bm), cast(dWd, Wd), cast(dbd, bd))


sae_gated_fused_apply.defvjp(_sga_fwd, _sga_bwd)


def sae_gated_fused_reference(x, We, bg, rmag, bm, Wd, bd):
    """Unfused XLA equivalent of :func:`sae_gated_fused_apply` (same
    one-GEMM-encoder formulation, fp32 accumulation with one rounding to
    the compute dtype at the pre-acts) for the exactness tests."""
    xc = x - bd[:, None, :]
    g = jnp.einsum("lbd,lds->lbs", xc, We,
                   preferred_element_type=jnp.float32)
    hg = (g + bg.astype(jnp.float32)[:, None, :]).astype(x.dtype) \
        .astype(jnp.float32)
    e = jnp.exp(rmag.astype(jnp.float32))[:, None, :]
    hm = (g * e + bm.astype(jnp.float32)[:, None, :]).astype(x.dtype) \
        .astype(jnp.float32)
    gate = hg > 0.0
    h = jnp.where(gate, jnp.maximum(hm, 0.0), 0.0).astype(x.dtype)
    hga = jnp.maximum(hg, 0.0).astype(x.dtype)
    dec = lambda f: (jnp.einsum("lbs,lsd->lbd", f, Wd,
                                preferred_element_type=jnp.float32)
                     + bd.astype(jnp.float32)[:, None, :]).astype(x.dtype)
    y, via = dec(h), dec(hga)
    wdn = jnp.sqrt(jnp.sum(jnp.square(Wd.astype(jnp.float32)), axis=-1))
    l1 = jnp.sum(jnp.maximum(hg, 0.0) * wdn[:, None, :], axis=(1, 2))
    nact = (h > 0).sum(axis=1).astype(jnp.float32)
    return y, via, l1, nact


def sae_fused_topk_reference(x, We, be, Wd, bd, k):
    """Unfused XLA equivalent of :func:`sae_fused_apply_topk` (threshold-
    mask semantics: ties at the k-th value keep >= k entries) for the
    exactness tests.  GEMMs accumulate in fp32 and round ONCE to the
    compute dtype — the kernel's (and the TPU bf16 matmul's) rounding; a
    plain bf16 einsum on the CPU test platform rounds differently and
    shifts thresholds."""
    xc = x - bd[:, None, :]
    hpre = (jnp.einsum("lbd,lds->lbs", xc, We,
                       preferred_element_type=jnp.float32)
            + be.astype(jnp.float32)[:, None, :]).astype(x.dtype)
    t = jax.lax.top_k(hpre.astype(jnp.float32), k)[0][..., -1:]
    t = jnp.maximum(t, 0.0)
    active = (hpre.astype(jnp.float32) >= t) & (hpre > 0)
    h = jnp.where(active, hpre, jnp.zeros((), hpre.dtype))
    y = (jnp.einsum("lbs,lsd->lbd", h, Wd,
                    preferred_element_type=jnp.float32)
         + bd.astype(jnp.float32)[:, None, :]).astype(x.dtype)
    l1 = h.sum(axis=(1, 2), dtype=jnp.float32)
    nact = active.sum(axis=1).astype(jnp.float32)
    return y, l1, nact
