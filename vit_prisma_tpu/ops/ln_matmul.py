"""Fused LayerNorm -> GEMM Pallas kernel (the "zero-copy LN epilogue").

Pre-LN transformers normalize the residual stream and immediately feed the
result into projection GEMMs (ln1 -> Q/K/V, ln2 -> W_in; reference
transformer_block.py:105-132).  XLA materializes the LN output in HBM
between the two ops — at CLIP-B/32 batch 256 that is a [12800, 768]
round trip per site per layer, pure bandwidth with zero FLOPs.  This
kernel computes ``normalize(x) @ W_s + b_s`` for a STACK of weights
(s = q, k, v share one normalize) with the normalize running on the x
tile already in VMEM for the GEMMs: x is read once and the LN
intermediate never touches HBM.  The output is [S, R, C] so each
projection is a contiguous zero-copy slice for the downstream Pallas
attention-mix kernel (ops/attention.py attention_mix_tnh).

Shape contract (checked by :func:`ln_matmul_fits`): the whole weight
stack [S, D, C] stays VMEM-resident across the row grid (it is the
reused operand), so the kernel applies exactly where transformer
projections live (3x 768x768 QKV = 3.5 MB bf16, 1x 768x3072 W_in =
4.5 MB).  Affine LNs fold into the weights at trace time
((xn*w + b_ln) @ W == xn @ (w[:,None]*W) + (b_ln @ W + b)) — see
:func:`fold_ln_affine` — so the kernel itself only implements the
weightless normalize, in an fp32 island matching ``layer_norm_pre``
(models/layers.py): center, rms with eps inside the sqrt, cast back to
the input dtype BEFORE the GEMM.

Backward: custom_vjp whose backward derives the exact VJP from the
unfused reference implementation (one LN recompute — the standard
rematerialization trade), so gradient callers (supervised training,
``incl_bwd`` attribution) keep exact numerics.

Sharded callers partition over rows via custom_partitioning (the weight
stack and biases are replicated operands), mirroring ops/attention.py's
mix kernels.
"""

from __future__ import annotations

import functools as _functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.custom_partitioning import custom_partitioning

_VMEM_BUDGET = 12 * 1024 * 1024


def _pick_row_block(R: int, S: int, D: int, C: int, itemsize: int):
    """Largest dividing row block whose working set fits VMEM: x tile +
    resident weight stack + fp32 centered scratch + out tiles."""
    for Rb in (1024, 512, 256, 128):
        if R % Rb:
            continue
        need = (Rb * D * itemsize          # x tile
                + S * D * C * itemsize     # W stack (resident on the grid)
                + Rb * D * 4               # fp32 centered/normalized scratch
                + Rb * C * 4               # fp32 matmul accumulator
                + S * Rb * C * itemsize    # out tiles
                + S * C * 4)               # bias rows
        if need <= _VMEM_BUDGET:
            return Rb
    return None


def ln_matmul_fits(R: int, S: int, D: int, C: int, itemsize: int) -> bool:
    """Gate: lane-aligned shapes and a VMEM-resident weight stack."""
    return (D % 128 == 0 and C % 128 == 0 and R >= 128
            and _pick_row_block(R, S, D, C, itemsize) is not None)


def _ln_matmul_kernel(x_ref, w_ref, b_ref, o_ref, *, eps: float, S: int):
    xf = x_ref[:].astype(jnp.float32)
    xc = xf - jnp.mean(xf, axis=-1, keepdims=True)
    scale = jnp.sqrt(jnp.mean(jnp.square(xc), axis=-1, keepdims=True) + eps)
    xn = (xc / scale).astype(x_ref.dtype)  # match layer_norm_pre's cast
    for s in range(S):  # static unroll: one MXU pass per projection
        acc = jnp.dot(xn, w_ref[s], preferred_element_type=jnp.float32)
        o_ref[s] = (acc + b_ref[s].astype(jnp.float32)).astype(o_ref.dtype)


def _ln_matmul_forward(x, W, b, eps: float):
    """x: [R, D], W: [S, D, C], b: [S, C] -> [S, R, C]."""
    R, D = x.shape
    S, _, C = W.shape
    Rb = _pick_row_block(R, S, D, C, x.dtype.itemsize)
    if Rb is None:
        return _ln_matmul_reference(x, W, b, eps)
    return pl.pallas_call(
        _functools.partial(_ln_matmul_kernel, eps=eps, S=S),
        grid=(R // Rb,),
        in_specs=[
            pl.BlockSpec((Rb, D), lambda i: (i, 0)),
            pl.BlockSpec((S, D, C), lambda i: (0, 0, 0)),   # resident
            pl.BlockSpec((S, 1, C), lambda i: (0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((S, Rb, C), lambda i: (0, i, 0)),
        out_shape=jax.ShapeDtypeStruct((S, R, C), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * S * R * D * C, transcendentals=R,
            bytes_accessed=(R * D + S * D * C + S * R * C)
            * x.dtype.itemsize),
        interpret=(jax.default_backend() == "cpu"),
    )(x, W, b[:, None, :])


def _ln_matmul_reference(x, W, b, eps: float):
    """Unfused twin with identical numerics (the XLA path this replaces):
    fp32 LN island, cast back to the wire dtype, f32-accumulated GEMMs."""
    xf = x.astype(jnp.float32)
    xc = xf - jnp.mean(xf, axis=-1, keepdims=True)
    scale = jnp.sqrt(jnp.mean(jnp.square(xc), axis=-1, keepdims=True) + eps)
    xn = (xc / scale).astype(x.dtype)
    acc = jnp.einsum("rd,sdc->src", xn, W,
                     preferred_element_type=jnp.float32)
    return (acc + b[:, None, :].astype(jnp.float32)).astype(x.dtype)


# -- sharding: rows partition, weights/biases replicate ----------------------

def _ln_infer(eps, mesh, arg_infos, result_infos):
    from jax.sharding import NamedSharding, PartitionSpec
    sh = arg_infos[0].sharding
    r_ax = sh.spec[0] if (sh is not None and hasattr(sh, "spec")
                          and len(sh.spec) > 0) else None
    return NamedSharding(mesh, PartitionSpec(None, r_ax, None))


def _ln_partition(eps, mesh, arg_infos, result_infos):
    out_sh = _ln_infer(eps, mesh, arg_infos, result_infos)
    from jax.sharding import NamedSharding, PartitionSpec
    arg_shs = (NamedSharding(mesh, PartitionSpec(out_sh.spec[1], None)),
               NamedSharding(mesh, PartitionSpec(None, None, None)),
               NamedSharding(mesh, PartitionSpec(None, None)))

    def lower_fn(x, W, b):
        return _ln_matmul_forward(x, W, b, eps)

    return mesh, lower_fn, out_sh, arg_shs


@_functools.partial(custom_partitioning, static_argnums=(3,))
def _ln_matmul_sharded(x, W, b, eps):
    return _ln_matmul_forward(x, W, b, eps)


_ln_matmul_sharded.def_partition(
    infer_sharding_from_operands=_ln_infer,
    partition=_ln_partition,
    # rows are the only partitionable factor; d contracts, s/c ride the
    # replicated weight stack (the partition callback replicates W/b)
    sharding_rule="r d, s d c, s c -> s r c",
)


@_functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def ln_matmul(x, W, b, eps: float = 1e-5):
    """``layer_norm_pre(x) @ W[s] + b[s]`` for a stack of projections that
    share one normalize, with the LN fused into the GEMMs' LHS load.
    x: [R, D], W: [S, D, C], b: [S, C] -> [S, R, C].  Falls back to the
    numerically identical unfused XLA form when shapes don't fit the
    kernel contract."""
    return _ln_matmul_sharded(x, W, b, eps)


def _ln_fwd(x, W, b, eps):
    return _ln_matmul_sharded(x, W, b, eps), (x, W, b)


def _ln_bwd(eps, res, g):
    x, W, b = res
    _, vjp = jax.vjp(lambda x_, W_, b_: _ln_matmul_reference(x_, W_, b_, eps),
                     x, W, b)
    return vjp(g)


ln_matmul.defvjp(_ln_fwd, _ln_bwd)


def fold_ln_affine(W, b, ln_w=None, ln_b=None):
    """Fold an affine LN's weight/bias into the downstream projections:
    ``(xn * ln_w + ln_b) @ W[s] + b[s] == xn @ (ln_w[:, None] * W[s])
    + (ln_b @ W[s] + b[s])``.  W: [S, D, C], b: [S, C]; returns (W', b')
    for :func:`ln_matmul`."""
    if ln_b is not None:
        # uses the ORIGINAL W: the ln bias routes through the unscaled
        # projection
        b = jnp.einsum("d,sdc->sc", ln_b.astype(W.dtype), W,
                       preferred_element_type=jnp.float32).astype(b.dtype) + b
    if ln_w is not None:
        W = ln_w.astype(W.dtype)[None, :, None] * W
    return W, b
