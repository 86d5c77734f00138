"""LN->GEMM fused epilogue (ops/ln_matmul.py) == the unfused XLA path.

The kernel is the `use_fused_ln_gemm` speed path of transformer_block
(ln1 -> QKV, ln2 -> W_in); it must reproduce the unfused forward — the
one verified against the torch oracle in tests/test_equivalence_vit.py —
to f32-accumulation tolerance, fall back cleanly on kernel-incompatible
shapes, and disengage when ln/attention-internal hooks are requested.
On the CPU test platform the kernel runs in interpreter mode.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vit_prisma_tpu import HookedViT, ViTConfig
from vit_prisma_tpu.ops.ln_matmul import (fold_ln_affine, ln_matmul,
                                          ln_matmul_fits,
                                          _ln_matmul_reference)

# kernel-aligned geometry (d_model % 128, rows = B*T >= 128)
R, D, C = 256, 128, 256


def test_kernel_matches_reference_fwd_bwd():
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    x = jax.random.normal(ks[0], (R, D))
    W = jax.random.normal(ks[1], (3, D, C)) * 0.05
    b = jax.random.normal(ks[2], (3, C)) * 0.01
    assert ln_matmul_fits(R, 3, D, C, 4)

    out = ln_matmul(x, W, b, 1e-5)
    ref = _ln_matmul_reference(x, W, b, 1e-5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)

    def loss(fn):
        return jax.grad(lambda *a: jnp.square(fn(*a, 1e-5)).sum(),
                        argnums=(0, 1, 2))(x, W, b)

    for g1, g2, name in zip(loss(ln_matmul), loss(_ln_matmul_reference),
                            ["dx", "dW", "db"]):
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                                   rtol=2e-4, atol=2e-4, err_msg=name)


def test_fold_ln_affine_exact():
    ks = jax.random.split(jax.random.PRNGKey(1), 5)
    x = jax.random.normal(ks[0], (R, D))
    W = jax.random.normal(ks[1], (2, D, C)) * 0.05
    b = jax.random.normal(ks[2], (2, C)) * 0.01
    ln_w = 1.0 + 0.1 * jax.random.normal(ks[3], (D,))
    ln_b = 0.1 * jax.random.normal(ks[4], (D,))

    Wf, bf = fold_ln_affine(W, b, ln_w, ln_b)
    got = _ln_matmul_reference(x, Wf, bf, 1e-5)

    # unfolded: affine LN then plain GEMMs
    xf = x - x.mean(-1, keepdims=True)
    xn = xf / jnp.sqrt(jnp.square(xf).mean(-1, keepdims=True) + 1e-5)
    aff = xn * ln_w + ln_b
    want = jnp.einsum("rd,sdc->src", aff, W) + b[:, None, :]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def _vit_cfg(**kw):
    base = dict(n_layers=2, d_model=128, d_head=32, n_heads=4, d_mlp=256,
                patch_size=8, image_size=32, n_channels=3, n_classes=10,
                activation_name="quick_gelu", layer_norm_pre=True,
                return_type="logits")
    base.update(kw)
    return ViTConfig(**base)


@pytest.mark.parametrize("norm", ["LN", "LNPre"])
def test_block_fused_ln_matches_unfused(norm):
    """Full model forward: fused flag on == off (both LN variants), and
    gradients through the custom VJP match.  B*T = 128*17 = 2176 is
    128-divisible so the kernel path actually engages (asserted)."""
    from vit_prisma_tpu.models.layers import (_ln_gemm_fusable,
                                              _ln_mlp_fusable)
    from vit_prisma_tpu.prisma.hooks import NULL_HOOKS
    kw = dict(normalization_type=norm)
    cfg_f = _vit_cfg(use_fused_ln_gemm=True, **kw)
    model_f = HookedViT(cfg_f, key=jax.random.PRNGKey(0))
    model_u = HookedViT(_vit_cfg(use_fused_ln_gemm=False, **kw),
                        key=jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(2), (128, 3, 32, 32))
    probe = jnp.zeros((128, cfg_f.n_tokens, cfg_f.d_model))
    assert _ln_gemm_fusable(cfg_f, NULL_HOOKS, "blocks.0", None, probe)
    assert _ln_mlp_fusable(cfg_f, NULL_HOOKS, "blocks.0", probe)

    out_f = model_f(x)
    out_u = model_u(x)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_u),
                               rtol=2e-5, atol=2e-5)

    def g(model):
        return jax.grad(lambda im: jnp.square(model(im)).sum())(x)

    np.testing.assert_allclose(np.asarray(g(model_f)),
                               np.asarray(g(model_u)),
                               rtol=5e-4, atol=5e-4)


def test_fused_ln_disengages_for_ln_hooks():
    """Requesting ln1/ln2 hooks must force the unfused path (the cache
    entries exist and equal the unfused values)."""
    model = HookedViT(_vit_cfg(use_fused_ln_gemm=True),
                      key=jax.random.PRNGKey(0))
    model_u = HookedViT(_vit_cfg(use_fused_ln_gemm=False),
                        key=jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(2), (4, 3, 32, 32))
    names = ["blocks.0.ln1.hook_scale", "blocks.1.ln2.hook_normalized",
             "blocks.0.attn.hook_pattern"]
    out, cache = model.run_with_cache(x, names_filter=lambda n: n in names)
    out_u, cache_u = model_u.run_with_cache(x,
                                            names_filter=lambda n: n in names)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_u),
                               rtol=2e-5, atol=2e-5)
    for n in names:
        np.testing.assert_allclose(np.asarray(cache[n]),
                                   np.asarray(cache_u[n]),
                                   rtol=2e-5, atol=2e-5, err_msg=n)


def test_fused_ln_sharded_dp():
    """ln_matmul partitions over rows on a dp mesh (custom_partitioning)."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    devs = np.array(jax.devices()[:4])
    mesh = Mesh(devs, ("dp",))
    x = jax.random.normal(jax.random.PRNGKey(0), (R, D))
    W = jax.random.normal(jax.random.PRNGKey(1), (1, D, C)) * 0.05
    b = jnp.zeros((1, C))
    xs = jax.device_put(x, NamedSharding(mesh, P("dp", None)))
    out = jax.jit(lambda a, w, bb: ln_matmul(a, w, bb, 1e-5))(xs, W, b)
    ref = _ln_matmul_reference(x, W, b, 1e-5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
