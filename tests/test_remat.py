"""Block rematerialization (cfg.remat_blocks) — identical numerics.

The standard deep-model training recipe: jax.checkpoint around each
scanned block trades ~1/3 extra FLOPs for O(1) activation memory in
depth.  Gradients must match the plain path exactly (same ops, same
dropout masks from the same per-layer keys); hook-caching forwards
compile the plain scan (capture can't cross the checkpoint boundary).
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vit_prisma_tpu import HookedViT, ViTConfig
from vit_prisma_tpu.models.vit import vit_forward
from vit_prisma_tpu.prisma.hooks import NULL_HOOKS


def _setup(**kw):
    cfg = ViTConfig(n_layers=16, d_model=32, d_head=8, n_heads=4, d_mlp=64,
                    patch_size=8, image_size=16, n_classes=7,
                    return_type="class_logits", scan_blocks="always", **kw)
    model = HookedViT(cfg, key=jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 3, 16, 16))
    y = jax.random.normal(jax.random.PRNGKey(2), (4, 7))
    return cfg, model, x, y


def _grads(cfg, model, x, y, key=None):
    def f(p):
        out = vit_forward(p, cfg, x, NULL_HOOKS, dropout_key=key)
        return jnp.square(out - y).mean()
    return jax.tree.leaves(jax.grad(f)(model.params))


def _assert_close(ga, gb):
    for a, b in zip(ga, gb):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_remat_grads_match_plain():
    cfg, model, x, y = _setup()
    _assert_close(_grads(cfg, model, x, y),
                  _grads(dataclasses.replace(cfg, remat_blocks=True),
                         model, x, y))


@pytest.mark.slow
def test_remat_with_dropout_same_masks():
    cfg, model, x, y = _setup(attn_dropout_rate=0.1, mlp_dropout_rate=0.1)
    key = jax.random.PRNGKey(5)
    _assert_close(_grads(cfg, model, x, y, key=key),
                  _grads(dataclasses.replace(cfg, remat_blocks=True),
                         model, x, y, key=key))


def test_remat_cached_forward_still_works():
    cfg, model, x, _ = _setup(remat_blocks=True)
    model.cfg = cfg
    out, cache = model.run_with_cache(
        x, names_filter=lambda n: "resid_post" in n)
    assert f"blocks.{cfg.n_layers - 1}.hook_resid_post" in cache
    ref = HookedViT(dataclasses.replace(cfg, remat_blocks=False),
                    key=jax.random.PRNGKey(0))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref(x)),
                               rtol=1e-5, atol=1e-5)
