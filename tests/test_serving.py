"""Serving surface: AOT CompiledForward + portable jax.export artifacts.

No reference counterpart (the reference deploys nothing); this is the
TPU-native production story — a fixed-batch AOT executable for in-process
serving and a self-contained StableHLO artifact (params baked in, batch
optionally symbolic) loadable without model code.
"""

import numpy as np

import jax
import jax.numpy as jnp

from vit_prisma_tpu import (
    CompiledForward,
    HookedViT,
    ViTConfig,
    export_forward,
    load_forward,
)


def _model():
    cfg = ViTConfig(n_layers=2, d_model=32, d_head=8, n_heads=4, d_mlp=64,
                    patch_size=8, image_size=16, n_classes=7,
                    return_type="class_logits")
    return HookedViT(cfg, key=jax.random.PRNGKey(0)), cfg


def test_compiled_forward_chunks_and_pads():
    model, cfg = _model()
    x = np.asarray(jax.random.normal(jax.random.PRNGKey(1), (10, 3, 16, 16)))
    cf = CompiledForward(model, batch_size=4)
    out = cf(x)  # 2 full chunks + 1 padded
    ref = model(jnp.asarray(x))
    assert out.shape == (10, 7)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=1e-5)


def test_compiled_forward_with_cache():
    model, cfg = _model()
    x = np.asarray(jax.random.normal(jax.random.PRNGKey(2), (4, 3, 16, 16)))
    cf = CompiledForward(model, batch_size=4,
                         names_filter="blocks.1.hook_resid_post")
    out, cache = cf(x)
    assert cache["blocks.1.hook_resid_post"].shape == (4, cfg.n_tokens, 32)


def test_export_roundtrip_fixed_batch(tmp_path):
    model, _ = _model()
    x = jnp.asarray(np.random.default_rng(0).normal(
        size=(4, 3, 16, 16)).astype(np.float32))
    path = str(tmp_path / "fwd.jaxexport")
    export_forward(model, batch_size=4, path=path)
    fn = load_forward(path)  # no model code needed from here on
    np.testing.assert_allclose(np.asarray(fn(x)), np.asarray(model(x)),
                               rtol=2e-5, atol=1e-5)


def test_export_batch_polymorphic_with_cache():
    model, cfg = _model()
    data = export_forward(model, batch_size=None,
                          names_filter="blocks.0.hook_resid_post")
    fn = load_forward(data)
    for n in (3, 10):  # one artifact, multiple batch sizes
        x = jnp.asarray(np.random.default_rng(n).normal(
            size=(n, 3, 16, 16)).astype(np.float32))
        out, cache = fn(x)
        np.testing.assert_allclose(np.asarray(out), np.asarray(model(x)),
                                   rtol=2e-5, atol=1e-5)
        assert cache["blocks.0.hook_resid_post"].shape == (
            n, cfg.n_tokens, 32)
