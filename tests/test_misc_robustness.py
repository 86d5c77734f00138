"""Robustness checks: bf16 speed path sanity, jit-program reuse, polygenic
dataset, store determinism."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vit_prisma_tpu import HookedViT, ViTConfig
from vit_prisma_tpu.dataloaders import PolygenicInductionDataset


def test_bf16_forward_tracks_f32():
    cfg32 = ViTConfig(n_layers=2, d_model=32, d_head=8, n_heads=4, d_mlp=64,
                      patch_size=4, image_size=16, n_classes=8,
                      return_type="logits")
    model32 = HookedViT(cfg32, key=jax.random.PRNGKey(0))
    cfg16 = cfg32.replace(dtype="bfloat16")
    params16 = jax.tree.map(lambda a: a.astype(jnp.bfloat16), model32.params)
    model16 = HookedViT(cfg16, params=params16)
    x = jax.random.uniform(jax.random.PRNGKey(1), (4, 3, 16, 16))
    out32 = np.asarray(model32(x))
    out16 = np.asarray(model16(x.astype(jnp.bfloat16)).astype(jnp.float32))
    # bf16 has ~3 decimal digits; outputs should track within a few percent
    scale = np.abs(out32).mean() + 1e-6
    assert np.abs(out32 - out16).mean() / scale < 0.05
    # and the cached LN scales stay finite
    _, cache = model16.run_with_cache(x.astype(jnp.bfloat16),
                                      names_filter=lambda n: "scale" in n,
                                      return_cache_object=False)
    for k, v in cache.items():
        assert np.isfinite(np.asarray(v, np.float32)).all(), k


def test_jit_programs_are_reused():
    cfg = ViTConfig(n_layers=1, d_model=8, d_head=2, n_heads=4, d_mlp=16,
                    patch_size=4, image_size=8, n_classes=3,
                    return_type="logits")
    model = HookedViT(cfg, key=jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 3, 8, 8))
    model(x)
    n = len(model._jit_cache)
    model(x)
    model(x)
    assert len(model._jit_cache) == n  # same program reused

    model.run_with_cache(x, names_filter="blocks.0.hook_resid_post")
    n2 = len(model._jit_cache)
    model.run_with_cache(x, names_filter="blocks.0.hook_resid_post")
    assert len(model._jit_cache) == n2

    # reusing the same hook fn object: one cache entry
    fn = lambda v, hook: v * 2.0
    model.run_with_hooks(x, fwd_hooks=[("blocks.0.hook_mlp_out", fn)])
    n3 = len(model._jit_cache)
    model.run_with_hooks(x, fwd_hooks=[("blocks.0.hook_mlp_out", fn)])
    assert len(model._jit_cache) == n3


def test_polygenic_induction_dataset(tmp_path):
    ds = PolygenicInductionDataset("train", dir_path=str(tmp_path),
                                   stride=16)
    assert len(ds) > 50
    img, label = ds[0]
    assert img.shape == (1, 64, 64) and 0 <= label < 12
    labels = {ds[i][1] for i in range(len(ds))}
    assert len(labels) == 12
    # cache reload path
    ds2 = PolygenicInductionDataset("test", dir_path=str(tmp_path))
    assert len(ds2) > 0


def test_store_determinism_same_seed():
    from vit_prisma_tpu.sae import SAERunnerConfig, VisionActivationsStore
    vcfg = ViTConfig(n_layers=1, d_model=8, d_head=2, n_heads=4, d_mlp=16,
                     patch_size=4, image_size=8, n_classes=3,
                     return_type="logits")
    model = HookedViT(vcfg, key=jax.random.PRNGKey(0))
    cfg = SAERunnerConfig(d_in=8, expansion_factor=2,
                          context_size=vcfg.n_tokens, hook_point_layer=0,
                          store_batch_size=4, n_batches_in_buffer=2,
                          train_batch_size=16, b_dec_init_method="zeros",
                          log_to_wandb=False)
    images = np.random.default_rng(0).normal(size=(16, 3, 8, 8)).astype(np.float32)
    s1 = VisionActivationsStore(cfg, model, images, seed=7)
    s2 = VisionActivationsStore(cfg, model, images, seed=7)
    np.testing.assert_array_equal(np.asarray(s1.next_batch()),
                                  np.asarray(s2.next_batch()))
