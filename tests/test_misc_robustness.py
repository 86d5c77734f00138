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


def test_sae_train_state_resume(tmp_path):
    """Exact mid-run resume: save full state, reload, continue — results
    bit-identical to uninterrupted training."""
    from vit_prisma_tpu.sae import (SAERunnerConfig, init_train_state,
                                    load_train_state, sae_train_step,
                                    save_train_state)
    cfg = SAERunnerConfig(d_in=16, expansion_factor=4, train_batch_size=32,
                          lr=1e-3, lr_scheduler_name="cosineannealingwarmup",
                          lr_warm_up_steps=5, b_dec_init_method="zeros",
                          log_to_wandb=False)
    batches = [jax.random.normal(jax.random.PRNGKey(i), (32, 16))
               for i in range(6)]

    # uninterrupted
    s = init_train_state(cfg, key=jax.random.PRNGKey(0))
    for b in batches:
        s, m = sae_train_step(s, b, cfg)
    w_ref = np.asarray(s.params["W_enc"])

    # interrupted at step 3 + resumed
    s = init_train_state(cfg, key=jax.random.PRNGKey(0))
    for b in batches[:3]:
        s, m = sae_train_step(s, b, cfg)
    path = save_train_state(str(tmp_path / "resume"), s, cfg)
    s2, cfg2 = load_train_state(path)
    assert cfg2 == cfg
    for b in batches[3:]:
        s2, m = sae_train_step(s2, b, cfg2)
    np.testing.assert_array_equal(np.asarray(s2.params["W_enc"]), w_ref)
    assert int(s2.step) == 6


def test_device_time_helper():
    from vit_prisma_tpu.utils.profiling import device_time, flops_per_second
    f = jax.jit(lambda x: x @ x)
    x = jnp.ones((64, 64))
    dt = device_time(f, x, iters=3, warmup=1)
    assert dt > 0
    assert flops_per_second(f, 2 * 64**3, x, iters=3) > 0
