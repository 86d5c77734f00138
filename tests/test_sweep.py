"""All-layer SAE sweep: vmapped multi-SAE training from one shared harvest."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vit_prisma_tpu import HookedViT, ViTConfig
from vit_prisma_tpu.sae import (
    SAERunnerConfig,
    SAESweepTrainer,
    VisionActivationsStore,
    init_sweep_state,
    init_train_state,
    sae_sweep_train_step,
    sae_train_step,
)


def test_sweep_step_matches_independent_steps():
    cfg = SAERunnerConfig(d_in=16, expansion_factor=4, train_batch_size=32,
                          lr=1e-3, lr_scheduler_name="constant",
                          b_dec_init_method="zeros", log_to_wandb=False,
                          sweep_layers=(0, 1, 2))
    state = init_sweep_state(cfg, 3, key=jax.random.PRNGKey(0))
    batch = jax.random.normal(jax.random.PRNGKey(1), (32, 3, 16))
    # independent single-SAE steps with the same per-layer init
    singles = []
    for i in range(3):
        s = jax.tree.map(lambda a: a[i],
                         init_sweep_state(cfg, 3, key=jax.random.PRNGKey(0)))
        s2, m = sae_train_step(s, batch[:, i, :], cfg)
        singles.append((s2, m))
    swept, metrics = sae_sweep_train_step(state, batch, cfg)
    for i in range(3):
        np.testing.assert_allclose(np.asarray(swept.params["W_enc"][i]),
                                   np.asarray(singles[i][0].params["W_enc"]),
                                   atol=1e-6)
        np.testing.assert_allclose(float(metrics.loss[i]),
                                   float(singles[i][1].loss), atol=1e-6)


def test_sweep_trainer_end_to_end():
    vcfg = ViTConfig(n_layers=3, d_model=16, d_head=4, n_heads=4, d_mlp=32,
                     patch_size=4, image_size=8, n_classes=5,
                     return_type="logits")
    model = HookedViT(vcfg, key=jax.random.PRNGKey(0))
    cfg = SAERunnerConfig(
        d_in=16, expansion_factor=2, context_size=vcfg.n_tokens,
        sweep_layers=(0, 1, 2), layer_subtype="hook_resid_post",
        store_batch_size=8, n_batches_in_buffer=2, train_batch_size=40,
        total_training_images=64, lr=1e-3, lr_scheduler_name="constant",
        b_dec_init_method="mean", log_to_wandb=False)
    images = np.random.default_rng(0).normal(size=(64, 3, 8, 8)).astype(np.float32)
    store = VisionActivationsStore(cfg, model, images)
    batch = store.next_batch()
    assert batch.shape == (40, 3, 16)

    trainer = SAESweepTrainer(cfg, model=model, store=store)
    # per-layer b_dec differs (mean of different layers' activations)
    b0, b1 = trainer.state.params["b_dec"][0], trainer.state.params["b_dec"][1]
    assert not np.allclose(np.asarray(b0), np.asarray(b1))
    saes = trainer.run()
    assert len(saes) == 3
    assert saes[2].cfg.hook_point == "blocks.2.hook_resid_post"
    out = saes[0](jax.random.normal(jax.random.PRNGKey(3), (8, 16)))
    assert out.sae_out.shape == (8, 16)


def test_sweep_checkpoints(tmp_path):
    cfg = SAERunnerConfig(d_in=8, expansion_factor=2, train_batch_size=16,
                          sweep_layers=(0, 1), lr=1e-3,
                          b_dec_init_method="zeros", log_to_wandb=False)
    trainer = SAESweepTrainer(cfg)
    paths = trainer.save_checkpoints(str(tmp_path))
    assert len(paths) == 2
    from vit_prisma_tpu.sae import SparseAutoencoder
    loaded = SparseAutoencoder.load_from_pretrained(paths[1])
    assert loaded.cfg.hook_point_layer == 1
