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


def test_sweep_observability_and_abort(tmp_path):
    """run() logs per-layer metrics at cadence, writes threshold checkpoints,
    and aborts on per-layer tolerance violations (train_sae.py:610-673)."""
    vcfg = ViTConfig(n_layers=2, d_model=16, d_head=4, n_heads=4, d_mlp=32,
                     patch_size=4, image_size=8, n_classes=5,
                     return_type="logits")
    model = HookedViT(vcfg, key=jax.random.PRNGKey(0))
    cfg = SAERunnerConfig(
        d_in=16, expansion_factor=2, context_size=vcfg.n_tokens,
        sweep_layers=(0, 1), layer_subtype="hook_resid_post",
        store_batch_size=8, n_batches_in_buffer=2, train_batch_size=40,
        total_training_images=64, lr=1e-3, lr_scheduler_name="constant",
        b_dec_init_method="zeros", log_to_wandb=False,
        wandb_log_frequency=2, n_checkpoints=2,
        checkpoint_path=str(tmp_path))
    images = np.random.default_rng(0).normal(size=(64, 3, 8, 8)).astype(np.float32)
    store = VisionActivationsStore(cfg, model, images)
    trainer = SAESweepTrainer(cfg, model=model, store=store)
    saes = trainer.run()
    assert len(saes) == 2
    import os
    ckpt_dirs = [d for d in os.listdir(tmp_path) if d.startswith("sweep_")]
    assert any(d == "sweep_final" for d in ckpt_dirs)
    assert any(d.startswith("sweep_n_tokens_") for d in ckpt_dirs)

    # per-layer metric dict
    state2, metrics = sae_sweep_train_step(trainer.state, store.next_batch(),
                                           cfg)
    trainer.state = state2
    vals = trainer.log_metrics(metrics)
    assert "layer_0/explained_variance" in vals and "layer_1/l0" in vals
    assert vals["loss"] == pytest.approx(
        (vals["layer_0/loss"] + vals["layer_1/loss"]) / 2, rel=1e-5)

    # abort path: impossible L0 floor trips layer 0
    trainer.cfg = cfg.replace(min_l0=1e9)
    assert trainer.check_run_tolerance(metrics) == 0
    trainer.cfg = cfg
    assert trainer.check_run_tolerance(metrics) is None


def _sweep_eval_setup(layer_subtype="hook_resid_post", head=None):
    vcfg = ViTConfig(n_layers=3, d_model=16, d_head=4, n_heads=4, d_mlp=32,
                     patch_size=4, image_size=8, n_classes=5,
                     return_type="logits")
    model = HookedViT(vcfg, key=jax.random.PRNGKey(0))
    d_in = 4 if head is not None else 16
    cfg = SAERunnerConfig(
        d_in=d_in, expansion_factor=2, context_size=vcfg.n_tokens,
        sweep_layers=(0, 1, 2), layer_subtype=layer_subtype,
        hook_point_head_index=head,
        store_batch_size=8, n_batches_in_buffer=2, train_batch_size=40,
        total_training_images=64, lr=1e-3, lr_scheduler_name="constant",
        b_dec_init_method="zeros", log_to_wandb=False)
    rng = np.random.default_rng(1)
    images = rng.normal(size=(16, 3, 8, 8)).astype(np.float32)
    labels = rng.integers(0, 5, 16)
    class_emb = rng.normal(size=(5, 5)).astype(np.float32)
    trainer = SAESweepTrainer(cfg, model=model)
    return model, cfg, trainer, images, labels, class_emb


@pytest.mark.parametrize("layer_subtype,head", [
    ("hook_resid_post", None),   # prefix-shared start_at_layer fast path
    ("hook_mlp_out", None),      # editing-hook fallback
    ("attn.hook_z", 1),          # head-sliced fallback
])
def test_sweep_eval_step_matches_single(layer_subtype, head):
    """The fused all-layer sweep eval == L independent make_eval_step runs
    (including the start_at_layer prefix-sharing path for resid_post)."""
    from vit_prisma_tpu.sae.evals import make_eval_step, make_sweep_eval_step
    model, cfg, trainer, images, labels, class_emb = \
        _sweep_eval_setup(layer_subtype, head)
    step = make_sweep_eval_step(model, cfg, trainer.layers)
    s = step(model.params, trainer.state.params,
             jnp.asarray(images), jnp.asarray(labels), jnp.asarray(class_emb))
    for i in range(3):
        single = make_eval_step(model, trainer.sae_for_layer(i))
        ref = single(model.params,
                     jax.tree.map(lambda a: a[i], trainer.state.params),
                     jnp.asarray(images), jnp.asarray(labels),
                     jnp.asarray(class_emb))
        np.testing.assert_allclose(float(s.loss[i]), float(ref.loss),
                                   rtol=2e-5)
        np.testing.assert_allclose(float(s.recons_loss[i]),
                                   float(ref.recons_loss), rtol=2e-4,
                                   atol=1e-5)
        np.testing.assert_allclose(float(s.zero_abl_loss[i]),
                                   float(ref.zero_abl_loss), rtol=2e-4,
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(s.l0_image[i]),
                                   np.asarray(ref.l0_image), atol=0)
        np.testing.assert_allclose(float(s.cos_sim[i]), float(ref.cos_sim),
                                   rtol=2e-4)
        np.testing.assert_allclose(np.asarray(s.act_counts[i]),
                                   np.asarray(ref.act_counts), atol=0)


def test_sweep_trainer_validate_and_abort(tmp_path):
    """In-training sweep validation: per-layer CE-recovered metrics, wandb
    keys, and the min_ce_recovered abort (train_sae.py:414-535 per layer)."""
    model, cfg, _, images, labels, class_emb = _sweep_eval_setup()
    eval_ds = [(images[i], int(labels[i])) for i in range(len(images))]
    cfg = cfg.replace(n_validation_runs=2, checkpoint_path=str(tmp_path))
    images_train = np.random.default_rng(0).normal(
        size=(64, 3, 8, 8)).astype(np.float32)
    store = VisionActivationsStore(cfg, model, images_train)
    trainer = SAESweepTrainer(cfg, model=model, store=store,
                              eval_dataset=eval_ds,
                              class_embeddings=class_emb)
    vals = trainer.validate()
    for layer in (0, 1, 2):
        for k in ("substitution_loss", "zero_ablation_loss", "model_loss",
                  "substitution_score", "L0", "cos_sim"):
            assert f"layer_{layer}/validation_metrics/{k}" in vals
    assert "validation_metrics/substitution_score" in vals
    assert trainer.check_validation_tolerance(vals) is None

    # an impossible CE-recovered floor aborts the run at the first
    # validation threshold
    trainer.cfg = cfg.replace(min_ce_recovered=1e9)
    assert trainer.check_validation_tolerance(vals) == 0
    with pytest.raises(RuntimeError, match="CE-recovered"):
        trainer.run()

    # and a full run with validation enabled (no tolerance) completes
    store2 = VisionActivationsStore(cfg, model, images_train)
    trainer2 = SAESweepTrainer(cfg, model=model, store=store2,
                               eval_dataset=eval_ds,
                               class_embeddings=class_emb)
    saes = trainer2.run()
    assert len(saes) == 3


def test_sweep_trainer_evaluate():
    """Final all-layer evaluate(): one fused program per batch, one metric
    dict per layer, matching the single-SAE process_dataset."""
    from vit_prisma_tpu.sae.evals import (EvalConfig, process_dataset,
                                          sweep_process_dataset)
    model, cfg, trainer, images, labels, class_emb = _sweep_eval_setup()
    data = [(images[:8], labels[:8]), (images[8:], labels[8:])]
    ecfg = EvalConfig(eval_max=16)
    results = trainer.evaluate(iter(data), class_embeddings=class_emb,
                               eval_cfg=ecfg)
    assert len(results) == 3 and results[2]["layer"] == 2
    single = process_dataset(model, trainer.sae_for_layer(1), iter(data),
                             class_emb, ecfg)
    r = results[1]
    assert r["avg_reconstruction_loss"] == pytest.approx(
        single["avg_reconstruction_loss"], rel=2e-4)
    assert r["avg_zero_abl_loss"] == pytest.approx(
        single["avg_zero_abl_loss"], rel=2e-4)
    assert r["ce_recovered"] == pytest.approx(single["ce_recovered"],
                                              rel=1e-3)
    assert r["avg_l0"] == pytest.approx(single["avg_l0"], rel=1e-4)
    assert r["alive_fraction"] == pytest.approx(single["alive_fraction"])


def test_vit_forward_start_at_layer():
    """start_at_layer resumes from a cached residual: feeding layer l's
    hook_resid_post with start_at_layer=l+1 reproduces the full forward."""
    from vit_prisma_tpu.models.vit import vit_forward
    from vit_prisma_tpu.prisma.hooks import HookRuntime
    vcfg = ViTConfig(n_layers=3, d_model=16, d_head=4, n_heads=4, d_mlp=32,
                     patch_size=4, image_size=8, n_classes=5,
                     return_type="logits")
    model = HookedViT(vcfg, key=jax.random.PRNGKey(0))
    x = jnp.asarray(np.random.default_rng(2).normal(
        size=(4, 3, 8, 8)).astype(np.float32))
    full = model(x)
    for l in range(3):
        rt = HookRuntime(names_filter=f"blocks.{l}.hook_resid_post")
        vit_forward(model.params, vcfg, x, rt)
        resid = rt.cache[f"blocks.{l}.hook_resid_post"]
        out = vit_forward(model.params, vcfg, resid, start_at_layer=l + 1)
        np.testing.assert_allclose(np.asarray(out), np.asarray(full),
                                   rtol=1e-5, atol=1e-5)


def test_trainer_load_dataset_cifar(tmp_path):
    """VisionSAETrainer.load_dataset dispatches to the CIFAR loader
    (train_sae.py:149-209)."""
    import pickle
    from vit_prisma_tpu.sae import VisionSAETrainer
    root = tmp_path / "cifar-10-batches-py"
    root.mkdir()
    rng = np.random.default_rng(0)
    for name, n in [("data_batch_1", 10), ("data_batch_2", 10),
                    ("data_batch_3", 10), ("data_batch_4", 10),
                    ("data_batch_5", 10), ("test_batch", 5)]:
        blob = {b"data": rng.integers(0, 255, (n, 3072), np.uint8),
                b"labels": rng.integers(0, 10, n).tolist()}
        with open(root / name, "wb") as f:
            pickle.dump(blob, f)
    cfg = SAERunnerConfig(dataset_name="cifar10", dataset_path=str(tmp_path),
                          image_size=32)
    train, val = VisionSAETrainer.load_dataset(cfg)
    img, label = train[0]
    assert img.shape == (3, 32, 32) and 0 <= label < 10
    assert len(val) == 10
