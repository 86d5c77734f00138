"""End-to-end quality gate: supervised-train a small ViT on the circle
task, then train an SAE on its *real* activations, and require the quality
metrics the reference's tables report (explained variance, CE-recovered)
to come out high.  This is the whole framework exercised in one flow:
trainer -> hooked model -> activation store -> SAE trainer -> eval suite."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vit_prisma_tpu import HookedViT, ViTConfig
from vit_prisma_tpu.dataloaders import CircleDataset, numpy_batches, train_test_dataset
from vit_prisma_tpu.sae import (
    EvalConfig,
    SAERunnerConfig,
    SparseAutoencoder,
    VisionActivationsStore,
    VisionSAETrainer,
    process_dataset,
)
from vit_prisma_tpu.training import TrainerConfig, train


@pytest.fixture(scope="module")
def trained_setup():
    ds = CircleDataset(p=13, im_size=16, radius=6, n_channels=1)
    splits = train_test_dataset(ds, test_split=0.2, seed=0)
    cfg = ViTConfig(n_layers=2, d_model=32, d_head=8, n_heads=4, d_mlp=128,
                    patch_size=4, image_size=16, n_channels=1, n_classes=13,
                    return_type="logits")
    tcfg = TrainerConfig(lr=2e-3, batch_size=16, num_epochs=40,
                         warmup_steps=10, scheduler_type="CosineAnnealing",
                         log_frequency=10_000, max_steps=300)
    model = train(lambda c: HookedViT(c, key=jax.random.PRNGKey(0)), cfg,
                  splits["train"], splits["test"], tcfg=tcfg)
    return model, cfg, splits


def test_vit_learned_the_task(trained_setup):
    model, cfg, splits = trained_setup
    images, labels = next(numpy_batches(splits["test"], 32))
    preds = np.asarray(jnp.argmax(model(jnp.asarray(images)), -1))
    acc = (preds == labels).mean()
    assert acc > 0.4, f"trained ViT accuracy too low: {acc}"


def test_sae_reaches_quality_on_real_activations(trained_setup):
    model, vcfg, splits = trained_setup
    scfg = SAERunnerConfig(
        d_in=32, expansion_factor=8, context_size=vcfg.n_tokens,
        hook_point_layer=1, layer_subtype="hook_resid_post",
        store_batch_size=16, n_batches_in_buffer=4, train_batch_size=512,
        total_training_images=30_000, lr=3e-3, lr_warm_up_steps=50,
        l1_coefficient=1e-4, b_dec_init_method="geometric_median",
        log_to_wandb=False, feature_sampling_window=10_000,
        dead_feature_window=10_000)
    scfg = scfg.replace(n_validation_runs=2)
    images = np.stack([np.asarray(splits["train"][i][0])
                       for i in range(len(splits["train"]))])
    store = VisionActivationsStore(scfg, model, images)
    trainer = VisionSAETrainer(scfg, model=model, store=store,
                               eval_dataset=splits["test"],
                               class_embeddings=np.eye(13, dtype=np.float32))
    sae = trainer.run()
    # the run exercised in-training validation (train_sae.py:414-535);
    # by the end the substitution score must be high on held-out data
    vvals = trainer.validate()
    assert vvals is not None
    assert vvals["validation_metrics/substitution_score"] > 0.8, vvals
    assert not trainer.check_validation_tolerance(vvals)
    assert trainer.check_validation_tolerance(
        {"validation_metrics/substitution_score": -1.0}) is False  # no min set
    abort_trainer_cfg = scfg.replace(min_ce_recovered=0.9)
    trainer.cfg = abort_trainer_cfg
    assert trainer.check_validation_tolerance(
        {"validation_metrics/substitution_score": 0.5})
    trainer.cfg = scfg
    # training metrics: high explained variance on real activations
    batch = store.next_batch()
    from vit_prisma_tpu.sae.sae import sae_forward
    out = sae_forward(sae.params, scfg, batch, training=False)
    resid = jnp.square(batch - out.sae_out).sum(-1)
    total = jnp.square(batch - batch.mean(0)).sum(-1)
    ev = float((1 - resid / total).mean())
    assert ev > 0.75, f"explained variance too low: {ev}"

    # eval suite: CE-recovered near 1 when substituting the SAE
    n_test = (len(splits["test"]) // 16) * 16
    ecfg = EvalConfig(batch_size=16, eval_max=n_test)
    test_imgs = np.stack([np.asarray(splits["test"][i][0])
                          for i in range(n_test)])
    test_lbls = np.asarray([splits["test"][i][1] for i in range(n_test)])
    class_emb = np.eye(13, dtype=np.float32)  # logits are already class space
    stats = process_dataset(
        model, sae,
        ((test_imgs[i:i + 16], test_lbls[i:i + 16])
         for i in range(0, n_test, 16)),
        class_emb, ecfg)
    assert stats["avg_zero_abl_loss"] > stats["avg_loss"], \
        "zero-ablation should hurt"
    assert stats["ce_recovered"] > 0.8, \
        f"CE-recovered too low: {stats['ce_recovered']} ({stats})"
    assert stats["avg_cos_sim"] > 0.9, f"cosine sim low: {stats['avg_cos_sim']}"
