"""Supervised trainer, zero-shot eval, synthetic datasets, logit lens."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vit_prisma_tpu import HookedViT, ViTConfig
from vit_prisma_tpu.configs.vit_config import TextTransformerConfig
from vit_prisma_tpu.dataloaders import (
    CircleDataset,
    IndexedDataset,
    InductionDataset,
    get_clip_val_transforms,
    numpy_batches,
    train_test_dataset,
)
from vit_prisma_tpu.model_eval import accuracy, run, zero_shot_classifier, zero_shot_eval
from vit_prisma_tpu.models.text import HookedTextTransformer
from vit_prisma_tpu.prisma.logit_lens import (
    get_patch_logit_dictionary,
    get_patch_logit_directions,
)
from vit_prisma_tpu.training import TrainerConfig, train


def test_supervised_trainer_learns_circle(tmp_path):
    ds = CircleDataset(p=5, im_size=16, radius=6, n_channels=1)
    splits = train_test_dataset(ds, test_split=0.2)
    cfg = ViTConfig(n_layers=2, d_model=32, d_head=8, n_heads=4, d_mlp=64,
                    patch_size=4, image_size=16, n_channels=1, n_classes=5,
                    return_type="logits")
    tcfg = TrainerConfig(lr=1e-3, batch_size=8, num_epochs=30,
                         warmup_steps=5, scheduler_type="CosineAnnealing",
                         log_frequency=10_000, max_steps=60,
                         save_checkpoints=True, save_cp_frequency=30,
                         parent_dir=str(tmp_path))
    model = train(lambda c: HookedViT(c, key=jax.random.PRNGKey(0)), cfg,
                  splits["train"], splits["test"], tcfg=tcfg)
    # Loss must have dropped vs a fresh model on the train set
    fresh = HookedViT(cfg, key=jax.random.PRNGKey(0))
    images, labels = next(numpy_batches(splits["train"], 16))
    def ce(m):
        logits = m(jnp.asarray(images))
        logp = jax.nn.log_softmax(logits, -1)
        return float(-np.take_along_axis(np.asarray(logp), labels[:, None], 1).mean())
    assert ce(model) < ce(fresh)
    # checkpoint written
    import os
    ckpts = os.listdir(tmp_path / "Checkpoints")
    assert any(f.endswith(".ckpt") for f in ckpts)


def test_induction_dataset(tmp_path):
    ds = InductionDataset("train", dir_path=str(tmp_path / "induction"))
    assert len(ds) > 100
    img, label = ds[0]
    assert img.shape == (1, 32, 32) and 0 <= label < 4
    labels = [ds[i][1] for i in range(200)]
    assert len(set(labels)) == 4  # balanced-ish sample has all classes
    # test split exists too
    ds_test = InductionDataset("test", dir_path=str(tmp_path / "induction"))
    assert len(ds_test) > 0


def test_indexed_dataset_and_transforms():
    ds = CircleDataset(p=3, im_size=16, radius=6)
    wrapped = IndexedDataset(ds)
    img, label, idx = wrapped[2]
    assert idx == 2
    t = get_clip_val_transforms(image_size=32)
    out = t(np.random.rand(1, 16, 16).astype(np.float32))
    assert out.shape == (3, 32, 32)
    assert out.dtype == np.float32


def test_zero_shot_pipeline():
    # Text encoder: tiny HookedTextTransformer; tokenizer: toy hashing
    tcfg = TextTransformerConfig(
        n_layers=2, d_model=16, d_head=4, n_heads=4, d_mlp=32, n_classes=8,
        vocab_size=64, context_length=8, return_type="class_logits",
        normalize_output=False)
    text_model = HookedTextTransformer(tcfg, key=jax.random.PRNGKey(0))

    def tokenizer(texts):
        out = np.zeros((len(texts), 8), np.int32)
        for i, t in enumerate(texts):
            for j, ch in enumerate(t[:7]):
                out[i, j] = (ord(ch) % 62) + 1
            out[i, min(len(t), 7)] = 63  # EOT = max id
        return out

    classifier = zero_shot_classifier(text_model, tokenizer,
                                      ["cat", "dog", "fish"],
                                      templates=("a photo of a {c}.",
                                                 "a drawing of a {c}."))
    assert classifier.shape == (8, 3)
    np.testing.assert_allclose(np.asarray(jnp.linalg.norm(classifier, axis=0)),
                               np.ones(3), atol=1e-5)

    # vision model emitting 8-dim embeddings
    vcfg = ViTConfig(n_layers=1, d_model=16, d_head=4, n_heads=4, d_mlp=32,
                     patch_size=4, image_size=8, n_classes=8,
                     return_type="class_logits")
    vmodel = HookedViT(vcfg, key=jax.random.PRNGKey(1))
    images = np.random.default_rng(0).normal(size=(12, 3, 8, 8)).astype(np.float32)
    labels = np.random.default_rng(1).integers(0, 3, size=(12,))
    top1, top5 = run(vmodel, classifier, [(images, labels)])
    assert 0.0 <= top1 <= top5 <= 1.0

    results = zero_shot_eval(vmodel, {"imagenet-val": [(images, labels)]},
                             pretrained_classifier=classifier)
    assert "imagenet-zeroshot-val-top1" in results

    # intervened eval runs
    zero_hook = lambda v, h: jnp.zeros_like(v)
    top1_abl, _ = run(vmodel, classifier, [(images, labels)],
                      fwd_hooks=[("blocks.0.hook_mlp_out", zero_hook)])
    assert 0.0 <= top1_abl <= 1.0


def test_accuracy_topk():
    logits = jnp.asarray([[0.1, 0.9, 0.0], [0.8, 0.1, 0.1]])
    target = jnp.asarray([1, 2])
    acc1, acc2 = accuracy(logits, target, topk=(1, 2))
    assert acc1 == 1.0  # only first correct at top-1
    assert acc2 == 1.0  # second not in top-2 either? logits row2: top2 = [0,1]
    # recompute expectations precisely:
    # row0: pred order [1,0,2] -> top1 hit; row1: order [0,1,2] -> target 2 miss both
    # so counts: top1=1, top2=1


def test_logit_lens():
    cfg = ViTConfig(n_layers=2, d_model=16, d_head=4, n_heads=4, d_mlp=32,
                    patch_size=4, image_size=8, n_classes=5,
                    return_type="logits")
    model = HookedViT(cfg, key=jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 3, 8, 8))
    _, cache = model.run_with_cache(x)
    directions, labels = get_patch_logit_directions(cache, model.W_H.T)
    n_layers_plus1 = cfg.n_layers + 1
    assert directions.shape == (2, cfg.n_tokens, n_layers_plus1, 5)
    assert labels[-1] == "final_post"
    d = get_patch_logit_dictionary(directions, batch_idx=0,
                                   class_names=["a", "b", "c", "d", "e"])
    assert len(d) == cfg.n_tokens
    assert len(d[0]) == n_layers_plus1
    logit, name, idx = d[0][0]
    assert name in "abcde" and 0 <= idx < 5
