"""Round-2 parity additions: dropout, vendored ImageNet tables, CIFAR
utils, test_prompt, and the CLS-less l0 split."""

import io
import contextlib
import os
import pickle

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vit_prisma_tpu import HookedViT, ViTConfig
from vit_prisma_tpu import test_prompt as prisma_test_prompt
from vit_prisma_tpu.dataloaders import (
    CIFAR10_CLASSES, get_cifar_transform, load_cifar_10,
    load_imagenet_dict, load_imagenet_emoji,
)
from vit_prisma_tpu.models.vit import vit_forward


def tiny_cfg(**kw):
    base = dict(n_layers=2, d_model=32, d_head=8, n_heads=4, d_mlp=64,
                patch_size=8, image_size=32, n_classes=10,
                activation_name="gelu", return_type="logits")
    base.update(kw)
    return ViTConfig(**base)


# ---------------------------------------------------------------------------
# Dropout (reference transformer_block.py:113,132)
# ---------------------------------------------------------------------------

class TestDropout:
    def test_eval_mode_unchanged_by_dropout_config(self):
        """With no key, a dropout>0 config must produce the exact same
        program/output as the dropout=0 config (nn.Dropout eval mode)."""
        cfg0 = tiny_cfg()
        cfg1 = tiny_cfg(attn_dropout_rate=0.3, mlp_dropout_rate=0.3)
        model = HookedViT(cfg0, key=jax.random.PRNGKey(0))
        x = jax.random.uniform(jax.random.PRNGKey(1), (2, 3, 32, 32))
        out0 = vit_forward(model.params, cfg0, x)
        out1 = vit_forward(model.params, cfg1, x)
        np.testing.assert_array_equal(np.asarray(out0), np.asarray(out1))

    def test_train_mode_applies_dropout(self):
        """With a key, outputs differ between keys and dropout actually
        zeroes ~rate of attn_out elements."""
        cfg = tiny_cfg(attn_dropout_rate=0.5, mlp_dropout_rate=0.0)
        model = HookedViT(cfg, key=jax.random.PRNGKey(0))
        x = jax.random.uniform(jax.random.PRNGKey(1), (2, 3, 32, 32))
        out_a = model(x, dropout_key=jax.random.PRNGKey(2))
        out_b = model(x, dropout_key=jax.random.PRNGKey(3))
        out_eval = model(x)
        assert not np.allclose(np.asarray(out_a), np.asarray(out_b))
        assert not np.allclose(np.asarray(out_a), np.asarray(out_eval))

    def test_dropout_statistics(self):
        """hook_attn_out in train mode has ~rate zeros and preserves the
        mean (inverted dropout)."""
        from vit_prisma_tpu.prisma.hooks import HookRuntime
        cfg = tiny_cfg(attn_dropout_rate=0.25)
        model = HookedViT(cfg, key=jax.random.PRNGKey(0))
        x = jax.random.uniform(jax.random.PRNGKey(1), (8, 3, 32, 32))
        name = "blocks.0.hook_attn_out"
        rt_train = HookRuntime(names_filter=name)
        vit_forward(model.params, cfg, x, rt_train,
                    dropout_key=jax.random.PRNGKey(7))
        dropped = np.asarray(rt_train.cache[name])
        rt_eval = HookRuntime(names_filter=name)
        vit_forward(model.params, cfg, x, rt_eval)
        clean = np.asarray(rt_eval.cache[name])

        frac_zero = (dropped == 0).mean()
        assert 0.2 < frac_zero < 0.3, frac_zero
        # surviving values are scaled by 1/(1-rate)
        mask = dropped != 0
        np.testing.assert_allclose(dropped[mask], clean[mask] / 0.75,
                                   rtol=1e-5)

    def test_bert_block_ignores_dropout(self):
        """Reference BertBlock has no dropout sites."""
        cfg = tiny_cfg(use_bert_block=True, attn_dropout_rate=0.9,
                       mlp_dropout_rate=0.9)
        model = HookedViT(cfg, key=jax.random.PRNGKey(0))
        x = jax.random.uniform(jax.random.PRNGKey(1), (2, 3, 32, 32))
        out_train = vit_forward(model.params, cfg, x,
                                dropout_key=jax.random.PRNGKey(2))
        out_eval = vit_forward(model.params, cfg, x)
        np.testing.assert_array_equal(np.asarray(out_train),
                                      np.asarray(out_eval))

    def test_trainer_threads_dropout(self):
        """The supervised train step runs (and differs) under dropout."""
        import optax
        from vit_prisma_tpu.training.trainer import (TrainState,
                                                     make_train_step)
        cfg = tiny_cfg(attn_dropout_rate=0.5, mlp_dropout_rate=0.5)
        model = HookedViT(cfg, key=jax.random.PRNGKey(0))
        opt = optax.sgd(0.0)  # lr 0: params unchanged, loss pure readout
        state = TrainState(model.params, opt.init(model.params),
                           jnp.zeros((), jnp.int32))
        step = make_train_step(cfg, opt, "CrossEntropy", seed=0)
        x = jax.random.uniform(jax.random.PRNGKey(1), (4, 3, 32, 32))
        y = jnp.zeros((4,), jnp.int32)
        state, loss0 = step(state, x, y)
        state, loss1 = step(state, x, y)  # same params, new step -> new mask
        assert float(loss0) != float(loss1)


# ---------------------------------------------------------------------------
# Vendored ImageNet tables (reference imagenet_dict.py / imagenet_emoji.py)
# ---------------------------------------------------------------------------

class TestImageNetTables:
    def test_dict_is_real_offline(self):
        d = load_imagenet_dict()
        assert len(d) == 1000
        assert d[0].startswith("tench")
        assert "tabby" in d[281]
        assert not any(str(v).startswith("class_") for v in d.values())

    def test_emoji_table(self):
        e = load_imagenet_emoji()
        assert len(e) == 1000
        assert all(isinstance(v, str) and v for v in e.values())

    def test_test_prompt_prints_topk(self):
        cfg = tiny_cfg(n_classes=1000)
        model = HookedViT(cfg, key=jax.random.PRNGKey(0))
        x = jax.random.uniform(jax.random.PRNGKey(1), (3, 32, 32))
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            prisma_test_prompt(x, model, example_answer="tench", top_k=3)
        out = buf.getvalue()
        assert out.count("Top ") == 3
        assert "Rank of the correct answer" in out
        assert "ImageNet Index: 0" in out


# ---------------------------------------------------------------------------
# CIFAR-10 utils (reference cifar_10_utils.py:81)
# ---------------------------------------------------------------------------

def _write_fake_cifar(root):
    os.makedirs(root, exist_ok=True)
    rng = np.random.default_rng(0)
    for name, n in [("data_batch_1", 20), ("data_batch_2", 20),
                    ("data_batch_3", 20), ("data_batch_4", 20),
                    ("data_batch_5", 20), ("test_batch", 10)]:
        blob = {b"data": rng.integers(0, 255, (n, 3072), np.uint8),
                b"labels": rng.integers(0, 10, n).tolist()}
        with open(os.path.join(root, name), "wb") as f:
            pickle.dump(blob, f)


class TestCIFAR:
    def test_load_and_split(self, tmp_path):
        root = str(tmp_path / "cifar-10-batches-py")
        _write_fake_cifar(root)
        train, val, test = load_cifar_10(str(tmp_path), split_size=0.8,
                                         image_size=64)
        assert len(train) == 80 and len(val) == 20 and len(test) == 10
        img, label = train[0]
        assert img.shape == (3, 64, 64)
        assert img.dtype == np.float32
        assert 0 <= label < 10
        assert 0.0 <= img.min() and img.max() <= 1.0

    def test_transform_shapes_and_augmentation(self):
        tf_plain = get_cifar_transform(False, image_size=128)
        tf_aug = get_cifar_transform(True, image_size=128, seed=1)
        batch = np.random.default_rng(0).integers(
            0, 255, (4, 3, 32, 32), np.uint8)
        a = tf_plain(batch)
        b = tf_aug(batch)
        assert a.shape == b.shape == (4, 3, 128, 128)
        assert not np.allclose(a, b)
        assert len(CIFAR10_CLASSES) == 10

    def test_identity_resize(self):
        tf = get_cifar_transform(False, image_size=32)
        batch = np.random.default_rng(0).integers(
            0, 255, (2, 3, 32, 32), np.uint8)
        np.testing.assert_allclose(tf(batch),
                                   batch.astype(np.float32) / 255.0)


# ---------------------------------------------------------------------------
# l0 split without a CLS token (sae/evals.py)
# ---------------------------------------------------------------------------

class TestL0SplitNoCLS:
    def test_no_cls_token_uses_all_tokens_as_patches(self):
        from vit_prisma_tpu.sae.config import SAERunnerConfig
        from vit_prisma_tpu.sae.evals import make_eval_step
        from vit_prisma_tpu.sae.sae import SparseAutoencoder

        vcfg = tiny_cfg(use_cls_token=False, return_type="pre_logits",
                        classification_type="gaap")
        model = HookedViT(vcfg, key=jax.random.PRNGKey(0))
        scfg = SAERunnerConfig(
            d_in=32, expansion_factor=2, hook_point_layer=1,
            context_size=vcfg.n_tokens)
        sae = SparseAutoencoder(scfg)
        step = make_eval_step(model, sae)
        x = jax.random.uniform(jax.random.PRNGKey(1), (2, 3, 32, 32))
        labels = jnp.zeros((2,), jnp.int32)
        class_emb = jnp.eye(10, vcfg.d_model)
        s = step(model.params, sae.params, x, labels, class_emb)
        # without a CLS token, "cls" and patch L0 are the same mean
        np.testing.assert_allclose(np.asarray(s.l0_cls),
                                   np.asarray(s.l0_patches), rtol=1e-6)
