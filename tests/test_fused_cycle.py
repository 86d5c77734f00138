"""Fused steady-state cycle (harvest + mix + K train steps in one XLA
program, train.py make_fused_cycle): must serve the EXACT row stream and
produce the same training trajectory as the multi-dispatch
``next_batches``/``train_steps`` path.

Counterpart of the loop it replaces: reference train_sae.py:772-861 +
activations_store.py:445-503 (eager refill-then-train)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vit_prisma_tpu.configs.vit_config import ViTConfig
from vit_prisma_tpu.models.vit import HookedViT
from vit_prisma_tpu.sae import SAERunnerConfig
from vit_prisma_tpu.sae.store import VisionActivationsStore
from vit_prisma_tpu.sae.train import SAESweepTrainer, VisionSAETrainer


def _model():
    vcfg = ViTConfig(n_layers=2, d_model=16, d_head=4, n_heads=4,
                     d_mlp=32, patch_size=8, image_size=16, n_classes=8,
                     return_type="class_logits")
    return HookedViT(vcfg, key=jax.random.PRNGKey(0))


def _imgs(n=24):
    return np.random.default_rng(0).normal(size=(n, 3, 16, 16)) \
        .astype(np.float32)


def _run_pair(cfg, trainer_cls, n_cycles=3):
    """(reference trajectory, fused-cycle trajectory) for one config."""
    model = _model()
    K = (cfg.buffer_tokens_override // 2) // cfg.train_batch_size

    ref_store = VisionActivationsStore(cfg, model, _imgs(), prefetch=False,
                                       device_dataset=True)
    ref = trainer_cls(cfg, model=model, store=ref_store)
    for _ in range(1 + n_cycles):
        ref.train_steps(ref_store.next_batches(K))

    fus_store = VisionActivationsStore(cfg, model, _imgs(), prefetch=False,
                                       device_dataset=True)
    fus = trainer_cls(cfg, model=model, store=fus_store)
    fus.train_steps(fus_store.next_batches(K))  # serve the initial buffer
    metrics = fus.train_cycles(n_cycles)
    return ref, fus, metrics


def _assert_same(ref, fus):
    assert ref._host_step == fus._host_step
    for k in ref.state.params:
        np.testing.assert_allclose(
            np.asarray(ref.state.params[k], np.float32),
            np.asarray(fus.state.params[k], np.float32),
            rtol=1e-6, atol=1e-7, err_msg=k)
    np.testing.assert_allclose(np.asarray(ref.store.buffer, np.float32),
                               np.asarray(fus.store.buffer, np.float32),
                               rtol=1e-6, atol=1e-7)
    np.testing.assert_array_equal(np.asarray(ref.state.step),
                                  np.asarray(fus.state.step))


def test_fused_cycle_matches_multidispatch_sweep():
    cfg = SAERunnerConfig(
        d_in=16, expansion_factor=2, sweep_layers=(0, 1),
        layer_subtype="hook_resid_post", context_size=5,
        store_batch_size=8, n_batches_in_buffer=2,
        buffer_tokens_override=128, train_batch_size=32,
        steps_per_dispatch=2, lr=1e-3, lr_scheduler_name="constant",
        b_dec_init_method="zeros", log_to_wandb=False)
    ref, fus, metrics = _run_pair(cfg, SAESweepTrainer)
    _assert_same(ref, fus)
    assert metrics.loss.shape[0] == 2  # K steps per cycle, stacked


def test_fused_cycle_matches_multidispatch_single():
    cfg = SAERunnerConfig(
        d_in=16, expansion_factor=2, hook_point_layer=1,
        layer_subtype="hook_resid_post", context_size=5,
        store_batch_size=8, n_batches_in_buffer=2,
        buffer_tokens_override=128, train_batch_size=32,
        steps_per_dispatch=2, lr=1e-3, lr_scheduler_name="constant",
        b_dec_init_method="zeros", log_to_wandb=False)
    ref, fus, _ = _run_pair(cfg, VisionSAETrainer)
    _assert_same(ref, fus)


def test_fused_cycle_requires_resident_store():
    from vit_prisma_tpu.sae.train import make_fused_cycle
    cfg = SAERunnerConfig(
        d_in=16, expansion_factor=2, hook_point_layer=1, context_size=5,
        store_batch_size=8, n_batches_in_buffer=2,
        buffer_tokens_override=128, train_batch_size=32,
        b_dec_init_method="zeros", log_to_wandb=False)
    store = VisionActivationsStore(cfg, _model(), _imgs(),
                                   device_dataset=False, prefetch=False)
    with pytest.raises(AssertionError, match="device-resident"):
        make_fused_cycle(cfg, store)


def test_fused_cycle_after_normal_batches_keeps_stream():
    """Interleaving: normal next_batches after train_cycles still refills
    correctly (ptr bookkeeping) and keeps drawing from the same image
    stream."""
    cfg = SAERunnerConfig(
        d_in=16, expansion_factor=2, hook_point_layer=1, context_size=5,
        store_batch_size=8, n_batches_in_buffer=2,
        buffer_tokens_override=128, train_batch_size=32,
        steps_per_dispatch=2, lr=1e-3, lr_scheduler_name="constant",
        b_dec_init_method="zeros", log_to_wandb=False)
    model = _model()
    store = VisionActivationsStore(cfg, model, _imgs(), prefetch=False,
                                   device_dataset=True)
    tr = VisionSAETrainer(cfg, model=model, store=store)
    K = 2
    tr.train_steps(store.next_batches(K))
    tr.train_cycles(2)
    assert store.ptr == store.buffer.shape[0] // 2
    b = store.next_batches(K)  # triggers a normal refill
    assert b.shape == (K, 32, 16)


# ---------------------------------------------------------------------------
# Device-side augmentation (store augment=, applied inside the jitted
# harvest; the reference augments on the host via torchvision transforms)
# ---------------------------------------------------------------------------


def _noise_aug(key, images):
    return images + 0.1 * jax.random.normal(key, images.shape,
                                            images.dtype)


def _aug_cfg(**kw):
    base = dict(
        d_in=16, expansion_factor=2, hook_point_layer=1,
        layer_subtype="hook_resid_post", context_size=5,
        store_batch_size=8, n_batches_in_buffer=2,
        buffer_tokens_override=128, train_batch_size=32,
        steps_per_dispatch=2, lr=1e-3, lr_scheduler_name="constant",
        b_dec_init_method="zeros", log_to_wandb=False)
    base.update(kw)
    return SAERunnerConfig(**base)


def test_identity_augment_is_a_noop():
    cfg = _aug_cfg()
    model = _model()
    plain = VisionActivationsStore(cfg, model, _imgs(), prefetch=False,
                                   device_dataset=True)
    ident = VisionActivationsStore(cfg, model, _imgs(), prefetch=False,
                                   device_dataset=True,
                                   augment=lambda k, im: im)
    np.testing.assert_allclose(np.asarray(plain.next_batch()),
                               np.asarray(ident.next_batch()),
                               rtol=1e-6, atol=1e-7)


def test_augment_changes_rows_deterministically():
    cfg = _aug_cfg()
    model = _model()
    a1 = VisionActivationsStore(cfg, model, _imgs(), prefetch=False,
                                device_dataset=True, augment=_noise_aug)
    a2 = VisionActivationsStore(cfg, model, _imgs(), prefetch=False,
                                device_dataset=True, augment=_noise_aug)
    plain = VisionActivationsStore(cfg, model, _imgs(), prefetch=False,
                                   device_dataset=True)
    b1, b2, bp = a1.next_batch(), a2.next_batch(), plain.next_batch()
    np.testing.assert_array_equal(np.asarray(b1), np.asarray(b2))
    assert np.abs(np.asarray(b1) - np.asarray(bp)).max() > 1e-4
    # the mix-key stream is unshifted: same buffer permutation semantics
    assert a1.ptr == plain.ptr


def test_fused_cycle_matches_multidispatch_with_augment():
    """The fused cycle consumes the SAME augmentation-key stream as the
    stepwise path: identical trajectories with noise augmentation on."""
    cfg = _aug_cfg()
    model = _model()
    K = (cfg.buffer_tokens_override // 2) // cfg.train_batch_size

    ref_store = VisionActivationsStore(cfg, model, _imgs(), prefetch=False,
                                       device_dataset=True,
                                       augment=_noise_aug)
    ref = VisionSAETrainer(cfg, model=model, store=ref_store)
    for _ in range(1 + 3):
        ref.train_steps(ref_store.next_batches(K))

    fus_store = VisionActivationsStore(cfg, model, _imgs(), prefetch=False,
                                       device_dataset=True,
                                       augment=_noise_aug)
    fus = VisionSAETrainer(cfg, model=model, store=fus_store)
    fus.train_steps(fus_store.next_batches(K))
    fus.train_cycles(3)
    _assert_same(ref, fus)
