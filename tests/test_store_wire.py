"""Activation-store wire formats: uint8 / bf16 image transfer + on-device
normalization must reproduce the float32 host pipeline's activations.

TPU-native input-pipeline design (SURVEY §7 'Input pipeline'): the reference
normalizes on host (torchvision) and ships float32; here the store can ship
raw uint8 (4x less H2D traffic) and fold scale+normalize into the harvest
program, or bf16 pixels for bf16 models (2x less, identical activations).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vit_prisma_tpu.configs.vit_config import ViTConfig
from vit_prisma_tpu.models.vit import HookedViT
from vit_prisma_tpu.sae import SAERunnerConfig
from vit_prisma_tpu.sae.store import VisionActivationsStore

MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)


def _model(dtype="float32"):
    vcfg = ViTConfig(n_layers=2, d_model=16, d_head=4, n_heads=4,
                     d_mlp=32, patch_size=8, image_size=16, n_classes=8,
                     return_type="class_logits", dtype=dtype)
    model = HookedViT(vcfg, key=jax.random.PRNGKey(0))
    if dtype == "bfloat16":
        model.params = jax.tree.map(lambda a: a.astype(jnp.bfloat16),
                                    model.params)
    return model


def _cfg(**kw):
    base = dict(d_in=16, expansion_factor=2, hook_point_layer=1,
                context_size=5, store_batch_size=8, n_batches_in_buffer=2,
                buffer_tokens_override=128, train_batch_size=32,
                b_dec_init_method="zeros", log_to_wandb=False)
    base.update(kw)
    return SAERunnerConfig(**base)


def test_uint8_wire_matches_host_normalized_f32():
    """uint8 dataset + device_norm == host-side (x/255 - mean)/std f32."""
    rng = np.random.default_rng(0)
    raw = rng.integers(0, 256, size=(16, 3, 16, 16), dtype=np.uint8)
    host_norm = ((raw.astype(np.float32) / 255.0
                  - MEAN[None, :, None, None]) / STD[None, :, None, None])

    model = _model()
    a = VisionActivationsStore(_cfg(store_wire_dtype="uint8"), model, raw,
                               device_norm=(MEAN, STD))
    b = VisionActivationsStore(_cfg(store_wire_dtype="float32"), model,
                               host_norm)
    np.testing.assert_allclose(np.asarray(a.buffer), np.asarray(b.buffer),
                               rtol=1e-5, atol=1e-5)


def test_auto_picks_uint8_for_uint8_dataset():
    raw = np.zeros((16, 3, 16, 16), np.uint8)
    store = VisionActivationsStore(_cfg(), _model(), raw,
                                   device_norm=(MEAN, STD))
    assert store._wire_dtype == np.uint8


def test_bf16_wire_identical_for_bf16_model():
    """bf16 models: bf16 pixels on the wire give bit-identical activations
    (the embed GEMM computes in bf16 either way)."""
    rng = np.random.default_rng(1)
    imgs = rng.normal(size=(16, 3, 16, 16)).astype(np.float32)
    model = _model("bfloat16")

    auto = VisionActivationsStore(_cfg(), model, imgs)
    import ml_dtypes
    assert auto._wire_dtype == ml_dtypes.bfloat16

    f32 = VisionActivationsStore(_cfg(store_wire_dtype="float32"), model,
                                 imgs)
    np.testing.assert_array_equal(
        np.asarray(auto.buffer.astype(jnp.float32)),
        np.asarray(f32.buffer.astype(jnp.float32)))


def test_prefetch_off_matches_on():
    """prefetch only changes WHEN the fill is dispatched, never the rows."""
    imgs = np.random.default_rng(2).normal(size=(16, 3, 16, 16)) \
        .astype(np.float32)
    model = _model()
    on = VisionActivationsStore(_cfg(), model, imgs, prefetch=True)
    off = VisionActivationsStore(_cfg(), model, imgs, prefetch=False)
    for _ in range(5):  # crosses refills
        np.testing.assert_array_equal(np.asarray(on.next_batch()),
                                      np.asarray(off.next_batch()))


def test_uint8_wire_resolves_model_norm_stats():
    """uint8 wire without device_norm normalizes with the MODEL's stats
    (get_model_transform_params) on device — not raw /255 pixels."""
    raw = np.random.default_rng(3).integers(0, 256, size=(16, 3, 16, 16),
                                            dtype=np.uint8)
    model = _model()
    store = VisionActivationsStore(_cfg(store_wire_dtype="uint8"), model, raw)
    assert store.device_norm is not None  # auto-resolved (CLIP stats here)
    np.testing.assert_allclose(np.asarray(store.device_norm[0]), MEAN)

    explicit = VisionActivationsStore(_cfg(store_wire_dtype="uint8"), model,
                                      raw, device_norm=(MEAN, STD))
    np.testing.assert_allclose(np.asarray(store.buffer),
                               np.asarray(explicit.buffer))


def test_uint8_wire_rejects_float_dataset():
    imgs = np.random.default_rng(4).normal(size=(16, 3, 16, 16)) \
        .astype(np.float32)
    with pytest.raises(ValueError, match="uint8"):
        VisionActivationsStore(_cfg(store_wire_dtype="uint8"), _model(), imgs)


def test_small_dataset_raises_instead_of_hanging():
    imgs = np.random.default_rng(5).normal(size=(4, 3, 16, 16)) \
        .astype(np.float32)
    with pytest.raises(ValueError, match="at least one full batch"):
        VisionActivationsStore(_cfg(store_batch_size=8), _model(), imgs)


def test_uint8_dataset_rejects_float_wire():
    raw = np.zeros((16, 3, 16, 16), np.uint8)
    with pytest.raises(ValueError, match="raw-pixel"):
        VisionActivationsStore(_cfg(store_wire_dtype="bfloat16"), _model(),
                               raw)


def test_device_dataset_matches_host_stream():
    """The device-resident dataset path (upload once, gather per refill)
    serves the exact same buffer and batch stream as the host path —
    _index_iterator is the shared source of image order."""
    imgs = np.random.default_rng(6).normal(size=(16, 3, 16, 16)) \
        .astype(np.float32)
    model = _model()
    dev = VisionActivationsStore(_cfg(), model, imgs, device_dataset=True)
    host = VisionActivationsStore(_cfg(), model, imgs, device_dataset=False)
    assert dev._dev_images is not None and host._dev_images is None
    np.testing.assert_array_equal(np.asarray(dev.buffer),
                                  np.asarray(host.buffer))
    for _ in range(5):  # crosses refills
        np.testing.assert_array_equal(np.asarray(dev.next_batch()),
                                      np.asarray(host.next_batch()))


def test_device_dataset_auto_on_small_ndarray():
    imgs = np.random.default_rng(7).normal(size=(16, 3, 16, 16)) \
        .astype(np.float32)
    store = VisionActivationsStore(_cfg(), _model(), imgs)
    assert store._dev_images is not None


def test_device_dataset_rejects_iterator():
    def batches():
        while True:
            yield np.zeros((8, 3, 16, 16), np.float32)
    with pytest.raises(ValueError, match="indexable ndarray"):
        VisionActivationsStore(_cfg(), _model(), batches(),
                               device_dataset=True)


def test_device_dataset_uint8_wire_normalizes():
    """Device-resident + uint8 wire: pixels stay uint8 in HBM; the harvest
    still normalizes with the model stats."""
    raw = np.random.default_rng(8).integers(0, 256, size=(16, 3, 16, 16),
                                            dtype=np.uint8)
    model = _model()
    dev = VisionActivationsStore(_cfg(store_wire_dtype="uint8"), model, raw,
                                 device_norm=(MEAN, STD), device_dataset=True)
    assert dev._dev_images.dtype == jnp.uint8
    host_norm = ((raw.astype(np.float32) / 255.0
                  - MEAN[None, :, None, None]) / STD[None, :, None, None])
    f32 = VisionActivationsStore(_cfg(store_wire_dtype="float32"), model,
                                 host_norm, device_dataset=False)
    np.testing.assert_allclose(np.asarray(dev.buffer),
                               np.asarray(f32.buffer), rtol=1e-5, atol=1e-5)
