"""Native C++ image pipeline: build, JPEG parity, resize parity, batch."""

import io

import numpy as np
import pytest

from vit_prisma_tpu.dataloaders.native import (
    decode_and_preprocess,
    decode_jpeg,
    make_native_transform,
    native_available,
    preprocess_batch,
    preprocess_rgb,
)
from vit_prisma_tpu.dataloaders.transforms import CLIP_MEAN, CLIP_STD, make_transform

pytestmark = pytest.mark.skipif(not native_available(),
                                reason="native toolchain unavailable")


@pytest.fixture(scope="module")
def img():
    return np.random.default_rng(0).integers(
        0, 256, size=(300, 400, 3), dtype=np.uint8)


def test_jpeg_decode_matches_pil(img):
    from PIL import Image
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, "JPEG", quality=95)
    data = buf.getvalue()
    ours = decode_jpeg(data)
    pil = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
    assert np.array_equal(ours, pil)


def test_preprocess_close_to_pil(img):
    ours = preprocess_rgb(img, 224)
    pil = make_transform(224, CLIP_MEAN, CLIP_STD)(img)
    assert ours.shape == (3, 224, 224)
    # PIL rounds the intermediate pass to uint8; we keep float32 — allow a
    # small tolerance (≈1 uint8 step after normalization).
    assert np.abs(ours - pil).mean() < 0.02
    assert np.abs(ours - pil).max() < 0.5


def test_fused_decode_preprocess(img):
    from PIL import Image
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, "JPEG", quality=95)
    chw = decode_and_preprocess(buf.getvalue(), 128)
    assert chw.shape == (3, 128, 128) and chw.dtype == np.float32


def test_batch_matches_single(img):
    batch = np.stack([img, img[::-1].copy()])
    out = preprocess_batch(batch, 96)
    single0 = preprocess_rgb(batch[0], 96)
    np.testing.assert_allclose(out[0], single0, atol=1e-6)
    assert out.shape == (2, 3, 96, 96)


def test_grayscale_broadcast():
    g = np.random.default_rng(1).integers(0, 256, size=(64, 64), dtype=np.uint8)
    out = preprocess_rgb(g, 32)
    assert out.shape == (3, 32, 32)
    # all three channels identical pre-normalization differences only from
    # per-channel mean/std
    denorm = out * np.asarray(CLIP_STD).reshape(3, 1, 1) + \
        np.asarray(CLIP_MEAN).reshape(3, 1, 1)
    np.testing.assert_allclose(denorm[0], denorm[1], atol=1e-6)


def test_native_transform_callable(img):
    t = make_native_transform(64)
    out = t(img)
    assert out.shape == (3, 64, 64)
    # CHW float input also accepted
    out2 = t(np.transpose(img, (2, 0, 1)).astype(np.float32) / 255.0)
    np.testing.assert_allclose(out, out2, atol=2e-2)
