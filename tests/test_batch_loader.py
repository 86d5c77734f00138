"""Native async batch loader (csrc/batch_loader.cpp + NativeBatchLoader).

The C++ worker-pool counterpart of the reference's
``DataLoader(num_workers=...)`` store feed (activations_store.py:226-249):
every delivered image must equal the synchronous per-image pipeline's
output, epochs must be disjoint permutations, the uint8-wire mode must
carry resized pixels, the Python fallback must behave identically, and a
loader must drive ``VisionActivationsStore`` end-to-end.
"""

import os

import numpy as np
import pytest

import vit_prisma_tpu.dataloaders.native as native
from vit_prisma_tpu.dataloaders.native import (
    NativeBatchLoader,
    decode_and_preprocess,
)

N_IMG, BATCH, SIZE = 12, 4, 32


@pytest.fixture(scope="module")
def jpeg_dir(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("jpegs")
    from PIL import Image
    rng = np.random.default_rng(0)
    paths = []
    for i in range(N_IMG):
        arr = rng.integers(0, 256, size=(40 + i, 50, 3), dtype=np.uint8)
        p = os.path.join(tmp, f"img_{i}.jpg")
        Image.fromarray(arr).save(p, quality=95)
        paths.append(p)
    refs = {}
    for p in paths:
        with open(p, "rb") as f:
            refs[p] = decode_and_preprocess(f.read(), SIZE)
    return paths, refs


def _match(img, refs, atol=1e-5):
    for i, r in enumerate(refs.values()):
        if np.allclose(img, r, atol=atol):
            return i
    return None


def test_loader_delivers_pipeline_outputs(jpeg_dir):
    # n_workers=1: ordered delivery, so exact epoch coverage is assertable
    # (with >1 workers an epoch-2 batch may be DELIVERED before epoch 1
    # finishes — sampling is still per-epoch exact, delivery is not)
    paths, refs = jpeg_dir
    ld = NativeBatchLoader(paths, batch_size=BATCH, out_size=SIZE,
                           n_workers=1, seed=7)
    try:
        seen = set()
        for _ in range(N_IMG // BATCH):  # one epoch
            batch = next(ld)
            assert batch.shape == (BATCH, 3, SIZE, SIZE)
            assert batch.dtype == np.float32
            for img in batch:
                idx = _match(img, refs)
                assert idx is not None, "image not from the pipeline"
                assert idx not in seen, "duplicate within epoch"
                seen.add(idx)
        assert len(seen) == N_IMG  # full epoch coverage (drop_last exact)
    finally:
        ld.close()


def test_loader_multiworker_membership(jpeg_dir):
    """With 2 workers every delivered image is still a pipeline output
    (delivery order itself is unordered by design)."""
    paths, refs = jpeg_dir
    ld = NativeBatchLoader(paths, batch_size=BATCH, out_size=SIZE,
                           n_workers=2, seed=7)
    try:
        for _ in range(4):
            for img in next(ld):
                assert _match(img, refs) is not None
        assert ld.decode_failures() == 0
    finally:
        ld.close()
    import pytest as _pytest
    with _pytest.raises(RuntimeError, match="closed"):
        next(ld)


def test_uint8_wire_mode(jpeg_dir):
    paths, refs = jpeg_dir
    from vit_prisma_tpu.dataloaders.transforms import CLIP_MEAN, CLIP_STD
    m = np.asarray(CLIP_MEAN, np.float32)[:, None, None]
    s = np.asarray(CLIP_STD, np.float32)[:, None, None]
    px_refs = {p: np.clip((r * s + m) * 255.0 + 0.5, 0, 255).astype(np.uint8)
               for p, r in refs.items()}
    ld = NativeBatchLoader(paths, batch_size=BATCH, out_size=SIZE,
                           n_workers=2, seed=3, uint8_wire=True)
    try:
        batch = next(ld)
        assert batch.dtype == np.uint8
        for img in batch:
            assert any(np.abs(px.astype(int) - img.astype(int)).max() <= 1
                       for px in px_refs.values())
    finally:
        ld.close()


def test_python_fallback_matches(jpeg_dir, monkeypatch):
    paths, refs = jpeg_dir
    if native.get_lib() is None:
        pytest.skip("native lib unavailable; fallback is the default path")
    monkeypatch.setattr(native, "get_lib", lambda: None)
    ld = NativeBatchLoader(paths, batch_size=BATCH, out_size=SIZE, seed=5)
    try:
        assert ld._handle is None  # really the fallback
        batch = next(ld)
        assert batch.shape == (BATCH, 3, SIZE, SIZE)
        for img in batch:
            # PIL decode differs from libjpeg by a few ULP of IDCT
            assert _match(img, refs, atol=0.2) is not None
    finally:
        ld.close()


def test_store_consumes_loader(jpeg_dir):
    paths, _ = jpeg_dir
    import jax
    from vit_prisma_tpu import HookedViT, ViTConfig
    from vit_prisma_tpu.sae import SAERunnerConfig
    from vit_prisma_tpu.sae.store import VisionActivationsStore

    vcfg = ViTConfig(n_layers=2, d_model=16, d_head=4, n_heads=4, d_mlp=32,
                     patch_size=8, image_size=SIZE, n_classes=8,
                     return_type="class_logits")
    model = HookedViT(vcfg, key=jax.random.PRNGKey(0))
    scfg = SAERunnerConfig(d_in=16, expansion_factor=2, hook_point_layer=1,
                           context_size=vcfg.n_tokens, store_batch_size=BATCH,
                           n_batches_in_buffer=2, buffer_tokens_override=128,
                           train_batch_size=32, b_dec_init_method="zeros",
                           log_to_wandb=False)
    ld = NativeBatchLoader(paths, batch_size=BATCH, out_size=SIZE, seed=1)
    try:
        store = VisionActivationsStore(scfg, model, ld)
        b = store.next_batch()
        assert b.shape == (32, 16)
        assert np.isfinite(np.asarray(b, np.float32)).all()
    finally:
        ld.close()


def test_load_dataset_native_loader(tmp_path):
    """cfg.use_native_loader routes the imagenet1k train feed through the
    C++ loader while val stays an indexed (img, label) dataset."""
    from PIL import Image
    rng = np.random.default_rng(1)
    for cls in ("cat", "dog"):
        d = tmp_path / cls
        d.mkdir()
        for i in range(3):
            arr = rng.integers(0, 256, size=(36, 36, 3), dtype=np.uint8)
            Image.fromarray(arr).save(d / f"{i}.jpg")

    from vit_prisma_tpu.sae import SAERunnerConfig, VisionSAETrainer
    cfg = SAERunnerConfig(dataset_name="imagenet1k",
                          dataset_path=str(tmp_path), image_size=SIZE,
                          store_batch_size=2, use_native_loader=True,
                          d_in=16, expansion_factor=2, context_size=5,
                          log_to_wandb=False)
    train, val = VisionSAETrainer.load_dataset(cfg)
    assert hasattr(train, "__next__")
    batch = next(train)
    assert batch.shape == (2, 3, SIZE, SIZE)
    train.close()
    img, label = val[0]
    assert np.asarray(img).shape[0] == 3 and isinstance(label, int)
