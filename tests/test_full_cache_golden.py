"""Hermetic end-to-end golden: frozen source checkpoint -> converter ->
full-cache forward, gated against committed fixtures with NO oracle import.

The tier-2 equivalence tests (test_loading.py, test_equivalence_vit.py)
catch numerics regressions only when the torch reference at
/root/reference is importable; this gate is self-contained — a frozen
CLIP-format source state dict + a deterministic input live in
tests/fixtures/, and the test asserts (1) the converted flat dict is
bit-identical (sha256) and (2) every ``run_with_cache`` entry's summary
statistics are unchanged at fp32/HIGHEST.  Red under any converter or
forward-op numerics change (reference workflow:
tests/models/test_loading_all_models.py:98).

On first run (fixtures absent) it generates them via transformers'
CLIPModel and skips; committed fixtures make later runs hermetic.
"""

import hashlib
import json
import os

import numpy as np
import pytest

import jax.numpy as jnp

from vit_prisma_tpu import HookedViT, ViTConfig
from vit_prisma_tpu.models.loading.loader import load_hooked_model

HERE = os.path.dirname(__file__)
SRC_NPZ = os.path.join(HERE, "fixtures", "full_cache_golden_src.npz")
GOLDEN = os.path.join(HERE, "fixtures", "full_cache_golden.json")

CFG = dict(n_layers=2, d_model=32, d_head=8, n_heads=4, d_mlp=64,
           patch_size=4, image_size=16, n_classes=20,
           activation_name="quick_gelu", layer_norm_pre=True, eps=1e-5,
           return_type="class_logits", normalize_output=False,
           model_name="openai/clip-test")


def _input_image():
    # deterministic, RNG-free input (exact across platforms/versions)
    n = 2 * 3 * 16 * 16
    return np.linspace(-2.0, 2.0, n, dtype=np.float32).reshape(2, 3, 16, 16)


def _flat_sha(flat):
    h = hashlib.sha256()
    for k in sorted(flat):
        h.update(k.encode())
        h.update(np.ascontiguousarray(
            np.asarray(flat[k], np.float32)).tobytes())
    return h.hexdigest()


def _entry_stats(arr):
    a = np.asarray(arr, np.float64).ravel()
    picks = [0, len(a) // 3, (2 * len(a)) // 3, len(a) - 1]
    return {
        "shape": list(np.asarray(arr).shape),
        "mean": float(a.mean()),
        "std": float(a.std()),
        "absmax": float(np.abs(a).max()),
        "picks": [float(a[i]) for i in picks],
    }


def _generate_source():
    """Freeze a TinyCLIP-shaped source checkpoint (torch seed 0, same
    geometry as test_loading.small_clip_model's vision tower)."""
    import torch
    from transformers import (CLIPConfig, CLIPModel, CLIPTextConfig,
                              CLIPVisionConfig)
    torch.manual_seed(0)
    vision = CLIPVisionConfig(hidden_size=32, intermediate_size=64,
                              num_hidden_layers=2, num_attention_heads=4,
                              image_size=16, patch_size=4, projection_dim=20,
                              hidden_act="quick_gelu")
    text = CLIPTextConfig(hidden_size=24, intermediate_size=48,
                          num_hidden_layers=2, num_attention_heads=4,
                          vocab_size=100, max_position_embeddings=12,
                          projection_dim=20, hidden_act="quick_gelu",
                          eos_token_id=99, bos_token_id=98)
    clip = CLIPModel(CLIPConfig(text_config=text.to_dict(),
                                vision_config=vision.to_dict(),
                                projection_dim=20))
    sd = {k: v.detach().cpu().float().numpy()
          for k, v in clip.state_dict().items()}
    np.savez(SRC_NPZ, **sd)


def test_full_cache_golden():
    if not os.path.exists(SRC_NPZ):
        _generate_source()
    src = np.load(SRC_NPZ)
    state_dict = {k: src[k] for k in src.files}

    cfg = ViTConfig(**CFG)
    model = load_hooked_model("openai/clip-test", cfg=cfg,
                              state_dict=state_dict)
    from vit_prisma_tpu.models.loading.state_dict import unstack_params
    flat = unstack_params(model.params, cfg)

    out, cache = model.run_with_cache(jnp.asarray(_input_image()))
    record = {
        "converted_sha256": _flat_sha(flat),
        "out_head": [round(float(v), 6)
                     for v in np.asarray(out, np.float64)[0, :8]],
        "cache": {name: _entry_stats(cache[name])
                  for name in sorted(cache.keys())},
    }

    if not os.path.exists(GOLDEN):
        with open(GOLDEN, "w") as f:
            json.dump(record, f, indent=1)
        pytest.skip("golden fixture generated; rerun to verify")

    with open(GOLDEN) as f:
        golden = json.load(f)
    assert record["converted_sha256"] == golden["converted_sha256"], \
        "converted state dict drifted from the committed golden"
    assert set(record["cache"]) == set(golden["cache"]), \
        "cache hook-name set changed"
    np.testing.assert_allclose(record["out_head"], golden["out_head"],
                               atol=2e-5)
    for name, g in golden["cache"].items():
        r = record["cache"][name]
        assert r["shape"] == g["shape"], name
        scale = max(abs(g["absmax"]), 1.0)
        for field in ("mean", "std", "absmax"):
            assert abs(r[field] - g[field]) <= 2e-5 * scale, \
                f"{name}.{field}: {r[field]} vs golden {g[field]}"
        np.testing.assert_allclose(r["picks"], g["picks"],
                                   atol=2e-5 * scale, err_msg=name)
