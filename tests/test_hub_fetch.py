"""Hub-fetch branch of the loader, exercised with mocked downloads.

``load_hooked_model`` with neither ``state_dict=`` nor ``checkpoint_path=``
takes the network path (loader.py ``_fetch_from_hub``, parity with reference
``model_loader.py:750-855``).  This environment has zero egress, so the hub
calls are monkeypatched to return locally-built synthetic models — the test
covers the dispatch, unwrapping, and error paths that real downloads would
take.
"""

import numpy as np
import pytest

import jax.numpy as jnp

import torch

from vit_prisma_tpu import ViTConfig
from vit_prisma_tpu.models.loading.loader import load_hooked_model

from tests.test_loading import small_clip_model


def _clip_cfg():
    return ViTConfig(n_layers=2, d_model=32, d_head=8, n_heads=4, d_mlp=64,
                     patch_size=4, image_size=16, n_classes=20,
                     activation_name="quick_gelu", layer_norm_pre=True,
                     eps=1e-5, return_type="class_logits",
                     normalize_output=False, model_name="openai/clip-test")


def test_clip_hub_fetch_matches_state_dict_path(monkeypatch):
    clip = small_clip_model()
    calls = []

    def fake_from_pretrained(name, *a, **k):
        calls.append(name)
        return clip

    monkeypatch.setattr("transformers.CLIPModel.from_pretrained",
                        staticmethod(fake_from_pretrained))
    cfg = _clip_cfg()
    hub_model = load_hooked_model("openai/clip-test", cfg=cfg)
    assert calls == ["openai/clip-test"]
    sd_model = load_hooked_model("openai/clip-test", cfg=cfg,
                                 state_dict=clip.state_dict())
    x = jnp.asarray(np.random.default_rng(0).normal(
        size=(2, 3, 16, 16)).astype(np.float32))
    np.testing.assert_allclose(np.asarray(hub_model(x)),
                               np.asarray(sd_model(x)), atol=1e-6)


def test_open_clip_hub_fetch_downloads_checkpoint(monkeypatch, tmp_path):
    # synthetic open_clip checkpoint (key patterns from the published bins)
    torch.manual_seed(8)
    T = (16 // 4) ** 2 + 1
    sd = {"visual.class_embedding": torch.randn(16),
          "visual.positional_embedding": torch.randn(T, 16),
          "visual.conv1.weight": torch.randn(16, 3, 4, 4),
          "visual.ln_pre.weight": torch.randn(16),
          "visual.ln_pre.bias": torch.randn(16),
          "visual.ln_post.weight": torch.randn(16),
          "visual.ln_post.bias": torch.randn(16),
          "visual.proj": torch.randn(16, 8)}
    for l in range(2):
        k = f"visual.transformer.resblocks.{l}"
        sd.update({
            f"{k}.ln_1.weight": torch.randn(16), f"{k}.ln_1.bias": torch.randn(16),
            f"{k}.ln_2.weight": torch.randn(16), f"{k}.ln_2.bias": torch.randn(16),
            f"{k}.attn.in_proj_weight": torch.randn(48, 16),
            f"{k}.attn.in_proj_bias": torch.randn(48),
            f"{k}.attn.out_proj.weight": torch.randn(16, 16),
            f"{k}.attn.out_proj.bias": torch.randn(16),
            f"{k}.mlp.c_fc.weight": torch.randn(32, 16),
            f"{k}.mlp.c_fc.bias": torch.randn(32),
            f"{k}.mlp.c_proj.weight": torch.randn(16, 32),
            f"{k}.mlp.c_proj.bias": torch.randn(16)})
    path = tmp_path / "open_clip_pytorch_model.bin"
    torch.save(sd, str(path))

    asked = []

    def fake_download(repo, filename, *a, **k):
        asked.append((repo, filename))
        return str(path)

    monkeypatch.setattr("huggingface_hub.hf_hub_download", fake_download)
    cfg = ViTConfig(n_layers=2, d_model=16, d_head=4, n_heads=4, d_mlp=32,
                    patch_size=4, image_size=16, n_classes=8,
                    activation_name="gelu", layer_norm_pre=True,
                    eps=1e-5, return_type="class_logits",
                    normalize_output=False,
                    model_name="open-clip:laion/CLIP-test")
    model = load_hooked_model("open-clip:laion/CLIP-test", cfg=cfg,
                              allow_failing=True)
    # the hub prefix is stripped before the repo-id download
    assert asked == [("laion/CLIP-test", "open_clip_pytorch_model.bin")]
    sd_model = load_hooked_model("open-clip:laion/CLIP-test", cfg=cfg,
                                 state_dict=sd, allow_failing=True)
    x = jnp.asarray(np.random.default_rng(1).normal(
        size=(2, 3, 16, 16)).astype(np.float32))
    np.testing.assert_allclose(np.asarray(model(x)),
                               np.asarray(sd_model(x)), atol=1e-6)


def test_hub_fetch_failure_gives_actionable_error(monkeypatch):
    def boom(name, *a, **k):
        raise OSError("offline")

    monkeypatch.setattr("transformers.CLIPModel.from_pretrained",
                        staticmethod(boom))
    with pytest.raises(RuntimeError, match="state_dict.*checkpoint_path"):
        load_hooked_model("openai/clip-test", cfg=_clip_cfg())
