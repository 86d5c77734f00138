"""Round-2 ecosystem parity: EVA02/override registry entries, Kandinsky
converter + adapter, HF hub helpers."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vit_prisma_tpu import ViTConfig
from vit_prisma_tpu.models.loading import convert as C
from vit_prisma_tpu.models.loading.registry import (MODEL_CONFIGS,
                                                    get_model_config)


class TestRegistryLongTail:
    def test_eva02_entries_resolve(self):
        cfg = get_model_config(
            "open-clip:timm/eva02_enormous_patch14_clip_224.laion2b_s4b_b115k")
        assert cfg.d_model == 1792 and cfg.n_layers == 40
        assert cfg.d_mlp == 7168 and cfg.n_heads == 16
        cfg = get_model_config(
            "open-clip:timm/eva02_base_patch16_clip_224.merged2b_s8b_b131k")
        assert cfg.d_model == 768 and cfg.eps == 1e-6

    def test_per_checkpoint_overrides(self):
        cfg = get_model_config(
            "open-clip:timm/vit_medium_patch32_clip_224.tinyclip_laion400m")
        assert (cfg.d_model, cfg.n_layers, cfg.n_heads, cfg.d_mlp) == \
            (640, 16, 10, 2560)
        cfg = get_model_config(
            "open-clip:timm/vit_xsmall_patch16_clip_224.tinyclip_yfcc15m")
        assert cfg.n_layers == 8 and cfg.n_classes == 384
        cfg = get_model_config(
            "open-clip:timm/vit_gigantic_patch14_clip_224.metaclip_2pt5b")
        assert cfg.d_model == 1920 and cfg.n_heads == 24
        cfg = get_model_config("google/vivit-l-16x2-kinetics400")
        assert cfg.d_model == 1024 and cfg.is_video_transformer

    def test_reference_eps_overrides(self):
        assert get_model_config("openai/clip-vit-base-patch32").eps == 1e-6
        assert get_model_config("facebook/dino-vits8").eps == 1e-6

    def test_all_entries_construct(self):
        for name in MODEL_CONFIGS:
            cfg = get_model_config(name)
            assert cfg.d_model % cfg.n_heads == 0 or cfg.d_head is not None


class TestKandinskyConverter:
    def test_matches_reference_converter(self):
        import torch
        from tests.reference_oracle import load_reference
        load_reference()
        from vit_prisma.models.weight_conversion import (
            convert_kandinsky_clip_weights as ref_conv)
        torch.manual_seed(11)
        from tests.test_loading import _ref_cfg
        rcfg = _ref_cfg()
        jcfg = ViTConfig(n_layers=2, d_model=16, d_head=4, n_heads=4,
                         d_mlp=32, patch_size=4, image_size=16, n_classes=8,
                         layer_norm_pre=True)
        T = (16 // 4) ** 2 + 1
        sd = {
            "vision_model.embeddings.class_embedding": torch.randn(16),
            "vision_model.embeddings.position_embedding.weight":
                torch.randn(T, 16),
            "vision_model.embeddings.patch_embedding.weight":
                torch.randn(16, 3, 4, 4),
            "vision_model.post_layernorm.weight": torch.randn(16),
            "vision_model.post_layernorm.bias": torch.randn(16),
            "vision_model.pre_layrnorm.weight": torch.randn(16),
            "vision_model.pre_layrnorm.bias": torch.randn(16),
            "visual_projection.weight": torch.randn(8, 16),
        }
        for l in range(2):
            k = f"vision_model.encoder.layers.{l}"
            sd.update({
                f"{k}.layer_norm1.weight": torch.randn(16),
                f"{k}.layer_norm1.bias": torch.randn(16),
                f"{k}.layer_norm2.weight": torch.randn(16),
                f"{k}.layer_norm2.bias": torch.randn(16),
                f"{k}.self_attn.q_proj.weight": torch.randn(16, 16),
                f"{k}.self_attn.q_proj.bias": torch.randn(16),
                f"{k}.self_attn.k_proj.weight": torch.randn(16, 16),
                f"{k}.self_attn.k_proj.bias": torch.randn(16),
                f"{k}.self_attn.v_proj.weight": torch.randn(16, 16),
                f"{k}.self_attn.v_proj.bias": torch.randn(16),
                f"{k}.self_attn.out_proj.weight": torch.randn(16, 16),
                f"{k}.self_attn.out_proj.bias": torch.randn(16),
                f"{k}.mlp.fc1.weight": torch.randn(32, 16),
                f"{k}.mlp.fc1.bias": torch.randn(32),
                f"{k}.mlp.fc2.weight": torch.randn(16, 32),
                f"{k}.mlp.fc2.bias": torch.randn(16),
            })
        ref_flat = {k: v.numpy() for k, v in
                    ref_conv(sd, rcfg, device="cpu").items()}
        ours = C.convert_kandinsky_clip_weights(sd, jcfg)
        from tests.test_loading import _diff_flat
        _diff_flat(ours, ref_flat)


class TestKandinskyAdapter:
    def test_adapter_learns_linear_map(self):
        from vit_prisma_tpu.sae import (DualEmbedder, adapter_forward,
                                        load_adapter, save_adapter,
                                        train_adapter)
        rng = np.random.default_rng(0)
        src = rng.normal(size=(512, 16)).astype(np.float32)
        W_true = rng.normal(size=(16, 24)).astype(np.float32)
        tgt = src @ W_true
        params, loss = train_adapter(src, tgt, num_epochs=60, batch_size=128,
                                     lr=3e-3, hidden_dim=64)
        base = float(np.mean(tgt ** 2))
        assert loss < 0.15 * base, (loss, base)
        # eval (no dropout) predicts well
        pred = adapter_forward(params, jnp.asarray(src[:8]))
        assert pred.shape == (8, 24)

    def test_adapter_save_load_roundtrip(self, tmp_path):
        from vit_prisma_tpu.sae import (adapter_forward, init_adapter_params,
                                        load_adapter, save_adapter)
        params = init_adapter_params(jax.random.PRNGKey(0), 8, 16, 4)
        p = str(tmp_path / "adapter")
        save_adapter(p, params)
        loaded = load_adapter(p)
        x = jnp.ones((2, 8))
        np.testing.assert_allclose(np.asarray(adapter_forward(params, x)),
                                   np.asarray(adapter_forward(loaded, x)))

    def test_dual_embedder(self):
        from vit_prisma_tpu.sae import DualEmbedder
        de = DualEmbedder(lambda im: im.mean(axis=(2, 3)),
                          lambda im: im.sum(axis=(2, 3)))
        src, tgt = de.build_dataset([np.ones((2, 3, 4, 4), np.float32)])
        assert src.shape == (2, 3) and tgt.shape == (2, 3)
        np.testing.assert_allclose(tgt, src * 16)


class TestHub:
    def test_local_path_shortcircuit(self, tmp_path):
        from vit_prisma_tpu.sae import SAERunnerConfig, load_remote_sae_and_model
        from vit_prisma_tpu.sae.sae import SparseAutoencoder
        from vit_prisma_tpu import HookedViT
        cfg = SAERunnerConfig(d_in=8, expansion_factor=2,
                              model_name="openai/clip-vit-base-patch32")
        sae = SparseAutoencoder(cfg)
        sae.save_model(str(tmp_path / "sae.npz"))
        vcfg = ViTConfig(n_layers=1, d_model=8, d_head=2, n_heads=4,
                         d_mlp=16, patch_size=4, image_size=8, n_classes=4)
        prebuilt = HookedViT(vcfg, key=jax.random.PRNGKey(0))
        loaded_sae, model = load_remote_sae_and_model(
            str(tmp_path), "sae.npz", model=prebuilt)
        assert loaded_sae.cfg.d_in == 8
        assert model is prebuilt

    def test_hub_functions_importable(self):
        from vit_prisma_tpu.sae import (download_sae_from_huggingface,
                                        upload_to_huggingface)
        assert callable(upload_to_huggingface)
        assert callable(download_sae_from_huggingface)


class TestSparsecoderEvalCompletion:
    def test_explained_variance_reported(self):
        from vit_prisma_tpu.sae import SAERunnerConfig
        from vit_prisma_tpu.sae.neuron_evals import SparsecoderEval
        from vit_prisma_tpu.sae.sae import SparseAutoencoder
        from vit_prisma_tpu import HookedViT

        vcfg = ViTConfig(n_layers=2, d_model=16, d_head=4, n_heads=4,
                         d_mlp=32, patch_size=4, image_size=8, n_classes=5,
                         return_type="logits")
        model = HookedViT(vcfg, key=jax.random.PRNGKey(0))
        scfg = SAERunnerConfig(d_in=16, expansion_factor=2,
                               hook_point_layer=1,
                               context_size=vcfg.n_tokens)
        sae = SparseAutoencoder(scfg)
        ev = SparsecoderEval(sae, model, np.eye(5, dtype=np.float32))

        def it():
            rng = np.random.default_rng(0)
            for _ in range(2):
                yield (rng.normal(size=(4, 3, 8, 8)).astype(np.float32),
                       rng.integers(0, 5, 4))

        out = ev.run(it)
        assert out["explained_variance"] is not None
        assert np.isfinite(out["explained_variance"])

    def test_load_dino_linear_classifier(self):
        from vit_prisma_tpu.sae.neuron_evals import load_dino_linear_classifier
        state = {"module.linear.weight": np.ones((1000, 1536), np.float32),
                 "module.linear.bias": np.zeros((1000,), np.float32)}
        W = load_dino_linear_classifier(state)
        assert W.shape == (1000, 1536)


class TestHubUploadLogic:
    def test_upload_flow_calls(self, tmp_path, monkeypatch):
        """upload_to_huggingface creates the repo, uploads README +
        checkpoint (sae_utils.py:40-79) — verified against a recording
        fake of HfApi (no network)."""
        calls = []

        class FakeApi:
            def create_repo(self, **kw):
                calls.append(("create_repo", kw["repo_id"], kw["exist_ok"]))

            def upload_file(self, **kw):
                calls.append(("upload_file", kw["path_in_repo"]))

        import huggingface_hub
        monkeypatch.setattr(huggingface_hub, "HfApi", FakeApi)
        from vit_prisma_tpu.sae import hub
        ckpt = tmp_path / "sae.npz"
        ckpt.write_bytes(b"fake")
        url = hub.upload_to_huggingface(str(ckpt), "org/repo",
                                        "my SAE", token=None)
        assert url == "https://huggingface.co/org/repo"
        assert calls[0] == ("create_repo", "org/repo", True)
        assert ("upload_file", "README.md") in calls
        assert ("upload_file", "sae.npz") in calls

    def test_upload_resolves_npz_suffix(self, tmp_path, monkeypatch):
        files = []

        class FakeApi:
            def create_repo(self, **kw):
                pass

            def upload_file(self, **kw):
                files.append(kw["path_or_fileobj"])

        import huggingface_hub
        monkeypatch.setattr(huggingface_hub, "HfApi", FakeApi)
        from vit_prisma_tpu.sae import hub
        (tmp_path / "sae.npz").write_bytes(b"fake")
        hub.upload_to_huggingface(str(tmp_path / "sae"), "org/repo", "d")
        assert any(str(f).endswith("sae.npz") for f in files)
