"""Video transformers (tubelet embedding, ViViT/V-JEPA conversion),
head-index SAE support, and the cached activation store."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vit_prisma_tpu import HookedViT, ViTConfig
from vit_prisma_tpu.models.loading import convert as C
from vit_prisma_tpu.models.loading.state_dict import stack_params
from vit_prisma_tpu.sae import CachedActivationsStore, SAERunnerConfig, SparseAutoencoder, VisionActivationsStore

from tests.reference_oracle import load_reference

VIDEO_CFG = ViTConfig(n_layers=2, d_model=16, d_head=4, n_heads=4, d_mlp=32,
                      patch_size=4, image_size=8, n_classes=5,
                      is_video_transformer=True, video_tubelet_depth=2,
                      video_num_frames=4, return_type="logits")


def test_video_forward_matches_reference():
    """Tubelet-embedding video model vs the reference HookedViT with
    TubeletEmbedding (Conv3d)."""
    import torch
    load_reference()
    from vit_prisma.models.base_vit import HookedViT as RefViT
    from vit_prisma.configs.HookedViTConfig import HookedViTConfig as RefCfg
    torch.manual_seed(0)
    ref = RefViT(RefCfg(
        n_layers=2, d_model=16, d_head=4, d_mlp=32, n_heads=4,
        patch_size=4, image_size=8, n_classes=5, is_video_transformer=True,
        video_tubelet_depth=2, video_num_frames=4, return_type="logits"))
    ref.eval()
    flat = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    model = HookedViT(VIDEO_CFG, params=stack_params(flat, VIDEO_CFG))

    torch.manual_seed(1)
    x = torch.randn(2, 3, 4, 8, 8)  # [B, C, T, H, W]
    with torch.no_grad():
        out_ref = ref(x)
    out = model(jnp.asarray(x.numpy()))
    np.testing.assert_allclose(np.asarray(out), out_ref.numpy(), atol=1e-4)
    assert VIDEO_CFG.n_tokens == 2 * 4 + 1  # (T/D)*(H/P)*(W/P) + cls


def test_vivit_converter_shapes():
    import torch
    torch.manual_seed(2)
    cfg = VIDEO_CFG
    T = cfg.n_tokens
    sd = {"vivit.embeddings.cls_token": torch.randn(1, 1, 16),
          "vivit.embeddings.position_embeddings": torch.randn(1, T, 16),
          "vivit.embeddings.patch_embeddings.projection.weight":
              torch.randn(16, 3, 2, 4, 4),
          "vivit.embeddings.patch_embeddings.projection.bias": torch.randn(16),
          "vivit.layernorm.weight": torch.randn(16),
          "vivit.layernorm.bias": torch.randn(16),
          "classifier.weight": torch.randn(5, 16),
          "classifier.bias": torch.randn(5)}
    for l in range(2):
        k = f"vivit.encoder.layer.{l}"
        sd.update({
            f"{k}.layernorm_before.weight": torch.randn(16),
            f"{k}.layernorm_before.bias": torch.randn(16),
            f"{k}.layernorm_after.weight": torch.randn(16),
            f"{k}.layernorm_after.bias": torch.randn(16),
            f"{k}.attention.attention.query.weight": torch.randn(16, 16),
            f"{k}.attention.attention.query.bias": torch.randn(16),
            f"{k}.attention.attention.key.weight": torch.randn(16, 16),
            f"{k}.attention.attention.key.bias": torch.randn(16),
            f"{k}.attention.attention.value.weight": torch.randn(16, 16),
            f"{k}.attention.attention.value.bias": torch.randn(16),
            f"{k}.attention.output.dense.weight": torch.randn(16, 16),
            f"{k}.attention.output.dense.bias": torch.randn(16),
            f"{k}.intermediate.dense.weight": torch.randn(32, 16),
            f"{k}.intermediate.dense.bias": torch.randn(32),
            f"{k}.output.dense.weight": torch.randn(16, 32),
            f"{k}.output.dense.bias": torch.randn(16)})
    flat = C.convert_vivit_weights(sd, cfg)
    model = HookedViT(cfg, params=stack_params(flat, cfg))
    out = model(jnp.zeros((1, 3, 4, 8, 8)))
    assert out.shape == (1, 5)
    # conv3d kernel flattened consistently with tubelet patchify order
    np.testing.assert_allclose(
        np.asarray(model.params["embed"]["W"]),
        sd["vivit.embeddings.patch_embeddings.projection.weight"]
        .reshape(16, -1).T.numpy(), atol=1e-6)


def test_vjepa_converter_no_cls():
    import torch
    torch.manual_seed(3)
    cfg = VIDEO_CFG.replace(use_cls_token=False, classification_type="gaap")
    T = cfg.n_tokens
    sd = {"encoder.backbone.pos_embed": torch.randn(1, T, 16),
          "encoder.backbone.patch_embed.proj.weight": torch.randn(16, 3, 2, 4, 4),
          "encoder.backbone.patch_embed.proj.bias": torch.randn(16),
          "encoder.backbone.norm.weight": torch.randn(16),
          "encoder.backbone.norm.bias": torch.randn(16)}
    for l in range(2):
        k = f"encoder.backbone.blocks.{l}"
        sd.update({
            f"{k}.norm1.weight": torch.randn(16), f"{k}.norm1.bias": torch.randn(16),
            f"{k}.norm2.weight": torch.randn(16), f"{k}.norm2.bias": torch.randn(16),
            f"{k}.attn.qkv.weight": torch.randn(48, 16),
            f"{k}.attn.qkv.bias": torch.randn(48),
            f"{k}.attn.proj.weight": torch.randn(16, 16),
            f"{k}.attn.proj.bias": torch.randn(16),
            f"{k}.mlp.fc1.weight": torch.randn(32, 16),
            f"{k}.mlp.fc1.bias": torch.randn(32),
            f"{k}.mlp.fc2.weight": torch.randn(16, 32),
            f"{k}.mlp.fc2.bias": torch.randn(16)})
    flat = C.convert_vjepa_weights(sd, cfg)
    model = HookedViT(cfg, params=stack_params(flat, cfg))
    out = model(jnp.zeros((1, 3, 4, 8, 8)))
    assert out.shape == (1, 5)


def test_head_index_sae_store_and_replacement():
    """hook_point_head_index: store slices one head; replacement hook edits
    only that head (sae.py:245-273, activations_store.py:251-296)."""
    vcfg = ViTConfig(n_layers=2, d_model=16, d_head=4, n_heads=4, d_mlp=32,
                     patch_size=4, image_size=8, n_classes=5,
                     return_type="logits")
    model = HookedViT(vcfg, key=jax.random.PRNGKey(0))
    cfg = SAERunnerConfig(d_in=4, expansion_factor=4, hook_point_layer=1,
                          layer_subtype="attn.hook_z", hook_point_head_index=2,
                          context_size=vcfg.n_tokens, store_batch_size=4,
                          n_batches_in_buffer=2, train_batch_size=20,
                          b_dec_init_method="zeros", log_to_wandb=False)
    images = np.random.default_rng(0).normal(size=(16, 3, 8, 8)).astype(np.float32)
    store = VisionActivationsStore(cfg, model, images)
    batch = store.next_batch()
    assert batch.shape == (20, 4)  # d_head rows for head 2

    sae = SparseAutoencoder(cfg, key=jax.random.PRNGKey(1))
    from vit_prisma_tpu.sae.evals import make_replacement_hook
    repl = make_replacement_hook(sae)
    x = jnp.asarray(images[:2])
    _, clean = model.run_with_cache(x, names_filter="blocks.1.attn.hook_z",
                                    return_cache_object=False)
    _, edited = model.run_with_cache(
        x, names_filter="blocks.1.attn.hook_z",
        fwd_hooks=[("blocks.1.attn.hook_z", repl)], return_cache_object=False)
    z_clean = np.asarray(clean["blocks.1.attn.hook_z"])
    z_edit = np.asarray(edited["blocks.1.attn.hook_z"])
    # other heads untouched, head 2 modified
    np.testing.assert_allclose(z_edit[:, :, [0, 1, 3]], z_clean[:, :, [0, 1, 3]],
                               atol=1e-6)
    assert not np.allclose(z_edit[:, :, 2], z_clean[:, :, 2])


def test_cached_activations_store(tmp_path):
    vcfg = ViTConfig(n_layers=2, d_model=16, d_head=4, n_heads=4, d_mlp=32,
                     patch_size=4, image_size=8, n_classes=5,
                     return_type="logits")
    model = HookedViT(vcfg, key=jax.random.PRNGKey(0))
    cfg = SAERunnerConfig(d_in=16, expansion_factor=2, hook_point_layer=1,
                          layer_subtype="hook_resid_post",
                          context_size=vcfg.n_tokens, store_batch_size=8,
                          n_batches_in_buffer=2, train_batch_size=40,
                          b_dec_init_method="zeros", log_to_wandb=False,
                          cached_activations_path=str(tmp_path))
    images = np.random.default_rng(0).normal(size=(32, 3, 8, 8)).astype(np.float32)
    live = VisionActivationsStore(cfg, model, images)
    n_shards = live.generate_cached_activations(str(tmp_path), n_tokens=2000,
                                                tokens_per_file=600)
    assert n_shards == 4
    cached = CachedActivationsStore(cfg)
    batch = cached.next_batch()
    assert batch.shape == (40, 16)
    # shards are fp16 on disk
    shard = np.load(tmp_path / "0.npy")
    assert shard.dtype == np.float16
