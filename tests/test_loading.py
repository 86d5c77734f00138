"""Weight-conversion and loader integration tests.

Tier-2 pattern from the reference
(/root/reference/tests/models/test_loading_all_models.py): load the *original*
implementation (HF CLIPModel / ViTModel / ViTForImageClassification,
instantiated locally with random weights — no network) and our converted
HookedViT from the same weights, feed identical input, assert closeness.

For formats whose source libraries aren't installed (timm, open_clip), we
build synthetic state dicts with the right key patterns and check our
converters give the same flat dict as the reference's converters (oracle)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vit_prisma_tpu import HookedViT, ViTConfig
from vit_prisma_tpu.configs.vit_config import TextTransformerConfig
from vit_prisma_tpu.models.loading import convert as C
from vit_prisma_tpu.models.loading.loader import load_hooked_model
from vit_prisma_tpu.models.loading.registry import (
    get_model_config,
    open_clip_vision_config,
    parse_open_clip_name,
)

from tests.reference_oracle import load_reference

ATOL = 1e-4


def small_clip_model():
    import torch
    from transformers import CLIPConfig, CLIPModel, CLIPTextConfig, CLIPVisionConfig
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
    clip.eval()
    return clip


def test_hf_clip_vision_matches_original():
    import torch
    clip = small_clip_model()
    cfg = ViTConfig(n_layers=2, d_model=32, d_head=8, n_heads=4, d_mlp=64,
                    patch_size=4, image_size=16, n_classes=20,
                    activation_name="quick_gelu", layer_norm_pre=True,
                    eps=1e-5, return_type="class_logits",
                    normalize_output=False, model_name="openai/clip-test")
    model = load_hooked_model("openai/clip-test", cfg=cfg,
                              state_dict=clip.state_dict())
    torch.manual_seed(1)
    x = torch.randn(2, 3, 16, 16)
    with torch.no_grad():
        feats = clip.get_image_features(pixel_values=x)
    ours = model(jnp.asarray(x.numpy()))
    np.testing.assert_allclose(np.asarray(ours), feats.numpy(), atol=ATOL)


def test_hf_clip_text_matches_original():
    import torch
    clip = small_clip_model()
    cfg = TextTransformerConfig(
        n_layers=2, d_model=24, d_head=6, n_heads=4, d_mlp=48,
        n_classes=20, vocab_size=100, context_length=12,
        activation_name="quick_gelu", eps=1e-5,
        return_type="class_logits", normalize_output=False,
        causal_attention=True, model_name="openai/clip-test")
    model = load_hooked_model("openai/clip-test", model_type="text", cfg=cfg,
                              state_dict=clip.state_dict())
    torch.manual_seed(2)
    # tokens where the *last* position holds the max id (EOT=99)
    toks = torch.randint(1, 98, (3, 12))
    toks[:, -1] = 99
    with torch.no_grad():
        feats = clip.get_text_features(input_ids=toks)
    ours = model(jnp.asarray(toks.numpy()))
    np.testing.assert_allclose(np.asarray(ours), feats.numpy(), atol=ATOL)


def test_hf_vit_classifier_matches_original():
    import torch
    from transformers import ViTConfig as HFViTConfig
    from transformers import ViTForImageClassification
    torch.manual_seed(3)
    hf = ViTForImageClassification(HFViTConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=4, image_size=16, patch_size=4, num_labels=7))
    hf.eval()
    cfg = ViTConfig(n_layers=2, d_model=32, d_head=8, n_heads=4, d_mlp=64,
                    patch_size=4, image_size=16, n_classes=7,
                    activation_name="gelu", eps=1e-12,
                    return_type="class_logits", model_name="google/vit-test")
    model = load_hooked_model("google/vit-test", cfg=cfg,
                              state_dict=hf.state_dict())
    torch.manual_seed(4)
    x = torch.randn(2, 3, 16, 16)
    with torch.no_grad():
        logits = hf(pixel_values=x).logits
    ours = model(jnp.asarray(x.numpy()))
    np.testing.assert_allclose(np.asarray(ours), logits.numpy(), atol=ATOL)


def test_dino_vitmodel_matches_original():
    import torch
    from transformers import ViTConfig as HFViTConfig
    from transformers import ViTModel
    torch.manual_seed(5)
    hf = ViTModel(HFViTConfig(hidden_size=32, intermediate_size=64,
                              num_hidden_layers=2, num_attention_heads=4,
                              image_size=16, patch_size=4),
                  add_pooling_layer=False)
    hf.eval()
    cfg = ViTConfig(n_layers=2, d_model=32, d_head=8, n_heads=4, d_mlp=64,
                    patch_size=4, image_size=16, n_classes=32,
                    activation_name="gelu", eps=1e-12,
                    return_type="pre_logits", model_name="facebook/dino-test")
    model = load_hooked_model("facebook/dino-test", cfg=cfg,
                              state_dict=hf.state_dict())
    torch.manual_seed(6)
    x = torch.randn(2, 3, 16, 16)
    with torch.no_grad():
        hidden = hf(pixel_values=x).last_hidden_state
    _, cache = model.run_with_cache(jnp.asarray(x.numpy()),
                                    names_filter="hook_ln_final",
                                    return_cache_object=False)
    np.testing.assert_allclose(np.asarray(cache["hook_ln_final"]),
                               hidden.numpy(), atol=ATOL)


def _ref_cfg(n_layers=2, d_model=16, d_head=4, n_heads=4, d_mlp=32,
             patch=4, image=16, n_classes=8):
    load_reference()
    from vit_prisma.configs.HookedViTConfig import HookedViTConfig as RefCfg
    return RefCfg(n_layers=n_layers, d_model=d_model, d_head=d_head,
                  d_mlp=d_mlp, n_heads=n_heads, patch_size=patch,
                  image_size=image, n_classes=n_classes)


def _diff_flat(ours, ref_flat, atol=1e-6):
    assert set(ours) == set(k for k in ref_flat), (
        f"key sets differ: only-ours={set(ours)-set(ref_flat)}, "
        f"only-ref={set(ref_flat)-set(ours)}")
    for k, v in ref_flat.items():
        np.testing.assert_allclose(np.asarray(ours[k]), np.asarray(v),
                                   atol=atol, err_msg=f"mismatch at {k}")


def test_timm_converter_matches_reference_converter():
    import torch
    load_reference()
    from vit_prisma.models.weight_conversion import convert_timm_weights as ref_conv
    torch.manual_seed(7)
    rcfg = _ref_cfg()
    jcfg = ViTConfig(n_layers=2, d_model=16, d_head=4, n_heads=4, d_mlp=32,
                    patch_size=4, image_size=16, n_classes=8)
    T = (16 // 4) ** 2 + 1
    sd = {"cls_token": torch.randn(1, 1, 16),
          "pos_embed": torch.randn(1, T, 16),
          "patch_embed.proj.weight": torch.randn(16, 3, 4, 4),
          "patch_embed.proj.bias": torch.randn(16),
          "norm.weight": torch.randn(16), "norm.bias": torch.randn(16),
          "head.weight": torch.randn(8, 16), "head.bias": torch.randn(8)}
    for l in range(2):
        sd.update({
            f"blocks.{l}.norm1.weight": torch.randn(16),
            f"blocks.{l}.norm1.bias": torch.randn(16),
            f"blocks.{l}.norm2.weight": torch.randn(16),
            f"blocks.{l}.norm2.bias": torch.randn(16),
            f"blocks.{l}.attn.qkv.weight": torch.randn(48, 16),
            f"blocks.{l}.attn.qkv.bias": torch.randn(48),
            f"blocks.{l}.attn.proj.weight": torch.randn(16, 16),
            f"blocks.{l}.attn.proj.bias": torch.randn(16),
            f"blocks.{l}.mlp.fc1.weight": torch.randn(32, 16),
            f"blocks.{l}.mlp.fc1.bias": torch.randn(32),
            f"blocks.{l}.mlp.fc2.weight": torch.randn(16, 32),
            f"blocks.{l}.mlp.fc2.bias": torch.randn(16)})
    ref_flat = {k: v.numpy() for k, v in ref_conv(sd, rcfg).items()}
    ours = C.convert_timm_weights(sd, jcfg)
    _diff_flat(ours, ref_flat)


def test_open_clip_converter_matches_reference_converter():
    import torch
    load_reference()
    from vit_prisma.models.weight_conversion import convert_open_clip_weights as ref_conv
    torch.manual_seed(8)
    rcfg = _ref_cfg()
    jcfg = ViTConfig(n_layers=2, d_model=16, d_head=4, n_heads=4, d_mlp=32,
                     patch_size=4, image_size=16, n_classes=8,
                     layer_norm_pre=True)
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
    rcfg.n_classes = 8
    ref_flat = {k: v.numpy() for k, v in ref_conv(sd, rcfg).items()}
    ours = C.convert_open_clip_weights(sd, jcfg)
    _diff_flat(ours, ref_flat)


def test_registry_name_parsing():
    assert parse_open_clip_name(
        "open-clip:laion/CLIP-ViT-B-32-DataComp.XL-s13B-b90K") == ("B", 32, 224)
    assert parse_open_clip_name(
        "open-clip:laion/CLIP-ViT-L-14-laion2B-s32B-b82K") == ("L", 14, 224)
    cfg = open_clip_vision_config(
        "open-clip:laion/CLIP-ViT-B-32-DataComp.XL-s13B-b90K")
    assert (cfg.d_model, cfg.n_layers, cfg.n_heads, cfg.patch_size) == (768, 12, 12, 32)
    assert cfg.n_classes == 512 and cfg.layer_norm_pre

    cfg = get_model_config("openai/clip-vit-base-patch32")
    assert cfg.activation_name == "quick_gelu" and cfg.patch_size == 32
    tcfg = get_model_config("openai/clip-vit-base-patch32", model_type="text")
    assert tcfg.vocab_size == 49408 and tcfg.context_length == 77


def test_verified_model_lists_resolve():
    from vit_prisma_tpu.models.loading.registry import (
        FAILING_MODELS, PASSING_MODELS, check_model_name)
    for name in PASSING_MODELS:
        cfg = get_model_config(name)
        assert cfg.d_model > 0 and cfg.d_model % cfg.n_heads == 0, name
        check_model_name(name)  # no raise
    bad = next(iter(FAILING_MODELS))
    with pytest.raises(ValueError):
        check_model_name(bad)
    check_model_name(bad, allow_failing=True)  # allowed explicitly

    # spot-check well-known geometries
    c = get_model_config("open-clip:laion/CLIP-ViT-H-14-laion2B-s32B-b79K")
    assert (c.d_model, c.n_layers, c.n_heads) == (1280, 32, 16)
    c = get_model_config("open-clip:laion/CLIP-ViT-bigG-14-laion2B-39B-b160k")
    assert (c.d_model, c.n_layers, c.n_heads) == (1664, 48, 16)
    c = get_model_config("open-clip:timm/vit_base_patch32_clip_224.laion2b_e16")
    assert (c.d_model, c.patch_size) == (768, 32)
