"""Registry diff test (VERDICT r2 item 5c): every explicit checkpoint-id key
of the reference registry (/root/reference/src/vit_prisma/models/
model_config_registry.py) must resolve HERE, and every field the reference's
override dict pins must match our resolved config — modulo a small,
documented deviation map for entries where the reference's table is
architecturally impossible or contradicts the checkpoint's true geometry.

The reference stores *overrides* (the rest comes from a live hub fetch);
this build is offline, so our registry stores full geometry.  Comparing the
override fields is exactly the portion of the reference table that is
testable without network access.
"""

import pytest

from vit_prisma_tpu.models.loading.registry import (
    MODEL_CONFIGS,
    TEXT_MODEL_CONFIGS,
    TEXT_SUPPORTED_MODELS,
    get_model_config,
    parse_open_clip_name,
)

from tests.reference_oracle import load_reference


@pytest.fixture(scope="module")
def ref_registry():
    load_reference()
    from vit_prisma.models import model_config_registry as reg
    return reg


# Fields in reference override dicts that map 1:1 onto our ViTConfig fields.
_COMPARABLE = (
    "d_model", "n_layers", "n_heads", "d_head", "d_mlp", "patch_size",
    "image_size", "n_classes", "eps", "layer_norm_pre", "normalization_type",
    "return_type", "normalize_output", "use_cls_token",
    "is_video_transformer", "video_tubelet_depth", "video_num_frames",
    "vocab_size", "context_length",
)

# (name, field) -> our value, where we deviate from the reference table ON
# PURPOSE.  Each entry documents why.
_DEVIATIONS = {
    # ViT-B-16-plus-240: OpenCLIP 'plus' geometry is width 896 / 14 heads;
    # the reference's e32 entry inherits the base-B override n_heads=12
    # (d_head would be a non-integer 896/12 — the checkpoint sits on the
    # reference's own failing list for this reason).
    ("open-clip:timm/vit_base_patch16_plus_clip_240.laion400m_e32",
     "n_heads"): 14,
    # ViViT-b on Kinetics-400 is a 32-frame model (HF config num_frames=32);
    # the reference override says 16.
    ("google/vivit-b-16x2-kinetics400", "video_num_frames"): 32,
}

# Text entries where the reference's BASE_TEXT_CONFIG (a 768-wide L-size
# tower) is applied to B-size checkpoints whose true text tower is
# 512-wide / 8-head (open_clip ViT-B-32/B-16 text geometry).  We resolve the
# true geometry; the comparison for these fields is skipped with the reason
# recorded here.
_TEXT_B_SIZE_FIELDS = {"d_model", "n_heads", "d_mlp", "n_classes", "d_head"}
# roberta towers: geometry is pinned explicitly in TEXT_MODEL_CONFIGS and
# DOES match the reference's entries, so they are not exempt.
_TEXT_EXEMPT = {
    name for name in (
        "open-clip:laion/CLIP-ViT-B-32-DataComp.XL-s13B-b90K",
        "open-clip:laion/CLIP-ViT-B-16-CommonPool.L-s1B-b8K",
        "open-clip:laion/CLIP-ViT-B-16-CommonPool.L.basic-s1B-b8K",
        "open-clip:laion/CLIP-ViT-B-16-CommonPool.L.clip-s1B-b8K",
        "open-clip:laion/CLIP-ViT-B-16-CommonPool.L.laion-s1B-b8K",
        "open-clip:laion/CLIP-ViT-B-32-CommonPool.M-s128M-b4K",
        "open-clip:laion/CLIP-ViT-B-32-CommonPool.S-s13M-b4K",
        "open-clip:laion/CoCa-ViT-B-32-laion2B-s13B-b90k",
    )
}


def _check_fields(name, ref_override, ours):
    mismatches = []
    for field in _COMPARABLE:
        if field not in ref_override:
            continue
        ref_val = ref_override[field]
        got = getattr(ours, field)
        want = _DEVIATIONS.get((name, field), ref_val)
        if got != want:
            mismatches.append((field, got, ref_val))
    return mismatches


def test_every_reference_vision_key_resolves_and_matches(ref_registry):
    from vit_prisma.utils.enums import ModelType
    ref_vision = ref_registry.MODEL_CONFIGS[ModelType.VISION]
    assert len(ref_vision) >= 80, "reference table shrank unexpectedly?"
    failures = []
    for name, override in ref_vision.items():
        try:
            cfg = get_model_config(name)
        except Exception as e:  # noqa: BLE001
            failures.append((name, f"did not resolve: {e}"))
            continue
        for field, got, want in _check_fields(name, override, cfg):
            failures.append((name, f"{field}: ours={got} ref={want}"))
    assert not failures, "\n".join(f"{n}: {m}" for n, m in failures)


def test_every_reference_vision_key_is_explicit_here(ref_registry):
    """VERDICT 5b: the long tail must exist as explicit entries, not only
    via the structural parser."""
    from vit_prisma.utils.enums import ModelType
    ref_vision = ref_registry.MODEL_CONFIGS[ModelType.VISION]
    missing = [n for n in ref_vision if n not in MODEL_CONFIGS]
    assert not missing, f"no explicit registry entry for: {missing}"


def test_every_reference_text_key_resolves(ref_registry):
    from vit_prisma.utils.enums import ModelType
    ref_text = ref_registry.MODEL_CONFIGS[ModelType.TEXT]
    failures = []
    for name, override in ref_text.items():
        try:
            cfg = get_model_config(name, model_type="text")
        except Exception as e:  # noqa: BLE001
            failures.append((name, f"did not resolve: {e}"))
            continue
        for field, got, want in _check_fields(name, override, cfg):
            if name in _TEXT_EXEMPT and field in _TEXT_B_SIZE_FIELDS:
                continue  # documented: ref applies a 768-wide tower to B
            if field == "layer_norm_pre":
                # The reference's BASE_TEXT_CONFIG sets layer_norm_pre=True,
                # but its text forward never calls the ln_pre it constructs
                # (base_text_transformer.py:66 built, :120-160 never
                # applied) — dead config.  CLIP text towers have no ln_pre;
                # ours resolves False.
                continue
            failures.append((name, f"{field}: ours={got} ref={want}"))
    assert not failures, "\n".join(f"{n}: {m}" for n, m in failures)


def test_text_supported_superset(ref_registry):
    assert set(ref_registry.TEXT_SUPPORTED_MODELS) <= set(
        TEXT_SUPPORTED_MODELS | set(TEXT_MODEL_CONFIGS))


def test_unknown_geometry_modifier_raises():
    """VERDICT 5a: no silent size-class fallback for 'plus'-style names."""
    with pytest.raises(ValueError, match="plus"):
        parse_open_clip_name(
            "open-clip:laion/CLIP-ViT-B-16-plus-240-laion400m_e32")
    with pytest.raises(ValueError, match="size word"):
        parse_open_clip_name("open-clip:timm/vit_colossal_patch14_clip_224.x")
    # Explicit entries still win for the plus-240 spellings we do know.
    cfg = get_model_config(
        "open-clip:timm/vit_base_patch16_plus_clip_240.laion400m_e32")
    assert cfg.d_model == 896 and cfg.n_heads == 14 and cfg.image_size == 240


def test_quickgelu_families():
    """OpenAI/MetaCLIP tags resolve to quick_gelu; laion tags to gelu."""
    assert get_model_config(
        "open-clip:timm/vit_base_patch32_clip_224.openai"
    ).activation_name == "quick_gelu"
    assert get_model_config(
        "open-clip:timm/vit_huge_patch14_clip_224.metaclip_2pt5b"
    ).activation_name == "quick_gelu"
    assert get_model_config(
        "open-clip:laion/CLIP-ViT-B-32-laion2B-s34B-b79K"
    ).activation_name == "gelu"
