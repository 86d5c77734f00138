"""Model loader: ``load_hooked_model`` / ``HookedViT.from_pretrained``.

Counterpart of ``/root/reference/src/vit_prisma/models/model_loader.py:278``:
resolve config (registry) -> obtain source state dict -> convert to Prisma
naming -> fill missing keys -> optional fold/center/process -> build model.

Offline-first: the source state dict can be passed directly
(``state_dict=``), loaded from a local torch/safetensors checkpoint
(``checkpoint_path=``), or — when the environment has network/cache access —
fetched via HF ``transformers`` exactly like the reference
(model_loader.py:592-651).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

from vit_prisma_tpu.configs.vit_config import ViTConfig
from vit_prisma_tpu.models.loading import convert as C
from vit_prisma_tpu.models.loading.processing import process_state_dict
from vit_prisma_tpu.models.loading.registry import (
    ModelCategory,
    categorize,
    check_model_name,
    get_model_config,
)
from vit_prisma_tpu.models.loading.state_dict import stack_params, unstack_params
from vit_prisma_tpu.models.vit import HookedViT, init_vit_params


def _to_numpy_sd(sd) -> Dict[str, Any]:
    out = {}
    for k, v in sd.items():
        if hasattr(v, "detach"):
            v = v.detach().cpu().float().numpy()
        out[k] = v
    return out


def _strip_prefix(sd: Dict[str, Any], prefix: str) -> Dict[str, Any]:
    return {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}


def _load_checkpoint(path: str) -> Dict[str, Any]:
    """Local checkpoint loader (torch .pt/.pth/.bin or .safetensors),
    reference weight_conversion.py:940-957."""
    if path.endswith(".safetensors"):
        from safetensors.numpy import load_file
        return load_file(path)
    import torch
    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(ckpt, dict) and "state_dict" in ckpt:
        ckpt = ckpt["state_dict"]
    if next(iter(ckpt)).startswith("module"):
        ckpt = {k[7:]: v for k, v in ckpt.items()}
    return ckpt


def _fetch_from_hub(model_name: str, category: ModelCategory):
    """Network path (parity with model_loader.py:750-855); raises a clear
    error in zero-egress environments."""
    try:
        if category == ModelCategory.CLIP:
            from transformers import CLIPModel
            model = CLIPModel.from_pretrained(model_name)
            return {"clip_model_sd": model.state_dict()}
        if category == ModelCategory.DINO:
            from transformers import ViTModel
            return {"sd": ViTModel.from_pretrained(
                model_name, add_pooling_layer=False).state_dict()}
        if category == ModelCategory.HF_VIT:
            from transformers import ViTForImageClassification
            return {"sd": ViTForImageClassification.from_pretrained(
                model_name).state_dict()}
        if category == ModelCategory.VIVIT:
            from transformers import VivitForVideoClassification
            return {"sd": VivitForVideoClassification.from_pretrained(
                model_name).state_dict()}
        if category == ModelCategory.OPEN_CLIP:
            from huggingface_hub import hf_hub_download
            name = model_name
            for p in ("open-clip:", "hf-hub:"):
                if name.startswith(p):
                    name = name[len(p):]
            path = hf_hub_download(name, "open_clip_pytorch_model.bin")
            return {"sd": _load_checkpoint(path)}
        if category == ModelCategory.TIMM:
            import timm
            return {"sd": timm.create_model(
                model_name, pretrained=True).state_dict()}
    except Exception as e:  # noqa: BLE001
        raise RuntimeError(
            f"Could not fetch weights for {model_name!r} from the hub "
            f"(offline environment?). Pass `state_dict=` or "
            f"`checkpoint_path=` instead. Original error: {e}") from e
    raise ValueError(f"Unhandled category {category}")


def convert_weights(category: ModelCategory, raw: Dict[str, Any],
                    cfg: ViTConfig, model_type: str = "vision") -> Dict[str, Any]:
    """Dispatch (reference model_loader.py:654-707)."""
    if category == ModelCategory.CLIP:
        if "clip_model_sd" in raw:
            full = _to_numpy_sd(raw["clip_model_sd"])
        else:
            full = _to_numpy_sd(raw["sd"])
        if model_type == "text":
            text_sd = _strip_prefix(full, "text_model.")
            head = {"weight": full["text_projection.weight"]}
            return C.convert_hf_clip_text_weights(text_sd, head, cfg)
        vision_sd = _strip_prefix(full, "vision_model.")
        head = {"weight": full["visual_projection.weight"]}
        return C.convert_clip_weights(vision_sd, head, cfg)
    raw_sd = _to_numpy_sd(raw["sd"])
    if category == ModelCategory.OPEN_CLIP:
        if model_type == "text":
            return C.convert_open_clip_text_weights(raw_sd, cfg)
        return C.convert_open_clip_weights(raw_sd, cfg)
    if category == ModelCategory.TIMM:
        return C.convert_timm_weights(raw_sd, cfg)
    if category == ModelCategory.DINO:
        return C.convert_dino_weights(raw_sd, cfg)
    if category == ModelCategory.HF_VIT:
        return C.convert_hf_vit_for_image_classification_weights(raw_sd, cfg)
    if category == ModelCategory.VIVIT:
        return C.convert_vivit_weights(raw_sd, cfg)
    if category == ModelCategory.VJEPA:
        return C.convert_vjepa_weights(raw_sd, cfg)
    raise ValueError(f"Unhandled category {category}")


def load_hooked_model(model_name: str, model_type: str = "vision",
                      state_dict: Optional[Dict[str, Any]] = None,
                      checkpoint_path: Optional[str] = None,
                      cfg: Optional[ViTConfig] = None,
                      fold_ln: bool = False,
                      center_writing_weights: bool = False,
                      fold_value_biases: bool = False,
                      refactor_factored_attn_matrices: bool = False,
                      dtype: str = "float32",
                      allow_failing: bool = False,
                      **config_overrides):
    """Load a pretrained model into a HookedViT / HookedTextTransformer.

    Mirrors ``load_hooked_model`` (model_loader.py:278-368); processing
    flags default False as there (:330-340).
    """
    category = categorize(model_name)
    check_model_name(model_name, allow_failing=allow_failing)
    if cfg is None:
        cfg = get_model_config(model_name, model_type=model_type,
                               dtype=dtype, **config_overrides)

    if state_dict is not None:
        raw = {"sd": state_dict} if "clip_model_sd" not in state_dict else state_dict
        # Allow callers to pass a full HF CLIPModel state dict directly.
        if category == ModelCategory.CLIP and any(
                k.startswith("vision_model.") for k in state_dict):
            raw = {"clip_model_sd": state_dict}
    elif checkpoint_path is not None:
        raw = {"sd": _load_checkpoint(checkpoint_path)}
        if category == ModelCategory.CLIP and any(
                k.startswith("vision_model.") for k in raw["sd"]):
            raw = {"clip_model_sd": raw["sd"]}
    else:
        raw = _fetch_from_hub(model_name, category)

    flat = convert_weights(category, raw, cfg, model_type)

    if model_type == "text":
        from vit_prisma_tpu.models.text import HookedTextTransformer, init_text_params
        from vit_prisma_tpu.models.text import stack_text_params, unstack_text_params
        defaults = unstack_text_params(
            init_text_params(cfg, __import__("jax").random.PRNGKey(0)), cfg)
        flat = C.fill_missing_keys(flat, cfg, defaults)
        flat = process_state_dict(flat, cfg, fold_ln=fold_ln,
                                  center_writing=center_writing_weights,
                                  fold_value_biases_flag=fold_value_biases,
                                  refactor_factored=refactor_factored_attn_matrices) \
            if (fold_ln or center_writing_weights or fold_value_biases or
                refactor_factored_attn_matrices) else flat
        return HookedTextTransformer(cfg, params=stack_text_params(flat, cfg))

    import jax
    defaults = unstack_params(init_vit_params(cfg, jax.random.PRNGKey(0)), cfg)
    flat = C.fill_missing_keys(flat, cfg, defaults)
    if fold_ln or center_writing_weights or fold_value_biases or \
            refactor_factored_attn_matrices:
        flat = process_state_dict(
            flat, cfg, fold_ln=fold_ln, center_writing=center_writing_weights,
            fold_value_biases_flag=fold_value_biases,
            refactor_factored=refactor_factored_attn_matrices)
    return HookedViT(cfg, params=stack_params(flat, cfg))
