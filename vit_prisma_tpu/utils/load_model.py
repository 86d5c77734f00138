"""Model/SAE pair loading for the SAE runner.

Counterpart of ``/root/reference/src/vit_prisma/utils/load_model.py:15-74``:
``load_model(cfg)`` instantiates the hooked model named by an SAE runner
config; ``load_sae_and_model`` loads a trained SAE checkpoint together with
its subject model (local paths first; hub fetch only if the environment
allows it).
"""

from __future__ import annotations

from typing import Optional, Tuple

from vit_prisma_tpu.sae.config import SAERunnerConfig
from vit_prisma_tpu.sae.sae import SparseAutoencoder


def load_model(cfg: SAERunnerConfig, state_dict=None, checkpoint_path=None,
               **kwargs):
    """Instantiate the subject model for an SAE run (load_model.py:15-40)."""
    from vit_prisma_tpu.models.loading.loader import load_hooked_model
    if cfg.model_class_name == "HookedViT":
        return load_hooked_model(cfg.model_name, state_dict=state_dict,
                                 checkpoint_path=checkpoint_path, **kwargs)
    if cfg.model_class_name == "HookedTextTransformer":
        return load_hooked_model(cfg.model_name, model_type="text",
                                 state_dict=state_dict,
                                 checkpoint_path=checkpoint_path, **kwargs)
    raise ValueError(f"Unknown model class: {cfg.model_class_name}")


def load_sae_and_model(sae_path: str, model_state_dict=None,
                       model_checkpoint_path: Optional[str] = None,
                       **kwargs) -> Tuple[SparseAutoencoder, object]:
    """Load a saved SAE plus its subject model (load_model.py:43-74)."""
    sae = SparseAutoencoder.load_from_pretrained(sae_path)
    model = load_model(sae.cfg, state_dict=model_state_dict,
                       checkpoint_path=model_checkpoint_path, **kwargs)
    return sae, model
