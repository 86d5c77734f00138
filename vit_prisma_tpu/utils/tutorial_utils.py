"""Notebook/tutorial helpers.

Counterpart of ``/root/reference/src/vit_prisma/utils/tutorial_utils.py``
(``load_clip_models`` :25, ``calculate_clean_accuracy`` with optional SAE
substitution :60-140, feature-activation plotting helpers): accuracy
utilities over (images, labels) iterables, with and without an SAE spliced
at its hook point.
"""

from __future__ import annotations

from typing import Iterable, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from vit_prisma_tpu.sae.evals import make_replacement_hook
from vit_prisma_tpu.sae.sae import SparseAutoencoder


def load_clip_models(model_name: str = "open-clip:laion/CLIP-ViT-B-32-DataComp.XL-s13B-b90K",
                     **kwargs):
    """(vision, text) pair for a CLIP checkpoint (tutorial_utils.py:25)."""
    from vit_prisma_tpu.models.loading.loader import load_hooked_model
    vision = load_hooked_model(model_name, **kwargs)
    text = load_hooked_model(model_name, model_type="text", **kwargs)
    return vision, text


def calculate_clean_accuracy(model, data_iter: Iterable,
                             classifier=None,
                             sae: Optional[SparseAutoencoder] = None) -> float:
    """Top-1 accuracy, optionally with the SAE reconstruction substituted at
    its hook point (tutorial_utils.py:60-140).  ``classifier`` [d, n]: if
    given, logits = output @ classifier; else the model output is already
    logits."""
    fwd_hooks = None
    if sae is not None:
        fwd_hooks = [(sae.cfg.hook_point, make_replacement_hook(sae))]
    correct = n = 0
    for images, labels in data_iter:
        images = jnp.asarray(np.asarray(images))
        labels = np.asarray(labels)
        if fwd_hooks is not None:
            out = model.run_with_hooks(images, fwd_hooks=fwd_hooks)
        else:
            out = model(images)
        if classifier is not None:
            out = out @ jnp.asarray(classifier)
        pred = np.asarray(jnp.argmax(out, axis=-1))
        correct += int((pred == labels).sum())
        n += len(labels)
    return correct / max(n, 1)


def calculate_substitution_accuracy_delta(model, sae, data_iter_fn,
                                          classifier=None) -> Tuple[float, float]:
    """(clean_acc, substituted_acc) over a re-iterable dataset."""
    clean = calculate_clean_accuracy(model, data_iter_fn(), classifier)
    subbed = calculate_clean_accuracy(model, data_iter_fn(), classifier, sae=sae)
    return clean, subbed
