"""Legacy batch activation harvester — TPU-native counterpart of the
reference's ``vit_prisma/utils/get_activations.py:91-117``.

The reference registers an eager ``forward_hook`` on one ``nn.Module``,
loops a DataLoader on GPU, and ``np.vstack``s the captured inputs.  Here
the same capability is one jit-specialized cached forward per hook name:
``run_with_cache(names_filter=[hook_name], stop_at_layer=L+1)`` — XLA
dead-code-eliminates every block past the hook's layer, the activation
never leaves HBM until the single host fetch per batch, and the compiled
program is reused across the whole loader.

The reference file also ships ``CustomAttention`` / ``timmCustomAttention``
(``nn.Identity`` pseudo-hook shims so scores/patterns become hookable on
foreign models, get_activations.py:119-172).  Those shims are unnecessary
here: every HookedViT attention already exposes ``hook_attn_scores`` /
``hook_pattern`` as first-class compiled hook points (models/layers.py),
so harvesting them is the same one-liner as any other name.
"""
from __future__ import annotations

import re
from typing import Iterable, Optional, Tuple, Union

import numpy as np

__all__ = ["get_activations", "hook_stop_layer"]

_BLOCK_RE = re.compile(r"^blocks\.(\d+)\.")


def hook_stop_layer(hook_name: str, n_layers: int) -> Optional[int]:
    """Earliest ``stop_at_layer`` that still computes ``hook_name``.

    ``blocks.L.*`` needs ``L + 1``; pre-block names (patch/pos embed,
    ``hook_full_embed`` …) need ``0`` (embeddings only); post-block names
    (``ln_final``, pooling, head) need the full stack (``None``).
    """
    m = _BLOCK_RE.match(hook_name)
    if m:
        layer = int(m.group(1))
        if layer >= n_layers:
            raise ValueError(f"{hook_name!r} names layer {layer} but the "
                             f"model has {n_layers} layers")
        return layer + 1
    if "embed" in hook_name:
        return 0
    return None  # ln_final / pooling / head: run the whole stack


def get_activations(model, hook_name: str, data_loader: Iterable,
                    max_count: int = 0, test_run: bool = False,
                    return_labels: bool = False,
                    ) -> Union[np.ndarray, Tuple[np.ndarray, np.ndarray]]:
    """Harvest ``hook_name`` activations for every batch of ``data_loader``.

    Capability match for the reference's legacy harvester
    (get_activations.py:91-117), with its eager-hook mechanics replaced by
    the compiled cache path.  Differences, deliberate:

    - the reference takes a live ``nn.Module`` and captures its *input*;
      here a hook **name** (``get_act_name`` shorthand accepted) names the
      value exactly — no off-by-one-module ambiguity;
    - ``max_count`` is the number of batches to harvest, ``0`` = the whole
      loader (the reference's loop quirkily stops after one batch when
      ``max_count=0``; that footgun is not reproduced);
    - ``test_run=True`` harvests a single batch regardless of ``max_count``.

    ``data_loader`` yields either ``images`` or ``(images, labels)``
    (torch-DataLoader-style); tensors with ``.numpy()`` are accepted.
    Returns ``[num_examples, ...]`` float32 numpy (vstack semantics), plus
    the stacked labels when ``return_labels=True``.
    """
    from vit_prisma_tpu.models.vit import hook_names
    from vit_prisma_tpu.utils.prisma_utils import get_act_name

    name = get_act_name(hook_name) if "." not in hook_name else hook_name
    if name not in set(hook_names(model.cfg)):
        # a layer-less block shorthand ("resid_post", "pattern", …):
        # harvest the LAST layer, like indexing the cache with layer=-1
        name = get_act_name(hook_name, model.cfg.n_layers - 1)
    stop = hook_stop_layer(name, model.cfg.n_layers)

    chunks, label_chunks = [], []
    n_batches = 1 if test_run else (max_count if max_count > 0 else None)
    for i, batch in enumerate(data_loader):
        if n_batches is not None and i >= n_batches:
            break
        if isinstance(batch, (tuple, list)):
            images, labels = batch[0], batch[1] if len(batch) > 1 else None
        else:
            images, labels = batch, None
        if hasattr(images, "numpy") and not isinstance(images, np.ndarray):
            images = images.numpy()  # torch CPU tensor / tf tensor
        images = np.asarray(images)
        _, cache = model.run_with_cache(images, names_filter=[name],
                                        stop_at_layer=stop,
                                        return_cache_object=False)
        chunks.append(np.asarray(cache[name], dtype=np.float32))
        if labels is not None:
            if hasattr(labels, "numpy") and not isinstance(labels, np.ndarray):
                labels = labels.numpy()
            label_chunks.append(np.asarray(labels))
    if not chunks:
        raise ValueError("data_loader yielded no batches")
    acts = np.concatenate(chunks, axis=0)
    if return_labels:
        labels = (np.concatenate(label_chunks, axis=0)
                  if label_chunks else np.zeros((len(acts),), np.int64))
        return acts, labels
    return acts
