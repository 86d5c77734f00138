"""ImageNet class-name resolution.

The reference vendors 1,000-entry index->name tables
(``utils/data_utils/imagenet/imagenet_dict.py`` and friends).  Those are
public data, but to keep this package data-light the mapping is *resolved*
at runtime from, in order:

1. an explicit JSON path argument,
2. ``$IMAGENET_CLASSES_JSON``,
3. a HF ``ViTForImageClassification`` config's id2label (if cached locally),
4. fallback ``{i: "class_{i}"}`` placeholders (shapes still work; names
   don't).

Use :func:`save_imagenet_dict` once in an online environment to pin the real
names into your project.
"""

from __future__ import annotations

import json
import os
from functools import lru_cache
from typing import Dict, Optional


@lru_cache(maxsize=4)
def load_imagenet_dict(path: Optional[str] = None,
                       n_classes: int = 1000) -> Dict[int, str]:
    if path is None:
        path = os.environ.get("IMAGENET_CLASSES_JSON")
    if path and os.path.exists(path):
        with open(path) as f:
            raw = json.load(f)
        return {int(k): v for k, v in raw.items()} if isinstance(raw, dict) \
            else {i: v for i, v in enumerate(raw)}
    try:
        from transformers import AutoConfig
        cfg = AutoConfig.from_pretrained("google/vit-base-patch16-224",
                                         local_files_only=True)
        if getattr(cfg, "id2label", None) and len(cfg.id2label) == n_classes:
            return {int(k): v for k, v in cfg.id2label.items()}
    except Exception:
        pass
    return {i: f"class_{i}" for i in range(n_classes)}


def imagenet_index_from_word(word: str,
                             mapping: Optional[Dict[int, str]] = None) -> int:
    """First index whose class name contains ``word``
    (reference imagenet_utils.imagenet_index_from_word)."""
    mapping = mapping or load_imagenet_dict()
    word = word.lower()
    for idx, name in mapping.items():
        if word in str(name).lower():
            return idx
    raise KeyError(f"No ImageNet class matches {word!r}")


def get_imagenet_text_labels(mapping: Optional[Dict[int, str]] = None):
    mapping = mapping or load_imagenet_dict()
    return [mapping[i] for i in range(len(mapping))]


def save_imagenet_dict(path: str, mapping: Dict[int, str]):
    with open(path, "w") as f:
        json.dump({str(k): v for k, v in mapping.items()}, f)
