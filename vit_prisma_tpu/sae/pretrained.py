"""Pretrained-SAE registry: the published Prisma SAE checkpoint tables.

The reference publishes 71 trained SAEs on the HF hub, documented only as
markdown tables (``docs/sae_table.md`` — repo links + fidelity metrics).
Here they are a queryable registry (vendored ``pretrained_saes.json``, the
public compatibility surface) with a one-call loader that goes hub ->
reference-checkpoint import -> a ready :class:`SparseAutoencoder`.

    >>> from vit_prisma_tpu.sae.pretrained import list_pretrained_saes, \
    ...     load_pretrained_sae
    >>> rows = list_pretrained_saes(model="clip-b-32", layer=9,
    ...                             sublayer="hook_resid_post")
    >>> sae = load_pretrained_sae(rows[0]["repo_id"])      # needs network

Offline (this environment), the registry itself is fully functional and
``load_pretrained_sae`` degrades with a clear error; local checkpoint
files load through the same import path.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, List, Optional

_TABLE_PATH = os.path.join(os.path.dirname(__file__), "pretrained_saes.json")
_table: Optional[List[Dict[str, Any]]] = None


def _load_table() -> List[Dict[str, Any]]:
    global _table
    if _table is None:
        with open(_TABLE_PATH) as f:
            _table = json.load(f)["entries"]
    return _table


def list_pretrained_saes(model: Optional[str] = None,
                         family: Optional[str] = None,
                         layer: Optional[int] = None,
                         sublayer: Optional[str] = None
                         ) -> List[Dict[str, Any]]:
    """Rows of the published SAE table, filtered.

    ``model``: 'clip-b-32' | 'dino-b-32'; ``family``:
    'vanilla-all-patches' | 'vanilla-cls-only' | 'topk-cls-only-k64' |
    'vanilla-spatial-patches'; ``sublayer``: 'hook_resid_post' |
    'hook_mlp_out'.  Each row carries the repo_id plus the published
    fidelity metrics (explained variance, L0, cos sim, CE-recovered...).
    """
    rows = _load_table()
    if model is not None:
        rows = [r for r in rows if r["model"] == model]
    if family is not None:
        rows = [r for r in rows if r["family"] == family]
    if layer is not None:
        rows = [r for r in rows if r["layer"] == layer]
    if sublayer is not None:
        rows = [r for r in rows if r["sublayer"] == sublayer]
    return list(rows)


def get_pretrained_sae_info(repo_id: str) -> Dict[str, Any]:
    """The table row for one published checkpoint (KeyError if unknown)."""
    for r in _load_table():
        if r["repo_id"] == repo_id:
            return dict(r)
    raise KeyError(f"unknown pretrained SAE: {repo_id!r} "
                   f"(see list_pretrained_saes())")


def load_pretrained_sae(repo_id: str, download_dir: str = "saes",
                        filename: str = "n_images_2600058.pt"):
    """Download a published SAE from the hub and import the reference
    checkpoint format into a :class:`SparseAutoencoder`.

    Mirrors ``sae_utils.download_sae_from_huggingface`` (reference
    sae_utils.py:81-85) + the tolerant reference-checkpoint unpickler
    (``sae/checkpoint_import.py``); the default ``filename`` is the
    published checkpoints' convention (reference
    utils/load_model.py:54).  ``repo_id`` may be any HF repo, but
    registry entries (``list_pretrained_saes``) carry the published
    fidelity metrics to validate against.
    """
    from vit_prisma_tpu.sae.hub import download_sae_from_huggingface
    path = download_sae_from_huggingface(repo_id, file_id=filename,
                                         download_dir=download_dir)
    from vit_prisma_tpu.sae.checkpoint_import import (
        load_reference_sae_checkpoint)
    return load_reference_sae_checkpoint(path)
