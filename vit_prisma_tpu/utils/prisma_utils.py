"""Utility helpers mirroring the reference's
``/root/reference/src/vit_prisma/utils/prisma_utils.py`` public surface
(``get_act_name`` shorthand resolver :202-302, ``Slice`` :74-198,
``to_numpy`` :304) reimplemented for JAX arrays.
"""

from __future__ import annotations

import re
from typing import Any, Optional, Sequence, Union

import numpy as np

_LAYER_TYPE_ALIAS = {
    "a": "attn",
    "m": "mlp",
    "b": "",
    "block": "",
    "blocks": "",
    "attention": "attn",
}

_ACT_NAME_ALIAS = {
    "attn": "pattern",
    "attn_logits": "attn_scores",
    "key": "k",
    "query": "q",
    "value": "v",
    "mlp_pre": "pre",
    "mlp_mid": "mid",
    "mlp_post": "post",
}

_ATTN_ACTS = {"k", "v", "q", "z", "rot_k", "rot_q", "result", "pattern", "attn_scores"}
_MLP_ACTS = {"pre", "post", "mid", "pre_linear"}
_LN_NAMES = {"scale", "normalized"}


def get_act_name(name: str, layer: Optional[Union[int, str]] = None,
                 layer_type: Optional[str] = None) -> str:
    """Shorthand -> hook-name resolver; deterministic, semantics match the
    reference (prisma_utils.py:202-302): ``get_act_name('k', 6) ==
    'blocks.6.attn.hook_k'``, ``'embed' -> 'hook_embed'``,
    ``'scale4ln1' -> 'blocks.4.ln1.hook_scale'``."""
    if ("." in name or name.startswith("hook_")) and layer is None and layer_type is None:
        return name
    match = re.match(r"([a-z]+)(\d+)([a-z]?.*)", name)
    if match is not None:
        name, layer, layer_type = match.groups(0)

    if name in _ACT_NAME_ALIAS:
        name = _ACT_NAME_ALIAS[name]

    full = ""
    if layer is not None:
        full += f"blocks.{layer}."
    if name in _ATTN_ACTS:
        layer_type = "attn"
    elif name in _MLP_ACTS:
        layer_type = "mlp"
    elif layer_type in _LAYER_TYPE_ALIAS:
        layer_type = _LAYER_TYPE_ALIAS[layer_type]
    if layer_type:
        full += f"{layer_type}."
    full += f"hook_{name}"
    if name in _LN_NAMES and layer is None:
        full = f"ln_final.{full}"
    return full


def to_numpy(x) -> np.ndarray:
    """Convert jax/np arrays, lists, tuples, scalars to numpy
    (reference prisma_utils.py:304)."""
    if isinstance(x, np.ndarray):
        return x
    if isinstance(x, (list, tuple)):
        return np.array(x)
    if isinstance(x, (int, float, bool, np.number)):
        return np.array(x)
    if hasattr(x, "detach"):  # torch
        return x.detach().cpu().numpy()
    return np.asarray(x)


SliceInput = Optional[Union[int, slice, Sequence[int], np.ndarray]]


class Slice:
    """Lightweight counterpart of the reference's ``Slice``
    (prisma_utils.py:74-198): wraps int / slice / sequence / None and applies
    along a chosen axis."""

    def __init__(self, input_slice: SliceInput = None):
        if isinstance(input_slice, tuple):
            input_slice = slice(*input_slice)
        if input_slice is None:
            self.slice: Any = slice(None)
            self.mode = "identity"
        elif isinstance(input_slice, int):
            self.slice = input_slice
            self.mode = "int"
        elif isinstance(input_slice, slice):
            self.slice = input_slice
            self.mode = "slice"
        elif isinstance(input_slice, (list, np.ndarray)) or hasattr(input_slice, "shape"):
            self.slice = np.asarray(input_slice)
            self.mode = "array"
        elif isinstance(input_slice, Slice):
            self.slice = input_slice.slice
            self.mode = input_slice.mode
        else:
            raise ValueError(f"Invalid slice input {input_slice!r}")

    def apply(self, tensor, dim: int = 0):
        ndim = tensor.ndim
        idx = [slice(None)] * ndim
        idx[dim] = self.slice
        return tensor[tuple(idx)]

    def indices(self, max_ctx: Optional[int] = None):
        if self.mode == "identity" and max_ctx is None:
            raise ValueError("Cannot get indices of an identity slice without max_ctx")
        return np.arange(max_ctx)[self.slice] if self.mode != "array" else self.slice

    def __repr__(self):
        return f"Slice: [{self.slice}], mode: {self.mode}"


def test_prompt(example_data_point, model, example_answer: Optional[str] = None,
                top_k: int = 10, class_names=None) -> None:
    """Top-k class readout for a single image (reference
    prisma_utils.py:23-65): prints each of the top-k predictions with logit
    and probability, then the rank of ``example_answer`` if given.

    ``example_data_point``: one image [C, H, W] (a batch dim is added).
    ``class_names`` defaults to the vendored ImageNet table.
    """
    import jax.numpy as jnp
    from vit_prisma_tpu.dataloaders.imagenet_names import (
        imagenet_index_from_word, load_imagenet_dict)

    if class_names is None:
        class_names = load_imagenet_dict()

    x = jnp.asarray(example_data_point)
    if x.ndim == 3:
        x = x[None]
    logits = np.asarray(model(x))[0]
    probs = np.exp(logits - logits.max())
    probs = probs / probs.sum()
    order = np.argsort(probs)[::-1]

    for i in range(top_k):
        index = int(order[i])
        label = class_names.get(index, str(index)) \
            if isinstance(class_names, dict) else class_names[index]
        print(f"Top {i}th token. Logit: {logits[index]:.2f} "
              f"Prob: {probs[index] * 100:.2f}% Label: |{label}|")

    if example_answer is not None:
        answer_index = imagenet_index_from_word(example_answer,
                                                mapping=class_names)
        rank = int(np.where(order == answer_index)[0][0])
        print("Rank of the correct answer:")
        print(f"Class Name: {example_answer} | Rank: {rank} | "
              f"ImageNet Index: {answer_index}")
