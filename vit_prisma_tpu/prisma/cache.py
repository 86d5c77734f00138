"""ActivationCache — dict-like view over cached activations plus batched
analysis ops, in JAX.

Behavioral counterpart of
``/root/reference/src/vit_prisma/prisma_tools/activation_cache.py:29``:
shorthand ``("resid_pre", 5)`` indexing with negative layers (:70-93),
``accumulated_resid`` (:160), ``decompose_resid`` (:294),
``stack_head_results`` (:388), ``compute_head_results`` (:468),
``stack_activation`` (:492), ``get_neuron_results`` (:523),
``stack_neuron_results`` (:564), ``apply_ln_to_stack`` using *cached*
``hook_scale`` factors (:656-735), ``get_full_resid_decomposition`` (:737),
``remove_batch_dim`` (:40).

All math is jnp; the stacking methods operate on HBM-resident arrays and are
jit-compatible when called from inside a traced function.
"""

from __future__ import annotations

import logging
from typing import Dict, Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np

from vit_prisma_tpu.utils import prisma_utils as utils
from vit_prisma_tpu.utils.prisma_utils import Slice, SliceInput


class ActivationCache:
    def __init__(self, cache_dict: Dict[str, jax.Array], model,
                 has_batch_dim: bool = True):
        self.cache_dict = dict(cache_dict)
        self.model = model
        self.has_batch_dim = has_batch_dim
        self.has_embed = "hook_embed" in self.cache_dict
        self.has_pos_embed = "hook_pos_embed" in self.cache_dict

    # -- dict protocol ---------------------------------------------------
    def __getitem__(self, key) -> jax.Array:
        if key in self.cache_dict:
            return self.cache_dict[key]
        if isinstance(key, str):
            return self.cache_dict[utils.get_act_name(key)]
        if len(key) > 1 and key[1] is not None and key[1] < 0:
            key = (key[0], self.model.cfg.n_layers + key[1], *key[2:])
        return self.cache_dict[utils.get_act_name(*key)]

    def __contains__(self, key) -> bool:
        try:
            self[key]
            return True
        except KeyError:
            return False

    def __len__(self) -> int:
        return len(self.cache_dict)

    def __iter__(self) -> Iterator[str]:
        return iter(self.cache_dict)

    def keys(self):
        return self.cache_dict.keys()

    def values(self):
        return self.cache_dict.values()

    def items(self):
        return self.cache_dict.items()

    def __repr__(self) -> str:
        return f"ActivationCache with keys {list(self.cache_dict.keys())}"

    def remove_batch_dim(self) -> "ActivationCache":
        if self.has_batch_dim:
            for key in self.cache_dict:
                assert self.cache_dict[key].shape[0] == 1, (
                    f"Cannot remove batch dimension from cache with batch "
                    f"size > 1, for key {key} with shape "
                    f"{self.cache_dict[key].shape}")
                self.cache_dict[key] = self.cache_dict[key][0]
            self.has_batch_dim = False
        else:
            logging.warning(
                "Tried removing batch dimension after already having removed it.")
        return self

    # -- residual-stream analyses ---------------------------------------
    def accumulated_resid(self, layer: Optional[int] = None,
                          incl_mid: bool = False, apply_ln: bool = False,
                          pos_slice: SliceInput = None, mlp_input: bool = False,
                          return_labels: bool = False):
        """Accumulated residual stream at each (sub)layer — logit-lens input
        (activation_cache.py:160)."""
        if not isinstance(pos_slice, Slice):
            pos_slice = Slice(pos_slice)
        if layer is None or layer == -1:
            layer = self.model.cfg.n_layers
        labels, components = [], []
        for l in range(layer + 1):
            if l == self.model.cfg.n_layers:
                components.append(self[("resid_post", l - 1)])
                labels.append("final_post")
                continue
            components.append(self[("resid_pre", l)])
            labels.append(f"{l}_pre")
            if (incl_mid and l < layer) or (mlp_input and l == layer):
                components.append(self[("resid_mid", l)])
                labels.append(f"{l}_mid")
        components = jnp.stack([pos_slice.apply(c, dim=-2) for c in components], axis=0)
        if apply_ln:
            components = self.apply_ln_to_stack(components, layer,
                                                pos_slice=pos_slice,
                                                mlp_input=mlp_input)
        return (components, labels) if return_labels else components

    def decompose_resid(self, layer: Optional[int] = None,
                        mlp_input: bool = False, mode: str = "all",
                        apply_ln: bool = False, pos_slice: SliceInput = None,
                        incl_embeds: bool = True, return_labels: bool = False):
        """Decompose the residual input to ``layer`` into per-component
        contributions (activation_cache.py:294)."""
        if not isinstance(pos_slice, Slice):
            pos_slice = Slice(pos_slice)
        if layer is None or layer == -1:
            layer = self.model.cfg.n_layers
        incl_attn = mode != "mlp"
        incl_mlp = mode != "attn" and not self.model.cfg.attn_only
        components, labels = [], []
        if incl_embeds:
            if self.has_embed:
                components.append(self["hook_embed"])
                labels.append("embed")
            if self.has_pos_embed:
                components.append(self["hook_pos_embed"])
                labels.append("pos_embed")
        for l in range(layer):
            if incl_attn:
                components.append(self[("attn_out", l)])
                labels.append(f"{l}_attn_out")
            if incl_mlp:
                components.append(self[("mlp_out", l)])
                labels.append(f"{l}_mlp_out")
        if mlp_input and incl_attn:
            components.append(self[("attn_out", layer)])
            labels.append(f"{layer}_attn_out")
        components = jnp.stack([pos_slice.apply(c, dim=-2) for c in components], axis=0)
        if apply_ln:
            components = self.apply_ln_to_stack(components, layer,
                                                pos_slice=pos_slice,
                                                mlp_input=mlp_input)
        return (components, labels) if return_labels else components

    # -- head / neuron attribution --------------------------------------
    def compute_head_results(self):
        """Post-hoc per-head results ``z @ W_O`` for every layer
        (activation_cache.py:468-490)."""
        if "blocks.0.attn.hook_result" in self.cache_dict:
            logging.warning("Tried to compute head results when they were already cached")
            return
        W_O = self.model.W_O  # [n_layers, n_heads, d_head, d_model]
        for l in range(self.model.cfg.n_layers):
            self.cache_dict[f"blocks.{l}.attn.hook_result"] = jnp.einsum(
                "...nh,nhd->...nd", self[("z", l, "attn")], W_O[l])

    def stack_head_results(self, layer: int = -1, return_labels: bool = False,
                           incl_remainder: bool = False,
                           pos_slice: SliceInput = None,
                           apply_ln: bool = False):
        """Stack per-head residual contributions up to ``layer``
        (activation_cache.py:388)."""
        if not isinstance(pos_slice, Slice):
            pos_slice = Slice(pos_slice)
        if layer is None or layer == -1:
            layer = self.model.cfg.n_layers
        if "blocks.0.attn.hook_result" not in self.cache_dict:
            self.compute_head_results()

        components, labels = [], []
        for l in range(layer):
            components.append(pos_slice.apply(self[("result", l, "attn")], dim=-3))
            labels.extend([f"L{l}H{h}" for h in range(self.model.cfg.n_heads)])
        if components:
            stacked = jnp.concatenate(components, axis=-2)
            stacked = jnp.moveaxis(stacked, -2, 0)  # [(layer head), ..., d_model]
            if incl_remainder:
                remainder = pos_slice.apply(self[("resid_post", layer - 1)], dim=-2) \
                    - stacked.sum(axis=0)
                stacked = jnp.concatenate([stacked, remainder[None]], axis=0)
                labels.append("remainder")
            components = stacked
        elif incl_remainder:
            components = jnp.stack(
                [pos_slice.apply(self[("resid_post", layer - 1)], dim=-2)], axis=0)
            labels.append("remainder")
        else:
            components = jnp.zeros(
                (0, *pos_slice.apply(self["hook_embed"], dim=-2).shape))
        if apply_ln:
            components = self.apply_ln_to_stack(components, layer, pos_slice=pos_slice)
        return (components, labels) if return_labels else components

    def stack_activation(self, activation_name: str, layer: int = -1,
                         sublayer_type: Optional[str] = None) -> jax.Array:
        """Stack one activation over layers (activation_cache.py:492)."""
        if layer is None or layer == -1:
            layer = self.model.cfg.n_layers
        return jnp.stack(
            [self[(activation_name, l, sublayer_type)] for l in range(layer)], axis=0)

    def get_neuron_results(self, layer: int, neuron_slice: SliceInput = None,
                           pos_slice: SliceInput = None) -> jax.Array:
        """Per-neuron residual contributions for one layer
        (activation_cache.py:523)."""
        if not isinstance(neuron_slice, Slice):
            neuron_slice = Slice(neuron_slice)
        if not isinstance(pos_slice, Slice):
            pos_slice = Slice(pos_slice)
        neuron_acts = self[("post", layer, "mlp")]
        W_out = self.model.W_out[layer]
        neuron_acts = pos_slice.apply(neuron_acts, dim=-2)
        neuron_acts = neuron_slice.apply(neuron_acts, dim=-1)
        W_out = neuron_slice.apply(W_out, dim=0)
        return neuron_acts[..., None] * W_out

    def stack_neuron_results(self, layer: int, pos_slice: SliceInput = None,
                             neuron_slice: SliceInput = None,
                             return_labels: bool = False,
                             incl_remainder: bool = False,
                             apply_ln: bool = False):
        """Stack per-neuron residual contributions up to ``layer``
        (activation_cache.py:564)."""
        if layer is None or layer == -1:
            layer = self.model.cfg.n_layers
        if not isinstance(neuron_slice, Slice):
            neuron_slice = Slice(neuron_slice)
        if not isinstance(pos_slice, Slice):
            pos_slice = Slice(pos_slice)

        components, labels = [], []
        neuron_labels = neuron_slice.apply(np.arange(self.model.cfg.d_mlp), dim=0)
        if isinstance(neuron_labels, (int, np.integer)):
            neuron_labels = np.array([neuron_labels])
        for l in range(layer):
            components.append(self.get_neuron_results(
                l, pos_slice=pos_slice, neuron_slice=neuron_slice))
            labels.extend([f"L{l}N{h}" for h in neuron_labels])
        if components:
            stacked = jnp.concatenate(components, axis=-2)
            stacked = jnp.moveaxis(stacked, -2, 0)
            if incl_remainder:
                remainder = pos_slice.apply(self[("resid_post", layer - 1)], dim=-2) \
                    - stacked.sum(axis=0)
                stacked = jnp.concatenate([stacked, remainder[None]], axis=0)
                labels.append("remainder")
            components = stacked
        elif incl_remainder:
            components = jnp.stack(
                [pos_slice.apply(self[("resid_post", layer - 1)], dim=-2)], axis=0)
            labels.append("remainder")
        else:
            components = jnp.zeros(
                (0, *pos_slice.apply(self["hook_embed"], dim=-2).shape))
        if apply_ln:
            components = self.apply_ln_to_stack(components, layer, pos_slice=pos_slice)
        return (components, labels) if return_labels else components

    # -- LN scaling ------------------------------------------------------
    def apply_ln_to_stack(self, residual_stack: jax.Array,
                          layer: Optional[int] = None, mlp_input: bool = False,
                          pos_slice: SliceInput = None,
                          batch_slice: SliceInput = None,
                          has_batch_dim: bool = True) -> jax.Array:
        """Scale a residual stack by the *cached* LN scale of ``layer``'s
        input (activation_cache.py:656-735)."""
        if self.model.cfg.normalization_type not in ["LN", "LNPre"]:
            return residual_stack
        if not isinstance(pos_slice, Slice):
            pos_slice = Slice(pos_slice)
        if not isinstance(batch_slice, Slice):
            batch_slice = Slice(batch_slice)
        if layer is None or layer == -1:
            layer = self.model.cfg.n_layers

        if has_batch_dim:
            residual_stack = batch_slice.apply(residual_stack, dim=1)
        residual_stack = residual_stack - residual_stack.mean(axis=-1, keepdims=True)

        if layer == self.model.cfg.n_layers:
            scale = self["ln_final.hook_scale"]
        else:
            scale = self[f"blocks.{layer}.ln{2 if mlp_input else 1}.hook_scale"]
        scale = pos_slice.apply(scale, dim=-2)
        if self.has_batch_dim:
            scale = batch_slice.apply(scale)
        return residual_stack / scale

    def get_full_resid_decomposition(self, layer: Optional[int] = None,
                                     mlp_input: bool = False,
                                     expand_neurons: bool = True,
                                     apply_ln: bool = False,
                                     pos_slice: SliceInput = None,
                                     return_labels: bool = False):
        """Full decomposition into embed + pos_embed + heads (+neurons) +
        bias (activation_cache.py:737)."""
        if layer is None or layer == -1:
            layer = self.model.cfg.n_layers
        if not isinstance(pos_slice, Slice):
            pos_slice = Slice(pos_slice)
        head_stack, head_labels = self.stack_head_results(
            layer + (1 if mlp_input else 0), pos_slice=pos_slice,
            return_labels=True)
        labels = list(head_labels)
        components = [head_stack]
        if not self.model.cfg.attn_only and layer > 0:
            if expand_neurons:
                neuron_stack, neuron_labels = self.stack_neuron_results(
                    layer, pos_slice=pos_slice, return_labels=True)
                labels.extend(neuron_labels)
                components.append(neuron_stack)
            else:
                mlp_stack, mlp_labels = self.decompose_resid(
                    layer, mlp_input=mlp_input, pos_slice=pos_slice,
                    incl_embeds=False, mode="mlp", return_labels=True)
                labels.extend(mlp_labels)
                components.append(mlp_stack)
        if self.has_embed:
            labels.append("embed")
            components.append(pos_slice.apply(self["embed"], -2)[None])
        if self.has_pos_embed:
            labels.append("pos_embed")
            components.append(pos_slice.apply(self["pos_embed"], -2)[None])
        bias = self.model.accumulated_bias(layer, mlp_input,
                                           include_mlp_biases=expand_neurons)
        bias = jnp.broadcast_to(bias, (1,) + head_stack.shape[1:])
        labels.append("bias")
        components.append(bias)
        residual_stack = jnp.concatenate(components, axis=0)
        if apply_ln:
            residual_stack = self.apply_ln_to_stack(
                residual_stack, layer, pos_slice=pos_slice, mlp_input=mlp_input)
        return (residual_stack, labels) if return_labels else residual_stack
