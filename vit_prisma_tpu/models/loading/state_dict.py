"""State-dict round trip between the reference's flat naming scheme
(``blocks.{l}.attn.W_Q`` …, see /root/reference/src/vit_prisma/models/base_vit.py
module tree) and our stacked-by-layer parameter pytree.

The flat form is the *interchange format*: weight converters emit it, the
LN-folding transforms operate on it, checkpoints store it, and equivalence
tests diff it against the PyTorch reference.  ``stack_params`` packs it into
the stacked tree the jitted forward consumes.
"""

from __future__ import annotations

from typing import Any, Dict

import jax.numpy as jnp
import numpy as np

from vit_prisma_tpu.configs.vit_config import ViTConfig

Flat = Dict[str, Any]


def _asarray(v, dtype):
    if hasattr(v, "detach"):  # torch tensor without importing torch
        v = v.detach().cpu().numpy()
    return jnp.asarray(np.asarray(v), dtype=dtype)


def stack_params(flat: Flat, cfg: ViTConfig) -> Dict[str, Any]:
    """Flat reference-named state dict -> stacked parameter tree.

    Accepts either our matmul-layout ``embed.W [C*P*P, d_model]`` or the
    reference's conv layout ``embed.proj.weight [d_model, C, P, P]``
    (flattened in torch's (C, Ph, Pw) order, patch_embedding.py:14-32).
    """
    dt = cfg.jax_dtype
    g = lambda k: _asarray(flat[k], dt)

    params: Dict[str, Any] = {}
    if cfg.use_cls_token and "cls_token" in flat:
        params["cls_token"] = g("cls_token").reshape(1, 1, cfg.d_model)

    if "embed.proj.weight" in flat:
        w = _asarray(flat["embed.proj.weight"], dt)  # [d_model, C, (D,) P, P]
        params["embed"] = {"W": w.reshape(cfg.d_model, -1).T,
                           "b": g("embed.proj.bias")}
    else:
        params["embed"] = {"W": g("embed.W"), "b": g("embed.b")}

    params["pos_embed"] = {"W_pos": g("pos_embed.W_pos")}

    blocks: Dict[str, Any] = {}

    def stack(names_fmt: str):
        return jnp.stack([g(names_fmt.format(l=l)) for l in range(cfg.n_layers)])

    blocks["attn"] = {k: stack(f"blocks.{{l}}.attn.{k}")
                      for k in ["W_Q", "W_K", "W_V", "W_O", "b_Q", "b_K", "b_V", "b_O"]}
    if cfg.normalization_type == "LN":
        blocks["ln1"] = {"w": stack("blocks.{l}.ln1.w"), "b": stack("blocks.{l}.ln1.b")}
    if not cfg.attn_only:
        blocks["mlp"] = {k: stack(f"blocks.{{l}}.mlp.{k}")
                         for k in ["W_in", "b_in", "W_out", "b_out"]}
        if cfg.normalization_type == "LN":
            blocks["ln2"] = {"w": stack("blocks.{l}.ln2.w"), "b": stack("blocks.{l}.ln2.b")}
        if cfg.activation_name == "solu_ln" and cfg.normalization_type == "LN":
            blocks["mlp"]["ln"] = {"w": stack("blocks.{l}.mlp.ln.w"),
                                   "b": stack("blocks.{l}.mlp.ln.b")}
    params["blocks"] = blocks

    if cfg.layer_norm_pre and cfg.normalization_type == "LN":
        params["ln_pre"] = {"w": g("ln_pre.w"), "b": g("ln_pre.b")}
    if cfg.normalization_type == "LN":
        params["ln_final"] = {"w": g("ln_final.w"), "b": g("ln_final.b")}
    if "head.W_H" in flat:
        params["head"] = {"W_H": g("head.W_H"), "b_H": g("head.b_H")}
    else:
        params["head"] = {"W_H": jnp.zeros((cfg.d_model, cfg.n_classes), dt),
                          "b_H": jnp.zeros((cfg.n_classes,), dt)}
    return params


def unstack_params(params: Dict[str, Any], cfg: ViTConfig) -> Flat:
    """Stacked tree -> flat reference-named state dict (jnp leaves)."""
    flat: Flat = {}
    if "cls_token" in params:
        flat["cls_token"] = params["cls_token"]
    # Emit the conv layout for drop-in parity with reference state dicts.
    P, C = cfg.patch_size, cfg.n_channels
    if cfg.is_video_transformer:
        flat["embed.proj.weight"] = params["embed"]["W"].T.reshape(
            cfg.d_model, C, cfg.video_tubelet_depth, P, P)
    else:
        flat["embed.proj.weight"] = params["embed"]["W"].T.reshape(cfg.d_model, C, P, P)
    flat["embed.proj.bias"] = params["embed"]["b"]
    flat["pos_embed.W_pos"] = params["pos_embed"]["W_pos"]

    blocks = params["blocks"]
    for l in range(cfg.n_layers):
        for k, v in blocks["attn"].items():
            flat[f"blocks.{l}.attn.{k}"] = v[l]
        if "ln1" in blocks:
            flat[f"blocks.{l}.ln1.w"] = blocks["ln1"]["w"][l]
            flat[f"blocks.{l}.ln1.b"] = blocks["ln1"]["b"][l]
        if "mlp" in blocks:
            for k in ["W_in", "b_in", "W_out", "b_out"]:
                flat[f"blocks.{l}.mlp.{k}"] = blocks["mlp"][k][l]
            if "ln" in blocks["mlp"]:
                flat[f"blocks.{l}.mlp.ln.w"] = blocks["mlp"]["ln"]["w"][l]
                flat[f"blocks.{l}.mlp.ln.b"] = blocks["mlp"]["ln"]["b"][l]
        if "ln2" in blocks:
            flat[f"blocks.{l}.ln2.w"] = blocks["ln2"]["w"][l]
            flat[f"blocks.{l}.ln2.b"] = blocks["ln2"]["b"][l]

    if "ln_pre" in params:
        flat["ln_pre.w"] = params["ln_pre"]["w"]
        flat["ln_pre.b"] = params["ln_pre"]["b"]
    if "ln_final" in params:
        flat["ln_final.w"] = params["ln_final"]["w"]
        flat["ln_final.b"] = params["ln_final"]["b"]
    flat["head.W_H"] = params["head"]["W_H"]
    flat["head.b_H"] = params["head"]["b_H"]
    return flat
