"""Weight-processing transforms: LayerNorm folding, weight centering, value
bias folding, and QK/OV refactoring.

Pure jnp functions over the *flat* (reference-named) state dict, numerically
matching the reference methods on ``HookedViT``
(``/root/reference/src/vit_prisma/models/base_vit.py``):
``fold_layer_norm`` (:289-460), ``center_writing_weights`` (:462-496),
``fold_value_biases`` (:498-532), ``refactor_factored_attn_matrices``
(:534-623), orchestrated as in ``load_and_process_state_dict``
(``base_transformer.py:35-104``).

One deliberate difference: instead of *deleting* folded LN weights (the
reference relies on torch's ``strict=False`` loading to leave identity LN
modules behind), we set them to identity explicitly — same computation,
but the state dict stays total, which keeps the stacked parameter tree
shape-stable for jit/pjit.
"""

from __future__ import annotations

import logging
from typing import Any, Dict

import jax.numpy as jnp

from vit_prisma_tpu.configs.vit_config import ViTConfig
from vit_prisma_tpu.prisma.factored_matrix import FactoredMatrix

Flat = Dict[str, Any]


def fold_layer_norm(flat: Flat, cfg: ViTConfig, fold_biases: bool = True,
                    center_weights: bool = True) -> Flat:
    """Fold LN weight/bias into the next linear layer and center reading
    weights (base_vit.py:289-460).  Exact computation-preserving transform:
    ``LN(x) @ W = LNPre(x) @ (diag(w) @ W) + b @ W``."""
    sd = dict(flat)

    def identity_ln(prefix: str, length: int):
        sd[f"{prefix}.w"] = jnp.ones((length,), sd["head.W_H"].dtype)
        sd[f"{prefix}.b"] = jnp.zeros((length,), sd["head.W_H"].dtype)

    for l in range(cfg.n_layers):
        ln1_w = sd[f"blocks.{l}.ln1.w"]
        ln1_b = sd[f"blocks.{l}.ln1.b"]
        # Fold biases first (they depend on unfolded weights).
        if fold_biases:
            for m in ("Q", "K", "V"):
                sd[f"blocks.{l}.attn.b_{m}"] = sd[f"blocks.{l}.attn.b_{m}"] + (
                    sd[f"blocks.{l}.attn.W_{m}"] * ln1_b[None, :, None]).sum(-2)
        for m in ("Q", "K", "V"):
            W = sd[f"blocks.{l}.attn.W_{m}"] * ln1_w[None, :, None]
            if center_weights:
                # LNPre output is zero-mean, so the mean over d_model of any
                # reading weight is null space.
                W = W - W.mean(-2, keepdims=True)
            sd[f"blocks.{l}.attn.W_{m}"] = W
        identity_ln(f"blocks.{l}.ln1", cfg.d_model)

        if not cfg.attn_only:
            ln2_w = sd[f"blocks.{l}.ln2.w"]
            ln2_b = sd[f"blocks.{l}.ln2.b"]
            if fold_biases:
                sd[f"blocks.{l}.mlp.b_in"] = sd[f"blocks.{l}.mlp.b_in"] + (
                    sd[f"blocks.{l}.mlp.W_in"] * ln2_b[:, None]).sum(-2)
            W_in = sd[f"blocks.{l}.mlp.W_in"] * ln2_w[:, None]
            if center_weights:
                W_in = W_in - W_in.mean(-2, keepdims=True)
            sd[f"blocks.{l}.mlp.W_in"] = W_in
            identity_ln(f"blocks.{l}.ln2", cfg.d_model)

            if cfg.activation_name.startswith("solu"):
                # Fold the inner MLP LN into W_out (base_vit.py:413-444).
                mln_w = sd[f"blocks.{l}.mlp.ln.w"]
                mln_b = sd[f"blocks.{l}.mlp.ln.b"]
                if fold_biases:
                    sd[f"blocks.{l}.mlp.b_out"] = sd[f"blocks.{l}.mlp.b_out"] + (
                        sd[f"blocks.{l}.mlp.W_out"] * mln_b[:, None]).sum(-2)
                W_out = sd[f"blocks.{l}.mlp.W_out"] * mln_w[:, None]
                if center_weights:
                    W_out = W_out - W_out.mean(-2, keepdims=True)
                sd[f"blocks.{l}.mlp.W_out"] = W_out
                identity_ln(f"blocks.{l}.mlp.ln", cfg.d_mlp)

    # Fold ln_final into the head (base_vit.py:446-460).
    if fold_biases:
        sd["head.b_H"] = sd["head.b_H"] + (
            sd["head.W_H"] * sd["ln_final.b"][:, None]).sum(-2)
    W_H = sd["head.W_H"] * sd["ln_final.w"][:, None]
    if center_weights:
        W_H = W_H - W_H.mean(-2, keepdims=True)
    sd["head.W_H"] = W_H
    identity_ln("ln_final", cfg.d_model)
    return sd


def center_writing_weights(flat: Flat, cfg: ViTConfig) -> Flat:
    """Zero the d_model-mean of everything that writes to the residual
    stream (base_vit.py:462-496) — a no-op on the computation because every
    reader LNs first."""
    sd = dict(flat)
    sd["pos_embed.W_pos"] = sd["pos_embed.W_pos"] - \
        sd["pos_embed.W_pos"].mean(-1, keepdims=True)
    for l in range(cfg.n_layers):
        sd[f"blocks.{l}.attn.W_O"] = sd[f"blocks.{l}.attn.W_O"] - \
            sd[f"blocks.{l}.attn.W_O"].mean(-1, keepdims=True)
        sd[f"blocks.{l}.attn.b_O"] = sd[f"blocks.{l}.attn.b_O"] - \
            sd[f"blocks.{l}.attn.b_O"].mean()
        if not cfg.attn_only:
            sd[f"blocks.{l}.mlp.W_out"] = sd[f"blocks.{l}.mlp.W_out"] - \
                sd[f"blocks.{l}.mlp.W_out"].mean(-1, keepdims=True)
            sd[f"blocks.{l}.mlp.b_out"] = sd[f"blocks.{l}.mlp.b_out"] - \
                sd[f"blocks.{l}.mlp.b_out"].mean()
    return sd


def fold_value_biases(flat: Flat, cfg: ViTConfig) -> Flat:
    """b_O += sum_head(b_V @ W_O); b_V = 0 (base_vit.py:498-532).  Exact
    because attention patterns sum to 1."""
    sd = dict(flat)
    for l in range(cfg.n_layers):
        b_V = sd[f"blocks.{l}.attn.b_V"]       # [head, d_head]
        W_O = sd[f"blocks.{l}.attn.W_O"]       # [head, d_head, d_model]
        sd[f"blocks.{l}.attn.b_O"] = sd[f"blocks.{l}.attn.b_O"] + \
            (b_V[:, :, None] * W_O).sum((0, 1))
        sd[f"blocks.{l}.attn.b_V"] = jnp.zeros_like(b_V)
    return sd


def refactor_factored_attn_matrices(flat: Flat, cfg: ViTConfig) -> Flat:
    """SVD-even refactor of the QK and OV circuits (base_vit.py:534-623):
    W_V = U·S, W_O = Vhᵀ (rotation), W_Q/W_K split S evenly; biases folded
    through via the d_model+1 trick for QK."""
    sd = dict(flat)
    for l in range(cfg.n_layers):
        W_Q_eff = jnp.concatenate(
            [sd[f"blocks.{l}.attn.W_Q"], sd[f"blocks.{l}.attn.b_Q"][:, None, :]],
            axis=1)
        W_K_eff = jnp.concatenate(
            [sd[f"blocks.{l}.attn.W_K"], sd[f"blocks.{l}.attn.b_K"][:, None, :]],
            axis=1)
        W_Q_eff_even, W_K_eff_even_T = FactoredMatrix(
            W_Q_eff, jnp.swapaxes(W_K_eff, -1, -2)).make_even().pair
        W_K_eff_even = jnp.swapaxes(W_K_eff_even_T, -1, -2)
        sd[f"blocks.{l}.attn.W_Q"] = W_Q_eff_even[:, :-1, :]
        sd[f"blocks.{l}.attn.b_Q"] = W_Q_eff_even[:, -1, :]
        sd[f"blocks.{l}.attn.W_K"] = W_K_eff_even[:, :-1, :]
        sd[f"blocks.{l}.attn.b_K"] = W_K_eff_even[:, -1, :]

        W_V = sd[f"blocks.{l}.attn.W_V"]
        W_O = sd[f"blocks.{l}.attn.W_O"]
        b_V = sd[f"blocks.{l}.attn.b_V"]
        b_O = sd[f"blocks.{l}.attn.b_O"]
        sd[f"blocks.{l}.attn.b_O"] = b_O + jnp.einsum("nh,nhd->d", b_V, W_O)
        sd[f"blocks.{l}.attn.b_V"] = jnp.zeros_like(b_V)

        U, S, Vh = FactoredMatrix(W_V, W_O).svd()
        sd[f"blocks.{l}.attn.W_V"] = U * S[..., None, :]
        sd[f"blocks.{l}.attn.W_O"] = jnp.swapaxes(Vh, -1, -2)
    return sd


def process_state_dict(flat: Flat, cfg: ViTConfig, fold_ln: bool = True,
                       center_writing: bool = True,
                       fold_value_biases_flag: bool = True,
                       refactor_factored: bool = False) -> Flat:
    """Orchestration mirroring ``load_and_process_state_dict``
    (base_transformer.py:35-104)."""
    sd = dict(flat)
    if fold_ln:
        if cfg.normalization_type in ("LN", "LNPre"):
            sd = fold_layer_norm(sd, cfg)
        else:
            logging.warning("No LayerNorm to fold; skipping")
    if center_writing:
        if cfg.normalization_type not in ("LN", "LNPre"):
            logging.warning("Not using LayerNorm; skipping weight centering")
        else:
            sd = center_writing_weights(sd, cfg)
    if fold_value_biases_flag:
        sd = fold_value_biases(sd, cfg)
    if refactor_factored:
        sd = refactor_factored_attn_matrices(sd, cfg)
    return sd
