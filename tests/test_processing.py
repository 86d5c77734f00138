"""Weight-processing equivalence: our jnp fold/center/refactor transforms
must match the reference's methods bit-for-bit (modulo fp error), and the
folded model must compute the same function as the unfolded one."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vit_prisma_tpu import HookedViT, ViTConfig
from vit_prisma_tpu.models.loading.processing import (
    center_writing_weights,
    fold_layer_norm,
    fold_value_biases,
    process_state_dict,
    refactor_factored_attn_matrices,
)
from vit_prisma_tpu.models.loading.state_dict import stack_params

from tests.reference_oracle import load_reference

CFG = ViTConfig(n_layers=2, d_model=16, d_head=4, n_heads=4, d_mlp=32,
                patch_size=4, image_size=16, n_classes=5, return_type="logits")


def ref_model_and_flat(jcfg, seed=0):
    import torch
    load_reference()
    from vit_prisma.models.base_vit import HookedViT as RefViT
    from vit_prisma.configs.HookedViTConfig import HookedViTConfig as RefCfg
    torch.manual_seed(seed)
    ref = RefViT(RefCfg(
        n_layers=jcfg.n_layers, d_model=jcfg.d_model, d_head=jcfg.d_head,
        d_mlp=jcfg.d_mlp, n_heads=jcfg.n_heads,
        activation_name=jcfg.activation_name, n_channels=jcfg.n_channels,
        patch_size=jcfg.patch_size, image_size=jcfg.image_size,
        n_classes=jcfg.n_classes, return_type=jcfg.return_type))
    ref.eval()
    # Randomize the LN weights/biases so folding is non-trivial.
    torch.manual_seed(seed + 1)
    with torch.no_grad():
        for name, p in ref.named_parameters():
            if ".ln" in name or name.startswith("ln_"):
                p.add_(torch.randn_like(p) * 0.3)
    flat = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    return ref, flat


def j(flat):
    return {k: jnp.asarray(v) for k, v in flat.items()}


def diff_dicts(ours, theirs, atol=1e-5, skip=()):
    for k, v in theirs.items():
        if k in skip:
            continue
        np.testing.assert_allclose(np.asarray(ours[k]), np.asarray(v),
                                   atol=atol, err_msg=f"mismatch at {k}")


@pytest.mark.parametrize("transform", ["fold_ln", "center", "fold_vb", "refactor"])
def test_transforms_match_reference(transform):
    import torch
    ref, flat = ref_model_and_flat(CFG)
    sd_torch = {k: v.clone() for k, v in ref.state_dict().items()}

    if transform == "fold_ln":
        out_ref = ref.fold_layer_norm(dict(sd_torch))
        ours = fold_layer_norm(j(flat), CFG)
        # Reference deletes folded LN keys; we set identity — compare the
        # surviving keys, and check ours are identity.
        diff_dicts(ours, out_ref)
        np.testing.assert_array_equal(np.asarray(ours["blocks.0.ln1.w"]),
                                      np.ones(CFG.d_model, np.float32))
    elif transform == "center":
        out_ref = ref.center_writing_weights(dict(sd_torch))
        diff_dicts(center_writing_weights(j(flat), CFG), out_ref)
    elif transform == "fold_vb":
        out_ref = ref.fold_value_biases(dict(sd_torch))
        diff_dicts(fold_value_biases(j(flat), CFG), out_ref)
    elif transform == "refactor":
        out_ref = ref.refactor_factored_attn_matrices(dict(sd_torch))
        # SVD factors have sign/rotation ambiguity; compare the invariant
        # products instead of raw factors.
        ours = refactor_factored_attn_matrices(j(flat), CFG)
        for l in range(CFG.n_layers):
            ov_ours = np.einsum("nij,njk->nik",
                                np.asarray(ours[f"blocks.{l}.attn.W_V"]),
                                np.asarray(ours[f"blocks.{l}.attn.W_O"]))
            ov_ref = np.einsum("nij,njk->nik",
                               out_ref[f"blocks.{l}.attn.W_V"].numpy(),
                               out_ref[f"blocks.{l}.attn.W_O"].numpy())
            np.testing.assert_allclose(ov_ours, ov_ref, atol=1e-4)
            np.testing.assert_allclose(
                np.asarray(ours[f"blocks.{l}.attn.b_O"]),
                out_ref[f"blocks.{l}.attn.b_O"].numpy(), atol=1e-5)


@pytest.mark.parametrize("refactor", [False, True])
def test_processing_preserves_function(refactor):
    """fold_ln + center + fold_value_biases (+ refactor) must not change the
    computed function of an LN model."""
    _, flat = ref_model_and_flat(CFG, seed=3)
    raw = HookedViT(CFG, params=stack_params(flat, CFG))
    processed_flat = process_state_dict(j(flat), CFG, refactor_factored=refactor)
    proc = HookedViT(CFG, params=stack_params(processed_flat, CFG))

    x = jax.random.uniform(jax.random.PRNGKey(9), (2, 3, 16, 16))
    out_raw = raw(x)
    out_proc = proc(x)
    np.testing.assert_allclose(np.asarray(out_raw), np.asarray(out_proc),
                               atol=2e-4)
    # resid stream values legitimately differ (centering); but patterns of
    # the first block must match since its input is identical
    _, c_raw = raw.run_with_cache(x, names_filter="blocks.0.attn.hook_pattern",
                                  return_cache_object=False)
    _, c_proc = proc.run_with_cache(x, names_filter="blocks.0.attn.hook_pattern",
                                    return_cache_object=False)
    np.testing.assert_allclose(np.asarray(c_raw["blocks.0.attn.hook_pattern"]),
                               np.asarray(c_proc["blocks.0.attn.hook_pattern"]),
                               atol=2e-4)


def test_fold_solu_ln():
    cfg = CFG.replace(activation_name="solu_ln")
    _, flat = ref_model_and_flat(cfg, seed=5)
    raw = HookedViT(cfg, params=stack_params(flat, cfg))
    proc = HookedViT(cfg, params=stack_params(
        process_state_dict(j(flat), cfg), cfg))
    x = jax.random.uniform(jax.random.PRNGKey(9), (2, 3, 16, 16))
    np.testing.assert_allclose(np.asarray(raw(x)), np.asarray(proc(x)), atol=2e-4)
