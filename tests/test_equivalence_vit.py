"""Tier-2 numerics gate: per-hook-name equivalence of the JAX HookedViT
against the PyTorch reference implementation, loaded as an oracle from
/root/reference (no network, no copied code).

Pattern mirrors the reference's own integration tests
(/root/reference/tests/models/test_loading_all_models.py:98): identical
weights + identical input => every cache entry and the output must agree to
atol 1e-4."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vit_prisma_tpu import HookedViT, ViTConfig
from vit_prisma_tpu.models.loading.state_dict import stack_params

from tests.reference_oracle import load_reference

ATOL = 1e-4


def make_pair(jcfg: ViTConfig, seed=0):
    """Build the torch reference model and a weight-identical JAX model."""
    import torch
    vp = load_reference()
    from vit_prisma.models.base_vit import HookedViT as RefViT
    from vit_prisma.configs.HookedViTConfig import HookedViTConfig as RefCfg

    torch.manual_seed(seed)
    rcfg = RefCfg(
        n_layers=jcfg.n_layers, d_model=jcfg.d_model, d_head=jcfg.d_head,
        d_mlp=jcfg.d_mlp, n_heads=jcfg.n_heads,
        activation_name=jcfg.activation_name,
        normalization_type=jcfg.normalization_type,
        layer_norm_pre=jcfg.layer_norm_pre,
        use_bert_block=jcfg.use_bert_block,
        use_cls_token=jcfg.use_cls_token,
        attn_only=jcfg.attn_only,
        use_attn_result=jcfg.use_attn_result,
        use_split_qkv_input=jcfg.use_split_qkv_input,
        use_hook_mlp_in=jcfg.use_hook_mlp_in,
        use_attn_in=jcfg.use_attn_in,
        n_channels=jcfg.n_channels, patch_size=jcfg.patch_size,
        image_size=jcfg.image_size, n_classes=jcfg.n_classes,
        classification_type=jcfg.classification_type,
        return_type=jcfg.return_type,
        normalize_output=jcfg.normalize_output,
        model_name=jcfg.model_name,
        eps=jcfg.eps,
    )
    ref = RefViT(rcfg)
    ref.eval()
    flat = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    model = HookedViT(jcfg, params=stack_params(flat, jcfg))
    return ref, model


def compare(jcfg, seed=0, batch=2):
    import torch
    ref, model = make_pair(jcfg, seed)
    torch.manual_seed(seed + 1)
    x_t = torch.randn(batch, jcfg.n_channels, jcfg.image_size, jcfg.image_size)
    x_j = jnp.asarray(x_t.numpy())

    with torch.no_grad():
        out_ref, cache_ref = ref.run_with_cache(x_t, return_cache_object=False)
    out, cache = model.run_with_cache(x_j, return_cache_object=False)

    assert list(cache.keys()) == list(cache_ref.keys()), (
        f"hook-name mismatch:\njax={list(cache.keys())}\nref={list(cache_ref.keys())}")
    np.testing.assert_allclose(np.asarray(out), out_ref.numpy(), atol=ATOL,
                               err_msg="output mismatch")
    for k in cache_ref:
        np.testing.assert_allclose(
            np.asarray(cache[k]), cache_ref[k].numpy(), atol=ATOL,
            err_msg=f"cache mismatch at {k}")


BASE = dict(n_layers=2, d_model=16, d_head=4, n_heads=4, d_mlp=32,
            patch_size=4, image_size=16, n_classes=5)

CONFIGS = {
    "vit_default": ViTConfig(**BASE, return_type="logits"),
    "solu_ln": ViTConfig(**BASE, activation_name="solu_ln", return_type="logits"),
    "clip_like": ViTConfig(**BASE, layer_norm_pre=True,
                           activation_name="quick_gelu", return_type="logits"),
    "bert_block": ViTConfig(**BASE, use_bert_block=True,
                            activation_name="gelu", return_type="logits"),
    "attn_only": ViTConfig(**BASE, attn_only=True, return_type="logits"),
    "gated_hooks": ViTConfig(**BASE, use_attn_result=True,
                             use_split_qkv_input=True, use_hook_mlp_in=True,
                             use_attn_in=True, return_type="logits"),
    "gaap_normalized": ViTConfig(**BASE, classification_type="gaap",
                                 return_type="logits", normalize_output=True),
    "no_cls_token": ViTConfig(**BASE, use_cls_token=False, return_type="logits"),
    "pre_logits": ViTConfig(**BASE, return_type="pre_logits"),
    "lnpre_type": ViTConfig(**BASE, normalization_type="LNPre",
                            return_type="logits"),
    "gelu_new": ViTConfig(**BASE, activation_name="gelu_new", return_type="logits"),
    "relu": ViTConfig(**BASE, activation_name="relu", return_type="logits"),
}


@pytest.mark.parametrize("name", list(CONFIGS))
def test_equivalence(name):
    compare(CONFIGS[name], seed=hash(name) % 1000)


def test_stop_at_layer_equivalence():
    import torch
    jcfg = CONFIGS["vit_default"]
    ref, model = make_pair(jcfg, 7)
    torch.manual_seed(8)
    x_t = torch.randn(2, 3, 16, 16)
    x_j = jnp.asarray(x_t.numpy())
    with torch.no_grad():
        resid_ref = ref(x_t, stop_at_layer=1)
    resid = model(x_j, stop_at_layer=1)
    np.testing.assert_allclose(np.asarray(resid), resid_ref.numpy(), atol=ATOL)
