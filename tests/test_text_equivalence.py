"""HookedTextTransformer vs the reference text transformer (causal mask,
EOT pooling), loaded with identical weights."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vit_prisma_tpu.configs.vit_config import TextTransformerConfig
from vit_prisma_tpu.models.text import HookedTextTransformer, stack_text_params

from tests.reference_oracle import load_reference

ATOL = 1e-4


def make_pair(seed=0):
    import torch
    load_reference()
    from vit_prisma.models.base_text_transformer import (
        HookedTextTransformer as RefText,
    )
    from vit_prisma.configs.HookedTextTransformerConfig import (
        HookedTextTransformerConfig as RefCfg,
    )
    torch.manual_seed(seed)
    rcfg = RefCfg(n_layers=2, d_model=16, d_head=4, d_mlp=32, n_heads=4,
                  context_length=10, vocab_size=50, n_classes=8,
                  activation_name="quick_gelu", eps=1e-5,
                  return_type="class_logits", normalize_output=False)
    ref = RefText(rcfg)
    ref.eval()

    jcfg = TextTransformerConfig(
        n_layers=2, d_model=16, d_head=4, d_mlp=32, n_heads=4,
        context_length=10, vocab_size=50, n_classes=8,
        activation_name="quick_gelu", eps=1e-5,
        return_type="class_logits", normalize_output=False,
        causal_attention=True)

    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    flat = {
        "token_embed.W_E": sd["token_embed.weight"],
        "pos_embed.W_pos": sd["pos_embed"],
        "ln_final.w": sd["ln_final.w"], "ln_final.b": sd["ln_final.b"],
        "head.W_H": sd["head.W_H"], "head.b_H": sd["head.b_H"],
    }
    for l in range(2):
        for k in ["attn.W_Q", "attn.W_K", "attn.W_V", "attn.W_O",
                  "attn.b_Q", "attn.b_K", "attn.b_V", "attn.b_O",
                  "mlp.W_in", "mlp.b_in", "mlp.W_out", "mlp.b_out",
                  "ln1.w", "ln1.b", "ln2.w", "ln2.b"]:
            flat[f"blocks.{l}.{k}"] = sd[f"blocks.{l}.{k}"]
    model = HookedTextTransformer(jcfg, params=stack_text_params(flat, jcfg))
    return ref, model


def test_text_forward_matches_reference():
    import torch
    ref, model = make_pair()
    torch.manual_seed(1)
    toks = torch.randint(1, 49, (3, 10))
    toks[:, -1] = 49  # EOT = max id -> argmax pooling picks last position
    with torch.no_grad():
        out_ref = ref(toks)
    out = model(jnp.asarray(toks.numpy()))
    np.testing.assert_allclose(np.asarray(out), out_ref.numpy(), atol=ATOL)


def test_text_cache_matches_reference():
    import torch
    ref, model = make_pair(3)
    torch.manual_seed(4)
    toks = torch.randint(1, 49, (2, 10))
    toks[:, -1] = 49
    with torch.no_grad():
        _, cache_ref = ref.run_with_cache(toks, return_cache_object=False)
    _, cache = model.run_with_cache(jnp.asarray(toks.numpy()),
                                    return_cache_object=False)
    # Reference creates an (unused) ln_pre module whose hooks never fire in
    # the text forward; our enumeration doesn't include them.  Compare the
    # intersection plus assert our keys are a subset relationship.
    ref_keys = [k for k in cache_ref if not k.startswith("ln_pre")]
    assert set(cache.keys()) == set(ref_keys)
    for k in ref_keys:
        np.testing.assert_allclose(np.asarray(cache[k]),
                                   cache_ref[k].numpy(), atol=ATOL,
                                   err_msg=f"mismatch at {k}")


def test_text_causal_mask_blocks_future():
    _, model = make_pair(5)
    toks = np.full((1, 10), 7, np.int32)
    toks[0, -1] = 49
    _, cache = model.run_with_cache(jnp.asarray(toks),
                                    names_filter="blocks.0.attn.hook_pattern",
                                    return_cache_object=False)
    pattern = np.asarray(cache["blocks.0.attn.hook_pattern"])[0, 0]
    upper = np.triu(np.ones_like(pattern), k=1)
    assert np.abs(pattern * upper).max() < 1e-7
