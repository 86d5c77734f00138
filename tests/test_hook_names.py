"""Golden hook-name contract test — mirrors
/root/reference/tests/test_cache_hook_names.py:23-51 (the de-facto spec of
the cache-key API surface, SURVEY.md §2.13)."""

import jax
import jax.numpy as jnp

from vit_prisma_tpu import HookedViT, ViTConfig, hook_names

ACT_NAMES_IN_CACHE = [
    "hook_embed",
    "hook_pos_embed",
    "hook_full_embed",
    "blocks.0.hook_resid_pre",
    "blocks.0.ln1.hook_scale",
    "blocks.0.ln1.hook_normalized",
    "blocks.0.attn.hook_q",
    "blocks.0.attn.hook_k",
    "blocks.0.attn.hook_v",
    "blocks.0.attn.hook_attn_scores",
    "blocks.0.attn.hook_pattern",
    "blocks.0.attn.hook_z",
    "blocks.0.hook_attn_out",
    "blocks.0.hook_resid_mid",
    "blocks.0.ln2.hook_scale",
    "blocks.0.ln2.hook_normalized",
    "blocks.0.mlp.hook_pre",
    "blocks.0.mlp.hook_mid",
    "blocks.0.mlp.ln.hook_scale",
    "blocks.0.mlp.ln.hook_normalized",
    "blocks.0.mlp.hook_post",
    "blocks.0.hook_mlp_out",
    "blocks.0.hook_resid_post",
    "ln_final.hook_scale",
    "ln_final.hook_normalized",
    "hook_ln_final",
    "hook_post_head_pre_normalize",
]


def make_model():
    cfg = ViTConfig(n_layers=1, d_model=8, d_head=8, d_mlp=8, n_heads=1,
                    patch_size=32, image_size=224, return_type="logits",
                    activation_name="solu_ln")
    return HookedViT(cfg, key=jax.random.PRNGKey(0))


def test_cache_hook_names():
    model = make_model()
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 3, 224, 224))
    _, cache = model.run_with_cache(x, return_cache_object=False)
    assert list(cache.keys()) == ACT_NAMES_IN_CACHE


def test_hook_names_enumeration_matches_fired():
    model = make_model()
    assert hook_names(model.cfg) == ACT_NAMES_IN_CACHE


def test_names_filter_forms():
    model = make_model()
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 3, 224, 224))
    # exact string
    _, cache = model.run_with_cache(x, names_filter="blocks.0.hook_resid_post",
                                    return_cache_object=False)
    assert list(cache.keys()) == ["blocks.0.hook_resid_post"]
    # list
    want = ["hook_embed", "blocks.0.attn.hook_pattern"]
    _, cache = model.run_with_cache(x, names_filter=want, return_cache_object=False)
    assert sorted(cache.keys()) == sorted(want)
    # predicate
    _, cache = model.run_with_cache(x, names_filter=lambda n: n.endswith("hook_scale"),
                                    return_cache_object=False)
    assert all(k.endswith("hook_scale") for k in cache)
    # ln1, ln2, mlp.ln (solu_ln), ln_final
    assert len(cache) == 4


def test_stop_at_layer():
    cfg = ViTConfig(n_layers=3, d_model=8, d_head=2, n_heads=4, d_mlp=16,
                    patch_size=4, image_size=8, n_classes=3, return_type="logits")
    model = HookedViT(cfg, key=jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 3, 8, 8))
    resid = model(x, stop_at_layer=1)
    assert resid.shape == (2, cfg.n_tokens, cfg.d_model)
    _, cache = model.run_with_cache(x, stop_at_layer=1, return_cache_object=False)
    assert "blocks.0.hook_resid_post" in cache
    assert not any(k.startswith("blocks.1") for k in cache)
    assert "hook_ln_final" not in cache
