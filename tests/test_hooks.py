"""Intervention-hook semantics (functional counterpart of
/root/reference/tests/test_hooks.py): ablation hooks change the output,
hooks compose in order, predicates select hook points, interventions combine
with caching, and the cache sees post-edit values."""

import numpy as np
import jax
import jax.numpy as jnp

from vit_prisma_tpu import HookedViT, ViTConfig, get_act_name


def make_model(**kw):
    cfg = ViTConfig(n_layers=2, d_model=8, d_head=2, n_heads=4, d_mlp=16,
                    patch_size=4, image_size=8, n_classes=3,
                    return_type="logits", **kw)
    return HookedViT(cfg, key=jax.random.PRNGKey(0))


def zero_ablate(value, hook):
    return jnp.zeros_like(value)


def test_run_with_hooks_changes_output():
    model = make_model()
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 3, 8, 8))
    clean = model(x)
    ablated = model.run_with_hooks(
        x, fwd_hooks=[(get_act_name("pattern", 0), zero_ablate)])
    assert not np.allclose(np.asarray(clean), np.asarray(ablated))


def test_hook_is_pure_and_repeatable():
    model = make_model()
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 3, 8, 8))
    a = model.run_with_hooks(x, fwd_hooks=[("blocks.0.hook_mlp_out", zero_ablate)])
    b = model.run_with_hooks(x, fwd_hooks=[("blocks.0.hook_mlp_out", zero_ablate)])
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # and the clean run is unaffected afterwards (no global state)
    clean1 = model(x)
    clean2 = model(x)
    np.testing.assert_array_equal(np.asarray(clean1), np.asarray(clean2))


def test_hooks_compose_in_order():
    model = make_model()
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 3, 8, 8))
    name = "blocks.0.hook_resid_mid"

    def add_one(value, hook):
        return value + 1.0

    def double(value, hook):
        return value * 2.0

    _, cache_ab = model.run_with_cache(
        x, names_filter=name, fwd_hooks=[(name, add_one), (name, double)],
        return_cache_object=False)
    _, cache_ba = model.run_with_cache(
        x, names_filter=name, fwd_hooks=[(name, double), (name, add_one)],
        return_cache_object=False)
    _, clean = model.run_with_cache(x, names_filter=name,
                                    return_cache_object=False)
    np.testing.assert_allclose(np.asarray(cache_ab[name]),
                               (np.asarray(clean[name]) + 1.0) * 2.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(cache_ba[name]),
                               np.asarray(clean[name]) * 2.0 + 1.0, atol=1e-6)


def test_predicate_hook_hits_all_layers():
    model = make_model()
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 3, 8, 8))
    hits = []

    def spy(value, hook):
        hits.append(hook.name)
        return value

    model.run_with_hooks(
        x, fwd_hooks=[(lambda n: n.endswith("hook_pattern"), spy)])
    assert sorted(hits) == ["blocks.0.attn.hook_pattern",
                            "blocks.1.attn.hook_pattern"]


def test_cache_sees_post_edit_value():
    model = make_model()
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 3, 8, 8))
    name = "blocks.1.hook_attn_out"
    _, cache = model.run_with_cache(
        x, names_filter=name, fwd_hooks=[(name, zero_ablate)],
        return_cache_object=False)
    np.testing.assert_array_equal(np.asarray(cache[name]),
                                  np.zeros_like(cache[name]))


def test_gated_hook_shapes():
    model = make_model(use_attn_result=True, use_split_qkv_input=True,
                       use_attn_in=True, use_hook_mlp_in=True)
    cfg = model.cfg
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 3, 8, 8))
    _, cache = model.run_with_cache(x, return_cache_object=False)
    T = cfg.n_tokens
    assert cache["blocks.0.attn.hook_result"].shape == (2, T, cfg.n_heads, cfg.d_model)
    assert cache["blocks.0.hook_q_input"].shape == (2, T, cfg.n_heads, cfg.d_model)
    assert cache["blocks.0.hook_attn_in"].shape == (2, T, cfg.n_heads, cfg.d_model)
    assert cache["blocks.0.hook_mlp_in"].shape == (2, T, cfg.d_model)


def test_head_ablation_via_pattern_slice():
    """Ablate one head's pattern; other heads unaffected in hook_z."""
    model = make_model()
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 3, 8, 8))

    def ablate_head_0(pattern, hook):
        return pattern.at[:, 0].set(0.0)

    _, clean = model.run_with_cache(x, names_filter="blocks.0.attn.hook_z",
                                    return_cache_object=False)
    _, abl = model.run_with_cache(
        x, names_filter="blocks.0.attn.hook_z",
        fwd_hooks=[("blocks.0.attn.hook_pattern", ablate_head_0)],
        return_cache_object=False)
    z_clean = np.asarray(clean["blocks.0.attn.hook_z"])
    z_abl = np.asarray(abl["blocks.0.attn.hook_z"])
    np.testing.assert_array_equal(z_abl[:, :, 0], np.zeros_like(z_abl[:, :, 0]))
    np.testing.assert_allclose(z_abl[:, :, 1:], z_clean[:, :, 1:], atol=1e-6)


def test_remove_batch_dim_requires_batch_one():
    import jax
    import pytest
    from vit_prisma_tpu import HookedViT, ViTConfig

    cfg = ViTConfig(n_layers=1, d_model=32, d_head=8, n_heads=4, d_mlp=64,
                    patch_size=8, image_size=16, n_classes=5,
                    return_type="class_logits")
    model = HookedViT(cfg, key=jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 3, 16, 16))
    with pytest.raises(AssertionError, match="batch size 1"):
        model.run_with_cache(x, remove_batch_dim=True)
    out, cache = model.run_with_cache(x[:1], remove_batch_dim=True)
    assert cache["blocks.0.hook_resid_post"].ndim == 2  # batch stripped
