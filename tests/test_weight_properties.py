"""Shapes of stacked weight properties (counterpart of
/root/reference/tests/test_weight_properties.py:28) plus FactoredMatrix and
ActivationCache analysis sanity checks."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vit_prisma_tpu import FactoredMatrix, HookedViT, ViTConfig


@pytest.fixture(scope="module")
def model():
    cfg = ViTConfig(n_layers=3, d_model=12, d_head=3, n_heads=4, d_mlp=24,
                    patch_size=4, image_size=8, n_classes=5, return_type="logits")
    return HookedViT(cfg, key=jax.random.PRNGKey(0))


def test_stacked_weight_shapes(model):
    cfg = model.cfg
    L, H, D, Dh, M = cfg.n_layers, cfg.n_heads, cfg.d_model, cfg.d_head, cfg.d_mlp
    assert model.W_Q.shape == (L, H, D, Dh)
    assert model.W_K.shape == (L, H, D, Dh)
    assert model.W_V.shape == (L, H, D, Dh)
    assert model.W_O.shape == (L, H, Dh, D)
    assert model.b_Q.shape == (L, H, Dh)
    assert model.b_O.shape == (L, D)
    assert model.W_in.shape == (L, D, M)
    assert model.W_out.shape == (L, M, D)
    assert model.b_in.shape == (L, M)
    assert model.b_out.shape == (L, D)
    assert model.W_pos.shape == (cfg.n_tokens, D)
    assert model.W_H.shape == (D, cfg.n_classes)


def test_ov_qk_factored(model):
    cfg = model.cfg
    assert model.OV.shape == (cfg.n_layers, cfg.n_heads, cfg.d_model, cfg.d_model)
    assert model.QK.shape == (cfg.n_layers, cfg.n_heads, cfg.d_model, cfg.d_model)


def test_factored_matrix_svd_reconstructs():
    key = jax.random.PRNGKey(3)
    A = jax.random.normal(key, (7, 4))
    B = jax.random.normal(jax.random.fold_in(key, 1), (4, 9))
    fm = FactoredMatrix(A, B)
    U, S, Vh = fm.svd()
    recon = U @ jnp.diag(S) @ Vh.T
    np.testing.assert_allclose(np.asarray(recon), np.asarray(A @ B), atol=1e-5)
    np.testing.assert_allclose(float(fm.norm()),
                               float(jnp.linalg.norm(A @ B)), atol=1e-5)


def test_factored_matrix_ops():
    key = jax.random.PRNGKey(4)
    A = jax.random.normal(key, (2, 5, 3))
    B = jax.random.normal(jax.random.fold_in(key, 1), (2, 3, 5))
    fm = FactoredMatrix(A, B)
    assert fm.shape == (2, 5, 5)
    # matmul with vector collapses
    v = jax.random.normal(jax.random.fold_in(key, 2), (5,))
    out = fm @ v
    np.testing.assert_allclose(np.asarray(out), np.asarray(fm.AB @ v), atol=1e-5)
    # scalar mul distributes
    np.testing.assert_allclose(np.asarray((2.0 * fm).AB),
                               2.0 * np.asarray(fm.AB), atol=1e-6)
    # transpose
    np.testing.assert_allclose(np.asarray(fm.T.AB),
                               np.asarray(jnp.swapaxes(fm.AB, -1, -2)), atol=1e-6)
    # leading-dim indexing
    np.testing.assert_allclose(np.asarray(fm[0].AB), np.asarray(fm.AB[0]), atol=1e-6)
    # even factorization preserves the product
    np.testing.assert_allclose(np.asarray(fm.make_even().AB),
                               np.asarray(fm.AB), atol=1e-4)


def test_activation_cache_analyses(model):
    cfg = model.cfg
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 3, 8, 8))
    _, cache = model.run_with_cache(x)
    T = cfg.n_tokens

    accum, labels = cache.accumulated_resid(return_labels=True, apply_ln=True)
    assert accum.shape == (cfg.n_layers + 1, 2, T, cfg.d_model)
    assert labels[0] == "0_pre" and labels[-1] == "final_post"

    heads, hlabels = cache.stack_head_results(return_labels=True,
                                              incl_remainder=True)
    assert heads.shape == (cfg.n_layers * cfg.n_heads + 1, 2, T, cfg.d_model)
    # head stack + remainder == final resid
    resid_final = cache["blocks.2.hook_resid_post"]
    np.testing.assert_allclose(np.asarray(heads.sum(0)), np.asarray(resid_final),
                               atol=1e-4)

    stacked = cache.stack_activation("resid_post")
    assert stacked.shape == (cfg.n_layers, 2, T, cfg.d_model)

    neuron = cache.get_neuron_results(0)
    assert neuron.shape == (2, T, cfg.d_mlp, cfg.d_model)
    # neuron results sum to mlp_out minus bias
    mlp_out = cache["blocks.0.hook_mlp_out"]
    np.testing.assert_allclose(
        np.asarray(neuron.sum(-2) + model.b_out[0]), np.asarray(mlp_out),
        atol=1e-4)


def test_decompose_resid_no_cls():
    # hook_embed fires before the CLS concat, so embed-inclusive
    # decompositions only type-check for use_cls_token=False models — same
    # behavior as the reference (base_vit.py:169-175, activation_cache.py:294).
    cfg = ViTConfig(n_layers=2, d_model=12, d_head=3, n_heads=4, d_mlp=24,
                    patch_size=4, image_size=8, n_classes=5,
                    use_cls_token=False, return_type="logits",
                    classification_type="gaap")
    model = HookedViT(cfg, key=jax.random.PRNGKey(2))
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 3, 8, 8))
    _, cache = model.run_with_cache(x)
    resid_final = cache["blocks.1.hook_resid_post"]

    decomp, dlabels = cache.decompose_resid(return_labels=True)
    assert decomp.shape[0] == 2 + 2 * cfg.n_layers
    assert dlabels[:2] == ["embed", "pos_embed"]
    np.testing.assert_allclose(np.asarray(decomp.sum(0)), np.asarray(resid_final),
                               atol=1e-4)

    full, flabels = cache.get_full_resid_decomposition(return_labels=True)
    np.testing.assert_allclose(np.asarray(full.sum(0)), np.asarray(resid_final),
                               atol=1e-3)
    assert flabels[-1] == "bias"


def test_cache_shorthand_indexing(model):
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 3, 8, 8))
    _, cache = model.run_with_cache(x)
    np.testing.assert_array_equal(np.asarray(cache[("resid_pre", 0)]),
                                  np.asarray(cache["blocks.0.hook_resid_pre"]))
    np.testing.assert_array_equal(np.asarray(cache[("pattern", -1)]),
                                  np.asarray(cache["blocks.2.attn.hook_pattern"]))
    np.testing.assert_array_equal(np.asarray(cache["embed"]),
                                  np.asarray(cache["hook_embed"]))
    np.testing.assert_array_equal(np.asarray(cache[("scale", 1, "ln2")]),
                                  np.asarray(cache["blocks.1.ln2.hook_scale"]))
