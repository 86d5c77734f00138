"""SAE eval suite + HookedSAEViT splicing tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vit_prisma_tpu import HookedViT, ViTConfig
from vit_prisma_tpu.models.sae_vit import HookedSAEViT
from vit_prisma_tpu.sae import SAERunnerConfig, SparseAutoencoder
from vit_prisma_tpu.sae.evals import (
    EvalConfig,
    evaluate,
    find_top_activations,
    get_heatmap,
    image_patch_heatmap,
    make_eval_step,
    make_replacement_hook,
    process_dataset,
    sample_features_from_bins,
    zero_ablate_hook,
)

VCFG = ViTConfig(n_layers=2, d_model=16, d_head=4, n_heads=4, d_mlp=32,
                 patch_size=4, image_size=8, n_classes=6,
                 return_type="class_logits")
SCFG = SAERunnerConfig(d_in=16, expansion_factor=4, hook_point_layer=1,
                       layer_subtype="hook_resid_post",
                       context_size=VCFG.n_tokens,
                       b_dec_init_method="zeros", log_to_wandb=False)


@pytest.fixture(scope="module")
def setup():
    model = HookedViT(VCFG, key=jax.random.PRNGKey(0))
    sae = SparseAutoencoder(SCFG, key=jax.random.PRNGKey(1))
    rng = np.random.default_rng(0)
    images = rng.normal(size=(48, 3, 8, 8)).astype(np.float32)
    labels = rng.integers(0, 6, size=(48,))
    class_emb = rng.normal(size=(6, 6)).astype(np.float32)  # logits space
    return model, sae, images, labels, class_emb


def batches(images, labels, bs=16):
    for i in range(0, len(images), bs):
        yield (images[i:i + bs], labels[i:i + bs],
               np.arange(i, i + len(images[i:i + bs])))


def test_eval_step_substitution_consistency(setup):
    model, sae, images, labels, class_emb = setup
    step = make_eval_step(model, sae)
    s = step(model.params, sae.params, jnp.asarray(images[:16]),
             jnp.asarray(labels[:16]), jnp.asarray(class_emb))
    # clean loss equals direct computation
    logits = model(jnp.asarray(images[:16])) @ class_emb.T
    logp = jax.nn.log_softmax(logits, -1)
    ce = -np.take_along_axis(np.asarray(logp), labels[:16][:, None], 1).mean()
    np.testing.assert_allclose(float(s.loss), ce, atol=1e-5)
    # substituted loss equals run_with_hooks with the replacement hook
    repl = make_replacement_hook(sae)
    emb = model.run_with_hooks(jnp.asarray(images[:16]),
                               fwd_hooks=[(SCFG.hook_point, repl)])
    logits_r = np.asarray(emb) @ class_emb.T
    logp_r = jax.nn.log_softmax(jnp.asarray(logits_r), -1)
    ce_r = -np.take_along_axis(np.asarray(logp_r), labels[:16][:, None], 1).mean()
    np.testing.assert_allclose(float(s.recons_loss), ce_r, atol=1e-5)
    # zero-ablated loss differs from clean
    assert abs(float(s.zero_abl_loss) - float(s.loss)) > 1e-6


def test_process_dataset_and_evaluate(setup, tmp_path):
    model, sae, images, labels, class_emb = setup
    cfg = EvalConfig(batch_size=16, eval_max=48, samples_per_bin=1,
                     max_images_per_feature=4, sae_path=str(tmp_path))
    stats = process_dataset(model, sae,
                            ((im, lb) for im, lb, _ in batches(images, labels)),
                            class_emb, cfg)
    for k in ("avg_loss", "avg_l0", "avg_l0_cls", "avg_l0_image",
              "avg_cos_sim", "ce_recovered", "alive_fraction"):
        assert np.isfinite(stats[k]), k
    assert stats["log_frequencies_per_token"].shape == (SCFG.d_sae,)

    full = evaluate(cfg, sae, model, lambda: batches(images, labels),
                    class_emb)
    assert (tmp_path / "eval_stats.json").exists()
    assert (tmp_path / "sparsity_TOTAL.npz").exists()
    assert "top_images_per_feature" in full


def test_find_top_activations(setup):
    model, sae, images, labels, _ = setup
    feature_ids = [0, 5, 17]
    tops = find_top_activations(batches(images, labels), model, sae,
                                feature_ids, top_k=4, max_samples=48)
    assert set(tops) == set(feature_ids)
    vals, idx = tops[5]
    assert len(vals) == 4 and len(idx) == 4
    assert all(0 <= i < 48 for i in idx)
    # values sorted descending
    assert all(vals[i] >= vals[i + 1] for i in range(3))


def test_heatmap(setup):
    model, sae, images, _, _ = setup
    acts = get_heatmap(images[0], model, sae, feature_id=3)
    assert acts.shape == (VCFG.n_tokens,)
    hm = image_patch_heatmap(acts, VCFG)
    assert hm.shape == (8, 8)


def test_hooked_sae_vit_splicing(setup):
    model, sae, images, _, _ = setup
    smodel = HookedSAEViT(VCFG, params=model.params)
    x = jnp.asarray(images[:8])
    clean = smodel(x)

    # run_with_saes substitutes the reconstruction
    out = smodel.run_with_saes(x, saes=[sae])
    assert not np.allclose(np.asarray(out), np.asarray(clean))
    assert len(smodel.acts_to_saes) == 0  # reset after

    # equivalent to a manual replacement hook
    repl = make_replacement_hook(sae)
    manual = smodel.run_with_hooks(x, fwd_hooks=[(SCFG.hook_point, repl)])
    np.testing.assert_allclose(np.asarray(out), np.asarray(manual), atol=1e-5)

    # use_error_term=True: output equals clean
    out_err = smodel.run_with_saes(x, saes=[sae], use_error_term=True)
    np.testing.assert_allclose(np.asarray(out_err), np.asarray(clean),
                               atol=1e-5)

    # run_with_cache_with_saes: SAE hook names replace the spliced point
    out2, cache = smodel.run_with_cache_with_saes(
        x, saes=[sae], return_cache_object=False)
    hp = SCFG.hook_point
    for suffix in ("hook_sae_in", "hook_hidden_pre", "hook_hidden_post",
                   "hook_sae_out"):
        assert f"{hp}.{suffix}" in cache, f"{hp}.{suffix} missing"
    assert hp not in cache
    assert cache[f"{hp}.hook_hidden_post"].shape == (8, VCFG.n_tokens, SCFG.d_sae)
    # downstream activations reflect the substitution
    np.testing.assert_allclose(np.asarray(out2), np.asarray(out), atol=1e-5)

    # persistent attach/reset
    smodel.add_sae(sae)
    assert len(smodel.acts_to_saes) == 1
    attached_out = smodel(x)
    np.testing.assert_allclose(np.asarray(attached_out), np.asarray(out), atol=1e-5)
    smodel.reset_saes()
    assert len(smodel.acts_to_saes) == 0
    np.testing.assert_allclose(np.asarray(smodel(x)), np.asarray(clean), atol=1e-6)
