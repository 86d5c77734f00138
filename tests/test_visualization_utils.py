"""Visualization data-prep, JS viewer, topk kernel (interpret), misc utils."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vit_prisma_tpu import HookedViT, ViTConfig
from vit_prisma_tpu.ops.topk import kth_value, topk_mask_activation
from vit_prisma_tpu.sae.sae import topk_activation
from vit_prisma_tpu.utils.tutorial_utils import calculate_clean_accuracy
from vit_prisma_tpu.utils.wandb_utils import dataclass_to_dict, update_dataclass_from_dict
from vit_prisma_tpu.visualization import (
    denormalize_image,
    patch_heatmap_overlay,
    plot_javascript,
    prepare_attn_grid_data,
)


def test_prepare_attn_grid_data():
    acts = np.random.default_rng(0).random((2 * 3, 5, 5)).astype(np.float32)
    data, vmin, vmax = prepare_attn_grid_data(acts, 2, 3,
                                              global_normalize=True)
    assert data.shape == (6, 5, 5)
    assert vmin == -1.0 and vmax == 1.0
    np.testing.assert_allclose(data.min(), -1, atol=1e-6)
    np.testing.assert_allclose(data.max(), 1, atol=1e-6)
    # 4D input accepted
    data2, _, _ = prepare_attn_grid_data(acts.reshape(2, 3, 5, 5), 2, 3,
                                         log_transform=True)
    assert data2.shape == (6, 5, 5)


def test_js_viewer_html():
    attn = np.random.default_rng(1).random((2, 4, 10, 10)).astype(np.float32)
    img = np.random.default_rng(2).random((3, 12, 12)).astype(np.float32)
    html = plot_javascript(attn, img, has_cls=True)
    assert html.startswith("<!DOCTYPE html>")
    assert '"n_layers": 2' in html and '"n_heads": 4' in html
    assert "drawAttn" in html


def test_heatmap_and_denorm():
    hm = patch_heatmap_overlay([1, 2, 3, 4], image_size=8, patch_size=4)
    assert hm.shape == (8, 8)
    assert hm[0, 0] == 1 and hm[7, 7] == 4
    img = denormalize_image(np.zeros((3, 4, 4), np.float32))
    assert img.shape == (4, 4, 3)


def test_kth_value_interpret_matches_sort():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(16, 384)).astype(np.float32))
    t = kth_value(x, 16, interpret=True)
    ref = -jnp.sort(-x, axis=1)[:, 15:16]
    np.testing.assert_array_equal(np.asarray(t), np.asarray(ref))
    out = topk_mask_activation(x, 16)
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(topk_activation(x, 16)))


def test_topk_mask_gradient_parity():
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(4, 128)).astype(np.float32))
    g1 = jax.grad(lambda x: (topk_mask_activation(x, 8) ** 2).sum())(x)
    g2 = jax.grad(lambda x: (topk_activation(x, 8) ** 2).sum())(x)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2))


def test_clean_accuracy_and_wandb_utils():
    cfg = ViTConfig(n_layers=1, d_model=8, d_head=2, n_heads=4, d_mlp=16,
                    patch_size=4, image_size=8, n_classes=3,
                    return_type="logits")
    model = HookedViT(cfg, key=jax.random.PRNGKey(0))
    images = np.random.default_rng(0).normal(size=(8, 3, 8, 8)).astype(np.float32)
    labels = np.zeros(8, np.int64)
    acc = calculate_clean_accuracy(model, [(images, labels)])
    assert 0.0 <= acc <= 1.0

    d = dataclass_to_dict(cfg)
    assert d["n_layers"] == 1
    cfg2 = update_dataclass_from_dict(cfg, {"n_layers": 5, "bogus": 1})
    assert cfg2.n_layers == 5 and cfg.n_layers == 1  # frozen -> replaced copy


def test_sparsity_dashboard(tmp_path):
    """visualize_sparsities writes the reference's figure set
    (evals.py:752-801) and the cosine-sim stats are correct."""
    import numpy as np
    from vit_prisma_tpu.visualization import (default_frequency_conditions,
                                              rare_direction_cosine_sims,
                                              visualize_sparsities)

    class Cfg:
        save_figure_dir = str(tmp_path)

    rng = np.random.default_rng(0)
    d_in, d_sae = 8, 64
    log_freq = rng.uniform(-8, -1, d_sae)
    conditions, texts = default_frequency_conditions(log_freq)

    class FakeSAE:
        params = {"W_enc": rng.normal(size=(d_in, d_sae))}

    paths = visualize_sparsities(Cfg(), log_freq, log_freq + 0.5,
                                 conditions, texts, "test", FakeSAE())
    import os
    assert os.path.exists(paths["tokens"]) and os.path.exists(paths["images"])
    assert any(t in paths for t in texts)

    # identical directions have cosine sim 1
    W = np.ones((4, 3))
    sims = rare_direction_cosine_sims(W, np.array([True, True, True]))
    np.testing.assert_allclose(sims, 1.0, rtol=1e-6)


def test_interactive_sparsity_dashboard(tmp_path):
    """The interactive HTML dashboard (plotly counterpart): correct binned
    stats, self-contained page, per-condition cosine charts embedded."""
    import json
    import os
    import re

    import numpy as np
    from vit_prisma_tpu.visualization import (
        build_sparsity_dashboard_html, default_frequency_conditions,
        histogram_payload, interactive_sparsity_dashboard)

    # binned stats: percent sums to 100, counts match numpy, empty -> None
    vals = np.array([0.0, 0.5, 1.0, 1.0])
    p = histogram_payload(vals, bins=2, title="t", xlabel="x")
    assert p["counts"] == [1, 3] and p["n"] == 4  # [0,.5) / [.5,1]
    assert abs(sum(p["percent"]) - 100.0) < 1e-6
    assert p["edges"][0] == 0.0 and p["edges"][-1] == 1.0
    assert histogram_payload(np.array([]), bins=4) is None
    assert histogram_payload(np.array([np.nan, np.inf]), bins=4) is None

    html = build_sparsity_dashboard_html([p], title="T", subtitle="S")
    m = re.search(r"const CHARTS = (\[.*?\]);\n", html, re.S)
    assert m and json.loads(m.group(1)) == [p]
    # self-contained: no external scripts/stylesheets fetched
    assert "<script src" not in html and "<link" not in html

    class Cfg:
        save_figure_dir = str(tmp_path)

    rng = np.random.default_rng(0)
    d_in, d_sae = 8, 64
    log_freq = rng.uniform(-8, -1, d_sae)
    conditions, texts = default_frequency_conditions(log_freq)

    class FakeSAE:
        params = {"W_enc": rng.normal(size=(d_in, d_sae))}

    out = interactive_sparsity_dashboard(Cfg(), log_freq, log_freq + 0.5,
                                         conditions, texts, "test", FakeSAE())
    assert os.path.exists(out["html"])
    page = open(out["html"]).read()
    data = json.loads(re.search(r"const CHARTS = (\[.*?\]);\n", page,
                                re.S).group(1))
    # 2 frequency charts + one cosine chart per non-empty condition
    n_nonempty = sum(int(np.asarray(c).sum() > 0) for c in conditions)
    assert len(data) == 2 + n_nonempty
    assert data[0]["n"] == d_sae


def test_evals_visualize_sparsities_writes_dashboard(tmp_path):
    """sae.evals.visualize_sparsities emits npz + the interactive HTML."""
    import os

    import numpy as np
    from vit_prisma_tpu.sae.evals import EvalConfig, visualize_sparsities

    cfg = EvalConfig(sae_path=str(tmp_path))
    rng = np.random.default_rng(0)
    log_freq = rng.uniform(-8, -1, 32)

    class FakeSAE:
        params = {"W_enc": rng.normal(size=(8, 32))}

    visualize_sparsities(cfg, log_freq, log_freq + 0.3, "TOTAL",
                         sae=FakeSAE())
    assert os.path.exists(os.path.join(str(tmp_path), "sparsity_TOTAL.npz"))
    assert os.path.exists(os.path.join(str(tmp_path),
                                       "TOTAL_sparsity_dashboard.html"))


def test_tutorial_plotting_helpers(tmp_path):
    import matplotlib
    matplotlib.use("Agg")
    import numpy as np
    from vit_prisma_tpu.utils.tutorial_utils import (plot_act_distribution,
                                                     plot_image,
                                                     plot_imgs_for_one_feature)

    ax = plot_image(np.random.default_rng(0).uniform(size=(3, 8, 8)).astype(np.float32))
    assert ax is not None

    vals = np.zeros(100, np.float32)
    vals[[3, 50, 77]] = [0.5, 1.5, 0.9]
    top_idx, top_vals = plot_act_distribution(vals, n_top=2)
    assert set(top_idx.tolist()) == {50, 77}

    class Cfg:
        hook_point = "blocks.9.hook_resid_post"

    viz = [(np.random.default_rng(i).uniform(size=(3, 8, 8)).astype(np.float32), 0)
           for i in range(5)]
    fig = plot_imgs_for_one_feature(7, [0, 2, 4], [1.0, 0.5, 0.3], viz, Cfg(),
                                    show=False)
    assert fig is not None


def test_topk_mask_exact_for_bf16_inputs():
    """The 16-position search is mask-exact on bf16 inputs (incl. negative
    thresholds): same kept set as lax.top_k on the f32-cast values."""
    import jax
    import jax.numpy as jnp
    rng = np.random.default_rng(3)
    # force negative k-th values in some rows
    x = jnp.asarray(rng.normal(loc=-1.0, size=(32, 512)).astype(np.float32)
                    ).astype(jnp.bfloat16)
    k = 16
    out = topk_mask_activation(x, k)
    xf = x.astype(jnp.float32)
    vals, idx = jax.lax.top_k(xf, k)
    for r in range(x.shape[0]):
        kept = set(np.nonzero(np.asarray(xf[r]) >= float(vals[r, -1]))[0])
        got = set(np.nonzero(np.asarray(x[r].astype(jnp.float32))
                             >= float(vals[r, -1]))[0])
        # mask keeps exactly the >= k-th set (ties keep >= k)
        mask_kept = set(np.nonzero(np.asarray(out[r].astype(jnp.float32))
                                   != 0)[0]) | \
            set(np.nonzero((np.asarray(xf[r]) >= float(vals[r, -1]))
                           & (np.asarray(xf[r]) <= 0))[0])
        assert kept == got
        # every strictly-positive top-k member survives relu-masking
        pos_topk = {int(i) for v, i in zip(np.asarray(vals[r]),
                                           np.asarray(idx[r])) if v > 0}
        nonzero = set(np.nonzero(np.asarray(out[r].astype(jnp.float32))
                                 != 0)[0])
        assert pos_topk <= nonzero
        # and nothing outside the >= threshold set is nonzero
        assert nonzero <= kept
