"""shard_map'd fused Pallas sweep step == single-device numerics.

A pallas_call can't be partitioned by GSPMD, so the multi-chip sweep path
wraps the fused kernel in ``jax.shard_map`` with explicit collectives
(parallel/mesh.py::_sweep_fused_shard_map + the ``data_axis`` plumbing of
``_sae_train_step_fused``): layers shard over 'model' (collective-free),
rows over 'data' (grad/batch-stat pmean, counter psum).  These tests prove
the sharded result equals the single-device global-batch step on the
8-device CPU mesh (tests/conftest.py).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vit_prisma_tpu.parallel.mesh import (
    _sweep_fused_shard_map,
    make_mesh,
    shard_sae_sweep_multistep,
    shard_sae_sweep_step,
)
from vit_prisma_tpu.sae import SAERunnerConfig, init_sweep_state
from vit_prisma_tpu.sae.train import (
    sae_sweep_train_multistep,
    sae_sweep_train_step,
)

L, B, D_IN, D_SAE = 4, 512, 128, 512


def _cfg(**kw):
    base = dict(d_in=D_IN, expansion_factor=D_SAE // D_IN,
                train_batch_size=B, sweep_layers=tuple(range(L)), lr=1e-3,
                lr_scheduler_name="constant", b_dec_init_method="zeros",
                log_to_wandb=False, l1_coefficient=1e-4, context_size=1)
    base.update(kw)
    return SAERunnerConfig(**base)


def _fresh(cfg):
    return init_sweep_state(cfg, L, key=jax.random.PRNGKey(0))


def test_fused_shard_map_is_selected():
    mesh = make_mesh(data=2, model=2)
    assert _sweep_fused_shard_map(_cfg(), mesh, _fresh(_cfg())) is not None
    # TopK takes the kernel path too (round 4)
    assert _sweep_fused_shard_map(
        _cfg(activation_fn_str="topk", activation_fn_kwargs=(("k", 16),)),
        mesh, _fresh(_cfg())) is not None
    # gated takes the kernel path too (round 5)
    assert _sweep_fused_shard_map(_cfg(architecture="gated"), mesh,
                                  _fresh(_cfg())) is not None
    # non-kernel config falls back to the GSPMD XLA path
    assert _sweep_fused_shard_map(_cfg(use_ghost_grads=True), mesh,
                                  _fresh(_cfg())) is None
    # shard sizes must divide
    assert _sweep_fused_shard_map(_cfg(), make_mesh(data=3, model=2),
                                  _fresh(_cfg())) is None


def test_sharded_fused_topk_step_matches_single_device():
    """The TopK kernel under shard_map (dp x mp) == single-device step."""
    cfg = _cfg(activation_fn_str="topk", activation_fn_kwargs=(("k", 16),))
    mesh = make_mesh(data=2, model=2)
    batch = jax.random.normal(jax.random.PRNGKey(1), (B, L, D_IN))
    place, fn = shard_sae_sweep_step(cfg, mesh, _fresh(cfg))
    st_sh, m_sh = fn(place(_fresh(cfg)), batch)
    st_1, m_1 = sae_sweep_train_step(_fresh(cfg), batch, cfg)
    np.testing.assert_array_equal(np.asarray(st_sh.act_freq_scores),
                                  np.asarray(st_1.act_freq_scores))
    for name in st_1.params:
        np.testing.assert_allclose(
            np.asarray(st_sh.params[name]), np.asarray(st_1.params[name]),
            rtol=2e-4, atol=2e-5, err_msg=name)
    for field in ("loss", "mse_loss", "l0", "explained_variance"):
        np.testing.assert_allclose(
            np.asarray(getattr(m_sh, field)),
            np.asarray(getattr(m_1, field)), rtol=2e-4, atol=1e-5,
            err_msg=field)


def test_sharded_fused_gated_step_matches_single_device():
    """The gated kernel under shard_map (dp x mp) == single-device step
    (grad/metric pmean incl. the aux reconstruction loss)."""
    cfg = _cfg(architecture="gated")
    mesh = make_mesh(data=2, model=2)
    batch = jax.random.normal(jax.random.PRNGKey(1), (B, L, D_IN))
    place, fn = shard_sae_sweep_step(cfg, mesh, _fresh(cfg))
    st_sh, m_sh = fn(place(_fresh(cfg)), batch)
    st_1, m_1 = sae_sweep_train_step(_fresh(cfg), batch, cfg)
    np.testing.assert_array_equal(np.asarray(st_sh.act_freq_scores),
                                  np.asarray(st_1.act_freq_scores))
    for name in st_1.params:
        np.testing.assert_allclose(
            np.asarray(st_sh.params[name]), np.asarray(st_1.params[name]),
            rtol=2e-4, atol=2e-5, err_msg=name)
    for field in ("loss", "mse_loss", "l1_loss",
                  "aux_reconstruction_loss", "l0"):
        np.testing.assert_allclose(
            np.asarray(getattr(m_sh, field)),
            np.asarray(getattr(m_1, field)), rtol=2e-4, atol=1e-5,
            err_msg=field)


@pytest.mark.parametrize("dp,mp", [(2, 2), (4, 1), (1, 4), (8, 1)])
def test_sharded_fused_step_matches_single_device(dp, mp):
    cfg = _cfg()
    mesh = make_mesh(data=dp, model=mp)
    batch = jax.random.normal(jax.random.PRNGKey(1), (B, L, D_IN))

    place, fn = shard_sae_sweep_step(cfg, mesh, _fresh(cfg))
    st_sh, m_sh = fn(place(_fresh(cfg)), batch)
    st_1, m_1 = sae_sweep_train_step(_fresh(cfg), batch, cfg)

    np.testing.assert_array_equal(np.asarray(st_sh.act_freq_scores),
                                  np.asarray(st_1.act_freq_scores))
    np.testing.assert_array_equal(
        np.asarray(st_sh.n_forward_passes_since_fired),
        np.asarray(st_1.n_forward_passes_since_fired))
    for name in st_1.params:
        np.testing.assert_allclose(
            np.asarray(st_sh.params[name]), np.asarray(st_1.params[name]),
            rtol=2e-4, atol=2e-5, err_msg=name)
    for field in ("loss", "mse_loss", "l1_loss", "l0", "explained_variance"):
        np.testing.assert_allclose(
            np.asarray(getattr(m_sh, field)),
            np.asarray(getattr(m_1, field)), rtol=2e-4, atol=1e-5,
            err_msg=field)


def test_sharded_fused_multistep_matches_single_device():
    cfg = _cfg(feature_sampling_window=2)
    mesh = make_mesh(data=2, model=2)
    batches = jax.random.normal(jax.random.PRNGKey(2), (3, B, L, D_IN))

    place, _ = shard_sae_sweep_step(cfg, mesh, _fresh(cfg))
    fn = shard_sae_sweep_multistep(cfg, mesh, _fresh(cfg))
    st2, ms2 = fn(place(_fresh(cfg)), batches)
    st3, ms3 = sae_sweep_train_multistep(_fresh(cfg), batches, cfg)

    for name in st3.params:
        np.testing.assert_allclose(
            np.asarray(st2.params[name]), np.asarray(st3.params[name]),
            rtol=3e-4, atol=3e-5, err_msg=name)
    np.testing.assert_allclose(np.asarray(ms2.loss), np.asarray(ms3.loss),
                               rtol=2e-4)
    assert np.asarray(ms2.loss).shape == (3, L)
