"""Fused clip+project+Adam pass (ops/opt_step.py) — equivalence against the
optax path it replaces, kernel-vs-twin exactness (interpreter mode), and the
bf16-moment storage option."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from vit_prisma_tpu.ops.opt_step import (_adam_update_kernel,
                                         _adam_update_ref,
                                         fused_clip_project_adam)
from vit_prisma_tpu.sae.config import SAERunnerConfig
from vit_prisma_tpu.sae.sae import (
    init_sae_params,
    remove_gradient_parallel_to_decoder_directions,
)
from vit_prisma_tpu.sae.train import (init_train_state, make_optimizer,
                                      sae_train_step)

B1, B2, EPS = 0.9, 0.999, 1e-8


def _rand_tree(key, shapes):
    ks = jax.random.split(key, len(shapes))
    return {k: jax.random.normal(kk, s)
            for (k, s), kk in zip(shapes.items(), ks)}


def _sweep_trees(L=3, d_in=32, d_sae=64, seed=0):
    shapes = {"W_enc": (L, d_in, d_sae), "b_enc": (L, d_sae),
              "W_dec": (L, d_sae, d_in), "b_dec": (L, d_in)}
    k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
    params = _rand_tree(k1, shapes)
    # unit-norm decoder rows, as at the point `post` runs in the step
    params["W_dec"] = params["W_dec"] / jnp.linalg.norm(
        params["W_dec"], axis=-1, keepdims=True)
    grads = _rand_tree(k2, shapes)
    return params, grads


def _optax_post(params, grads, opt_state, opt, max_grad_norm):
    """The pre-fusion reference path (train.py's vmapped `post`)."""
    def post(g, p, st):
        if max_grad_norm:
            gnorm = optax.global_norm(g)
            scale = jnp.minimum(1.0, max_grad_norm / (gnorm + 1e-6))
            g = jax.tree.map(lambda t: t * scale, g)
        g = remove_gradient_parallel_to_decoder_directions(g, p)
        updates, st = opt.update(g, st, p)
        return optax.apply_updates(p, updates), st
    return jax.vmap(post)(grads, params, opt_state)


@pytest.mark.parametrize("max_grad_norm", [1.0, None])
def test_fused_post_matches_optax_sweep(max_grad_norm):
    L = 3
    lr_fn = lambda s: 1e-3 * (1.0 + 0.5 * s)  # exercises the schedule count
    opt = optax.adam(lr_fn, b1=B1, b2=B2)
    params, grads = _sweep_trees(L=L)
    opt_state = jax.vmap(opt.init)(params)

    p_ref, st_ref = params, opt_state
    p_fused, st_fused = params, opt_state
    for step in range(3):
        g = jax.tree.map(lambda a: a * (1.0 + step), grads)
        p_ref, st_ref = _optax_post(p_ref, g, st_ref, opt, max_grad_norm)
        lr = lr_fn(st_fused[1].count)
        p_fused, st_fused = fused_clip_project_adam(
            p_fused, g, st_fused, lr=lr, b1=B1, b2=B2,
            max_grad_norm=max_grad_norm)
    for k in params:
        np.testing.assert_allclose(np.asarray(p_fused[k]),
                                   np.asarray(p_ref[k]),
                                   rtol=2e-5, atol=2e-6, err_msg=k)
        np.testing.assert_allclose(np.asarray(st_fused[0].mu[k]),
                                   np.asarray(st_ref[0].mu[k]),
                                   rtol=2e-5, atol=2e-6, err_msg=f"mu/{k}")
        np.testing.assert_allclose(np.asarray(st_fused[0].nu[k]),
                                   np.asarray(st_ref[0].nu[k]),
                                   rtol=2e-5, atol=2e-6, err_msg=f"nu/{k}")
    np.testing.assert_array_equal(np.asarray(st_fused[0].count),
                                  np.asarray(st_ref[0].count))
    np.testing.assert_array_equal(np.asarray(st_fused[1].count),
                                  np.asarray(st_ref[1].count))


@pytest.mark.parametrize("project", [True, False])
@pytest.mark.parametrize("mdt", [jnp.float32, jnp.bfloat16])
def test_kernel_matches_twin(project, mdt):
    """Pallas kernel (interpreter mode on this CPU platform) vs the XLA
    twin — identical math, bit-comparable."""
    L, R, C = 2, 8, 128
    ks = jax.random.split(jax.random.PRNGKey(3), 4)
    p = jax.random.normal(ks[0], (L, R, C))
    if project:
        p = p / jnp.linalg.norm(p, axis=-1, keepdims=True)
    g = jax.random.normal(ks[1], (L, R, C))
    mu = jax.random.normal(ks[2], (L, R, C)).astype(mdt)
    nu = jnp.abs(jax.random.normal(ks[3], (L, R, C))).astype(mdt)
    scal = jnp.asarray([[0.7, 1e-3, 1.1, 1.05], [1.0, 2e-3, 1.2, 1.1]],
                       jnp.float32)
    out_k = _adam_update_kernel(p, g, mu, nu, scal, b1=B1, b2=B2, eps=EPS,
                                project=project)
    out_r = _adam_update_ref(p, g, mu, nu, scal, b1=B1, b2=B2, eps=EPS,
                             project=project)
    for a, b, nm in zip(out_k, out_r, ("p", "mu", "nu")):
        assert a.dtype == b.dtype, nm
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32),
                                   rtol=1e-6, atol=1e-6, err_msg=nm)


def _cfg(**kw):
    base = dict(d_in=32, expansion_factor=2, train_batch_size=64,
                dataset_name="cifar10", architecture="standard",
                activation_fn_str="relu", use_ghost_grads=False,
                normalize_activations="none", lr=1e-3,
                lr_scheduler_name="constant", lr_warm_up_steps=0,
                total_training_images=64 * 50, b_dec_init_method="zeros")
    base.update(kw)
    return SAERunnerConfig(**base)


def test_step_fused_vs_optax_optimizer():
    """The full jitted train step with fused_optimizer on vs off — same
    trajectory at fp32 rounding."""
    cfg_f = _cfg(fused_optimizer=True)
    cfg_o = _cfg(fused_optimizer=False)
    params = init_sae_params(cfg_f, jax.random.PRNGKey(0))
    # the jitted step donates its state, so each run needs its own buffers
    s_f = init_train_state(cfg_f, params=jax.tree.map(jnp.copy, params))
    s_o = init_train_state(cfg_o, params=jax.tree.map(jnp.copy, params))
    key = jax.random.PRNGKey(1)
    for i in range(4):
        batch = jax.random.normal(jax.random.fold_in(key, i),
                                  (cfg_f.train_batch_size, cfg_f.d_in))
        s_f, m_f = sae_train_step(s_f, batch, cfg_f)
        s_o, m_o = sae_train_step(s_o, batch, cfg_o)
    for k in params:
        np.testing.assert_allclose(np.asarray(s_f.params[k]),
                                   np.asarray(s_o.params[k]),
                                   rtol=3e-5, atol=3e-6, err_msg=k)
    np.testing.assert_allclose(float(m_f.loss), float(m_o.loss), rtol=1e-5)


def test_bf16_adam_moments():
    cfg = _cfg(adam_dtype="bfloat16")
    state = init_train_state(cfg, params=init_sae_params(
        cfg, jax.random.PRNGKey(0)))
    assert state.opt_state[0].mu["W_enc"].dtype == jnp.bfloat16
    assert state.opt_state[0].nu["W_dec"].dtype == jnp.bfloat16
    batch = jax.random.normal(jax.random.PRNGKey(2),
                              (cfg.train_batch_size, cfg.d_in))
    state2, metrics = sae_train_step(state, batch, cfg)
    # storage dtype survives the step; params remain fp32 masters
    assert state2.opt_state[0].mu["W_enc"].dtype == jnp.bfloat16
    assert state2.params["W_enc"].dtype == jnp.float32
    assert np.isfinite(float(metrics.loss))
    # and the trajectory tracks the fp32-moment run loosely
    s32 = init_train_state(_cfg(), params=init_sae_params(
        _cfg(), jax.random.PRNGKey(0)))
    s32, _ = sae_train_step(s32, batch, _cfg())
    np.testing.assert_allclose(np.asarray(state2.params["W_dec"]),
                               np.asarray(s32.params["W_dec"]),
                               rtol=0.1, atol=1e-2)


def test_bf16_moments_require_fused():
    with pytest.raises(ValueError, match="fused_optimizer"):
        init_train_state(_cfg(adam_dtype="bfloat16", fused_optimizer=False))


def test_pick_rows_shape_rules():
    """Static gate for the Mosaic block rules (advisor r3): for every
    supported moment dtype and a sweep of realistic (R, C) shapes,
    _pick_rows must either return a legal block (8-divisible or whole-dim,
    dividing R, within the VMEM budget) or None — and _kernel_ok must agree
    with the REAL itemsize's pick, so a passing probe can never precede a
    failing trace-time pick."""
    from vit_prisma_tpu.ops.opt_step import (_VMEM_BUDGET, _kernel_ok,
                                             _pick_rows)
    d_saes = [768 * 2, 12288, 24576, 32768, 49152, 1024 * 32, 1280 * 16]
    d_ins = [768, 1024, 1280]
    shapes = ([(r, c) for r in d_ins for c in d_saes] +        # W_enc-like
              [(c, r) for r in d_ins for c in d_saes])         # W_dec-like
    for itemsize in (2, 4):
        per_elem = 2 * (2 * 4 + 2 * 4 + 2 * itemsize + 2 * itemsize)
        for R, C in shapes:
            rb = _pick_rows(R, C, itemsize)
            if rb is not None:
                assert R % rb == 0, (R, C, itemsize, rb)
                assert rb % 8 == 0 or rb == R, (R, C, itemsize, rb)
                assert rb * C * per_elem <= _VMEM_BUDGET
    # the advisor's concrete regression: fp32 moments, d_sae=32768 — the
    # bf16 probe passes but the fp32 pick fails; _kernel_ok(shape, 4) must
    # report what the kernel will actually do.
    assert _pick_rows(1024, 32768, 2) is not None
    assert _pick_rows(1024, 32768, 4) is None
    # _kernel_ok returns False on the CPU test platform regardless, but the
    # guarded fallback inside _adam_update_kernel must also hold: calling it
    # at the unpicked shape routes to the twin instead of raising.
    L = 1
    p = jnp.zeros((L, 8, 32768), jnp.float32)
    scal = jnp.ones((L, 4), jnp.float32)
    # R=8 keeps the tensor tiny; force the no-pick case via a fake budget
    import vit_prisma_tpu.ops.opt_step as opt_mod
    orig = opt_mod._VMEM_BUDGET
    opt_mod._VMEM_BUDGET = 1  # no block fits
    try:
        out = _adam_update_kernel(p, p, p, p, scal, b1=B1, b2=B2, eps=EPS,
                                  project=False)
    finally:
        opt_mod._VMEM_BUDGET = orig
    assert out[0].shape == p.shape
