"""Mixed-precision SAE training (``cfg.compute_dtype='bfloat16'``).

The TPU production recipe: fwd/bwd GEMMs and the [B, d_sae] feature-act
traffic run bf16, while master params, Adam moments, and loss reductions
stay fp32 (the cast lives inside the loss so jax.grad returns fp32 grads).
The reference has no analogue (its SAE step is fp32 eager,
train_sae.py:278-411); the fp32 path here stays its numerics-equivalent
and is what tests/test_sae.py verifies against the live oracle.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vit_prisma_tpu.sae import (
    SAERunnerConfig,
    init_sweep_state,
    init_train_state,
    sae_sweep_train_step,
    sae_train_multistep,
    sae_train_step,
)

D_IN, EXPANSION, BS = 32, 8, 64


def _cfg(**kw):
    base = dict(d_in=D_IN, expansion_factor=EXPANSION, train_batch_size=BS,
                lr=1e-2, lr_scheduler_name="constant",
                b_dec_init_method="zeros", log_to_wandb=False,
                context_size=1)
    base.update(kw)
    return SAERunnerConfig(**base)


def test_bf16_masters_stay_fp32():
    cfg = _cfg(compute_dtype="bfloat16")
    state = init_train_state(cfg, key=jax.random.PRNGKey(0))
    batch = jax.random.normal(jax.random.PRNGKey(1), (BS, D_IN))
    state, m = sae_train_step(state, batch, cfg)
    for name, p in state.params.items():
        assert p.dtype == jnp.float32, (name, p.dtype)
    assert jnp.isfinite(m.loss)


@pytest.mark.parametrize("architecture,act", [
    ("standard", "relu"), ("gated", "relu"), ("standard", "topk"),
])
def test_bf16_step_tracks_fp32_step(architecture, act):
    """One bf16 step lands near the fp32 step: the update direction is
    preserved to bf16 resolution (loose tol — bf16 has ~3 decimal digits)."""
    kw = dict(architecture=architecture, activation_fn_str=act)
    if act == "topk":
        kw["activation_fn_kwargs"] = (("k", 8),)
    batch = jax.random.normal(jax.random.PRNGKey(1), (BS, D_IN))

    def one_step(compute_dtype):
        cfg = _cfg(compute_dtype=compute_dtype, **kw)
        state = init_train_state(cfg, key=jax.random.PRNGKey(0))
        state, metrics = sae_train_step(state, batch, cfg)
        return state, metrics

    cfg_lr = 1e-2
    s32, m32 = one_step(None)
    s16, m16 = one_step("bfloat16")
    np.testing.assert_allclose(float(m16.loss), float(m32.loss),
                               rtol=0.05)
    for name in s32.params:
        a = np.asarray(s32.params[name], np.float64)
        b = np.asarray(s16.params[name], np.float64)
        # Adam normalizes every element's update to ~±lr, so a near-zero
        # gradient whose sign flips under bf16 rounding moves 2*lr — cap
        # how many elements may do that, and bound everything by 2*lr.
        np.testing.assert_allclose(a, b, atol=2 * cfg_lr + 1e-4,
                                   err_msg=f"params[{name}]")
        frac_flipped = (np.abs(a - b) > cfg_lr / 2).mean()
        # topk additionally swaps boundary features whose pre-acts tie at
        # bf16 resolution — their whole columns get ±lr vs 0
        cap = 0.03 if act == "topk" else 0.01
        assert frac_flipped < cap, (name, frac_flipped)


def test_bf16_counters_match_fp32_activations_pattern():
    """Fired/act-freq bookkeeping uses exact comparisons (x > 0) — the
    counter totals must be plausible and finite under bf16."""
    cfg = _cfg(compute_dtype="bfloat16")
    state = init_train_state(cfg, key=jax.random.PRNGKey(0))
    batch = jax.random.normal(jax.random.PRNGKey(1), (BS, D_IN))
    state, m = sae_train_step(state, batch, cfg)
    af = np.asarray(state.act_freq_scores)
    assert af.min() >= 0 and af.max() <= BS
    assert float(state.n_frac_active_tokens) == BS
    assert 0 < float(m.l0) < cfg.d_sae


def test_bf16_multistep_and_sweep_run():
    cfg = _cfg(compute_dtype="bfloat16", feature_sampling_window=2)
    batches = jax.random.normal(jax.random.PRNGKey(1), (4, BS, D_IN))
    state, m = sae_train_multistep(
        init_train_state(cfg, key=jax.random.PRNGKey(0)), batches, cfg)
    assert np.isfinite(np.asarray(m.loss)).all()

    L = 3
    swcfg = _cfg(compute_dtype="bfloat16", sweep_layers=tuple(range(L)))
    sstate = init_sweep_state(swcfg, L, key=jax.random.PRNGKey(0))
    batch = jax.random.normal(jax.random.PRNGKey(2), (BS, L, D_IN))
    sstate, sm = sae_sweep_train_step(sstate, batch, swcfg)
    assert np.asarray(sm.loss).shape == (L,)
    assert np.isfinite(np.asarray(sm.loss)).all()
    for p in sstate.params.values():
        assert p.dtype == jnp.float32


def test_bf16_training_converges():
    """A short bf16 run on a fixed low-rank signal reaches the same EV
    neighborhood as fp32 — mixed precision must not change trainability."""
    rng = np.random.default_rng(0)
    basis = rng.normal(size=(6, D_IN)).astype(np.float32)

    def batches(n):
        for i in range(n):
            codes = np.abs(rng.normal(size=(BS, 6))).astype(np.float32)
            yield jnp.asarray(codes @ basis)

    def run(compute_dtype):
        cfg = _cfg(compute_dtype=compute_dtype, l1_coefficient=1e-5)
        state = init_train_state(cfg, key=jax.random.PRNGKey(0))
        ev = None
        for b in batches(150):
            state, m = sae_train_step(state, b, cfg)
            ev = float(m.explained_variance)
        return ev

    rng = np.random.default_rng(0)
    ev32 = run(None)
    rng = np.random.default_rng(0)
    ev16 = run("bfloat16")
    assert ev16 > 0.85, ev16
    assert abs(ev16 - ev32) < 0.05, (ev16, ev32)
