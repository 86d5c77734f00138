"""Fused Pallas SAE train step (ops/sae_step.py) == the generic XLA path.

The fused kernel is the standard-ReLU fast path of sae_train_step /
sae_sweep_train_step (gated by ``_fused_step_ok``); it must reproduce the
generic implementation — the one verified against the reference oracle in
tests/test_sae.py — to float32-accumulation tolerance, with exact counters.
On the CPU test platform the kernel runs in interpreter mode.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vit_prisma_tpu.sae import SAERunnerConfig, init_sweep_state, init_train_state
from vit_prisma_tpu.sae.train import (
    _fused_step_ok,
    sae_sweep_train_step,
    sae_train_multistep,
    sae_train_step,
)
from vit_prisma_tpu.ops.sae_step import sae_fused_apply, sae_fused_reference

# tile-aligned shapes (the gate requires d_in % 128, d_sae % 256, B % 256)
D_IN, D_SAE, BS = 128, 512, 256


def _cfg(**kw):
    base = dict(d_in=D_IN, expansion_factor=D_SAE // D_IN,
                train_batch_size=BS, lr=1e-3, lr_scheduler_name="constant",
                b_dec_init_method="zeros", log_to_wandb=False,
                l1_coefficient=1e-4, context_size=1)
    base.update(kw)
    return SAERunnerConfig(**base)


def test_gate_conditions():
    assert _fused_step_ok(_cfg(), BS, 2)
    assert not _fused_step_ok(_cfg(), BS, 1)           # single-SAE: XLA wins
    assert not _fused_step_ok(_cfg(fused_sae_step=False), BS, 2)
    assert _fused_step_ok(_cfg(architecture="gated"), BS, 2)
    assert not _fused_step_ok(
        _cfg(architecture="gated", activation_fn_str="topk",
             activation_fn_kwargs=(("k", 32),)), BS, 2)
    assert not _fused_step_ok(_cfg(use_ghost_grads=True), BS, 2)
    assert not _fused_step_ok(_cfg(normalize_activations="layer_norm"), BS, 2)
    assert not _fused_step_ok(_cfg(), BS + 1, 2)       # unaligned rows
    assert not _fused_step_ok(_cfg(d_in=96), BS, 2)    # unaligned d_in
    # TopK: fused at any layer count (incl. L=1 via _fused_single_ok), but
    # an explicit approx opt-in keeps the XLA path
    from vit_prisma_tpu.sae.train import _fused_single_ok
    tk = _cfg(activation_fn_str="topk", activation_fn_kwargs=(("k", 32),))
    assert _fused_step_ok(tk, BS, 2)
    assert _fused_single_ok(tk, BS)
    assert not _fused_single_ok(_cfg(), BS)            # relu stays XLA at L=1
    assert not _fused_step_ok(
        _cfg(activation_fn_str="topk", activation_fn_kwargs=(("k", 32),),
             topk_use_approx=True),
        BS, 2)
    assert not _fused_step_ok(
        _cfg(activation_fn_str="topk", activation_fn_kwargs=(("k", D_SAE),)), BS, 2)


def test_kernel_matches_reference_values_and_grads():
    L = 2
    ks = jax.random.split(jax.random.PRNGKey(0), 5)
    x = jax.random.normal(ks[0], (L, BS, D_IN))
    We = jax.random.normal(ks[1], (L, D_IN, D_SAE)) * 0.05
    be = jax.random.normal(ks[2], (L, D_SAE)) * 0.01
    Wd = jax.random.normal(ks[3], (L, D_SAE, D_IN)) * 0.05
    bd = jax.random.normal(ks[4], (L, D_IN)) * 0.01

    y1, l11, n1 = sae_fused_apply(x, We, be, Wd, bd)
    y2, l12, n2 = sae_fused_reference(x, We, be, Wd, bd)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(l11), np.asarray(l12), rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(n1), np.asarray(n2))

    def loss(fn):
        def f(We, be, Wd, bd):
            y, l1, _ = fn(x, We, be, Wd, bd)
            return jnp.square(y - x).mean() + 1e-3 * l1.sum() / BS
        return jax.grad(f, argnums=(0, 1, 2, 3))(We, be, Wd, bd)

    for a, b, name in zip(loss(sae_fused_apply), loss(sae_fused_reference),
                          ["dWe", "dbe", "dWd", "dbd"]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=1e-6, err_msg=name)


def _run_steps(cfg, n, sweep_layers=None, seed=0):
    batches = jax.random.normal(jax.random.PRNGKey(9),
                                (n, BS, D_IN) if sweep_layers is None
                                else (n, BS, sweep_layers, D_IN))
    if sweep_layers is None:
        state = init_train_state(cfg, key=jax.random.PRNGKey(seed))
        step = sae_train_step
    else:
        state = init_sweep_state(cfg, sweep_layers,
                                 key=jax.random.PRNGKey(seed))
        step = sae_sweep_train_step
    ms = []
    for i in range(n):
        state, m = step(state, batches[i], cfg)
        ms.append(m)
    return state, ms


def test_fused_step_matches_generic():
    L = 2
    kw = dict(sweep_layers=tuple(range(L)))
    s_f, m_f = _run_steps(_cfg(**kw), 3, sweep_layers=L)
    s_g, m_g = _run_steps(_cfg(fused_sae_step=False, **kw), 3,
                          sweep_layers=L)

    # counters are exact; params/metrics to fp32-accumulation tolerance
    np.testing.assert_array_equal(np.asarray(s_f.act_freq_scores),
                                  np.asarray(s_g.act_freq_scores))
    np.testing.assert_array_equal(
        np.asarray(s_f.n_forward_passes_since_fired),
        np.asarray(s_g.n_forward_passes_since_fired))
    for name in s_f.params:
        np.testing.assert_allclose(
            np.asarray(s_f.params[name]), np.asarray(s_g.params[name]),
            rtol=1e-4, atol=2e-5, err_msg=f"params[{name}]")
    for mf, mg in zip(m_f, m_g):
        for field in ("loss", "mse_loss", "l1_loss", "l0",
                      "explained_variance"):
            np.testing.assert_allclose(
                np.asarray(getattr(mf, field)),
                np.asarray(getattr(mg, field)), rtol=2e-4, atol=1e-6,
                err_msg=field)


def test_fused_sweep_multistep_matches_singles():
    L, K = 2, 4
    cfg = _cfg(sweep_layers=tuple(range(L)), feature_sampling_window=2)
    batches = jax.random.normal(jax.random.PRNGKey(3), (K, BS, L, D_IN))
    from vit_prisma_tpu.sae.train import (reset_sparsity_counters,
                                          sae_sweep_train_multistep)
    ref = init_sweep_state(cfg, L, key=jax.random.PRNGKey(0))
    for j in range(K):
        ref, _ = sae_sweep_train_step(ref, batches[j], cfg)
        if int(ref.step[0]) % cfg.feature_sampling_window == 0:
            ref = reset_sparsity_counters(ref)
    fused, ms = sae_sweep_train_multistep(
        init_sweep_state(cfg, L, key=jax.random.PRNGKey(0)), batches, cfg)
    for name in ref.params:
        np.testing.assert_allclose(
            np.asarray(ref.params[name]), np.asarray(fused.params[name]),
            rtol=5e-5, atol=1e-5, err_msg=name)
    assert np.asarray(ms.loss).shape == (K, L)


def test_fused_step_bf16_compute():
    L = 2
    cfg = _cfg(sweep_layers=tuple(range(L)), compute_dtype="bfloat16")
    assert _fused_step_ok(cfg, BS, L)
    state = init_sweep_state(cfg, L, key=jax.random.PRNGKey(0))
    batch = jax.random.normal(jax.random.PRNGKey(1), (BS, L, D_IN))
    state, m = sae_sweep_train_step(state, batch, cfg)
    assert state.params["W_enc"].dtype == jnp.float32
    assert np.isfinite(np.asarray(m.loss)).all()
    assert 0 < float(np.asarray(m.l0).mean()) < cfg.d_sae


# ---------------------------------------------------------------------------
# TopK fused step (ops/sae_step.py TopK section)
# ---------------------------------------------------------------------------

K_TOPK = 16


def _topk_tensors(L=2, dtype=jnp.float32, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 5)
    x = jax.random.normal(ks[0], (L, BS, D_IN)).astype(dtype)
    We = (jax.random.normal(ks[1], (L, D_IN, D_SAE)) * 0.05).astype(dtype)
    be = (jax.random.normal(ks[2], (L, D_SAE)) * 0.01).astype(dtype)
    Wd = (jax.random.normal(ks[3], (L, D_SAE, D_IN)) * 0.05).astype(dtype)
    bd = (jax.random.normal(ks[4], (L, D_IN)) * 0.01).astype(dtype)
    return x, We, be, Wd, bd


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_topk_kernel_matches_reference_values_and_grads(dtype):
    from vit_prisma_tpu.ops.sae_step import (sae_fused_apply_topk,
                                             sae_fused_topk_reference)
    x, We, be, Wd, bd = _topk_tensors(dtype=dtype)

    y1, l11, n1 = sae_fused_apply_topk(x, We, be, Wd, bd, k=K_TOPK)
    y2, l12, n2 = sae_fused_topk_reference(x, We, be, Wd, bd, K_TOPK)
    tol = 1e-5 if dtype == jnp.float32 else 2e-2
    np.testing.assert_allclose(np.asarray(y1, np.float32),
                               np.asarray(y2, np.float32),
                               rtol=tol, atol=tol)
    np.testing.assert_allclose(np.asarray(l11), np.asarray(l12),
                               rtol=tol)
    # masks (and so counters) are exact; every row keeps at least k
    # entries (bf16 rounding creates ties at the k-th value, which keep
    # more — same in kernel and reference)
    np.testing.assert_array_equal(np.asarray(n1), np.asarray(n2))
    assert (np.asarray(n1).sum(-1) >= K_TOPK * BS).all()
    if dtype == jnp.float32:
        assert (np.asarray(n1).sum(-1) == K_TOPK * BS).all()

    def loss(fn):
        def f(We, be, Wd, bd):
            y, l1, _ = fn(We, be, Wd, bd)
            return jnp.square(y - x).mean()
        return jax.grad(f, argnums=(0, 1, 2, 3))(We, be, Wd, bd)

    g1 = loss(lambda *p: sae_fused_apply_topk(x, *p, k=K_TOPK))
    g2 = loss(lambda *p: sae_fused_topk_reference(x, *p, K_TOPK))
    gtol = 2e-4 if dtype == jnp.float32 else 2e-2
    for a, b, name in zip(g1, g2, ["dWe", "dbe", "dWd", "dbd"]):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32),
                                   rtol=gtol, atol=gtol, err_msg=name)


def test_topk_matches_lax_topk_scatter():
    """The kernel's threshold-mask activation == the reference TopK module
    semantics (lax.top_k + relu + scatter, sae.py:795-810) on non-tied
    data."""
    from vit_prisma_tpu.ops.sae_step import sae_fused_apply_topk
    from vit_prisma_tpu.sae.sae import topk_activation
    x, We, be, Wd, bd = _topk_tensors(L=1)
    y1, l11, n1 = sae_fused_apply_topk(x, We, be, Wd, bd, k=K_TOPK)
    hpre = jnp.einsum("lbd,lds->lbs", x - bd[:, None, :], We) \
        + be[:, None, :]
    h = topk_activation(hpre, K_TOPK)
    y2 = jnp.einsum("lbs,lsd->lbd", h, Wd) + bd[:, None, :]
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(float(l11[0]), float(h.sum()), rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(n1[0]),
                                  np.asarray((h[0] > 0).sum(0)))


def test_topk_fused_single_step_matches_generic():
    cfg_f = _cfg(activation_fn_str="topk", activation_fn_kwargs=(("k", K_TOPK),))
    cfg_g = _cfg(activation_fn_str="topk", activation_fn_kwargs=(("k", K_TOPK),),
                 fused_sae_step=False)
    s_f, m_f = _run_steps(cfg_f, 3)
    s_g, m_g = _run_steps(cfg_g, 3)
    np.testing.assert_array_equal(np.asarray(s_f.act_freq_scores),
                                  np.asarray(s_g.act_freq_scores))
    np.testing.assert_array_equal(
        np.asarray(s_f.n_forward_passes_since_fired),
        np.asarray(s_g.n_forward_passes_since_fired))
    for name in s_f.params:
        np.testing.assert_allclose(
            np.asarray(s_f.params[name]), np.asarray(s_g.params[name]),
            rtol=1e-4, atol=2e-5, err_msg=f"params[{name}]")
    for mf, mg in zip(m_f, m_g):
        assert np.asarray(mf.loss).shape == ()
        for field in ("loss", "mse_loss", "l0", "explained_variance"):
            np.testing.assert_allclose(
                np.asarray(getattr(mf, field)),
                np.asarray(getattr(mg, field)), rtol=2e-4, atol=1e-6,
                err_msg=field)


def test_topk_fused_sweep_and_multistep():
    L, K = 2, 3
    cfg_f = _cfg(activation_fn_str="topk", activation_fn_kwargs=(("k", K_TOPK),),
                 sweep_layers=tuple(range(L)))
    cfg_g = cfg_f.replace(fused_sae_step=False)
    s_f, _ = _run_steps(cfg_f, 2, sweep_layers=L)
    s_g, _ = _run_steps(cfg_g, 2, sweep_layers=L)
    for name in s_f.params:
        np.testing.assert_allclose(
            np.asarray(s_f.params[name]), np.asarray(s_g.params[name]),
            rtol=1e-4, atol=2e-5, err_msg=name)
    # single-SAE multistep takes the fused path too
    batches = jax.random.normal(jax.random.PRNGKey(7), (K, BS, D_IN))
    cfg1 = _cfg(activation_fn_str="topk", activation_fn_kwargs=(("k", K_TOPK),))
    st = init_train_state(cfg1, key=jax.random.PRNGKey(0))
    st_m, ms = sae_train_multistep(st, batches, cfg1)
    st_s = init_train_state(cfg1, key=jax.random.PRNGKey(0))
    for j in range(K):
        st_s, _ = sae_train_step(st_s, batches[j], cfg1)
    for name in st_m.params:
        np.testing.assert_allclose(
            np.asarray(st_m.params[name]), np.asarray(st_s.params[name]),
            rtol=5e-5, atol=1e-5, err_msg=name)
    assert np.asarray(ms.loss).shape == (K,)


# ---------------------------------------------------------------------------
# Gated fused step (ops/sae_step.py gated section; reference sae.py:648-793)
# ---------------------------------------------------------------------------


def _gated_tensors(L=2, dtype=jnp.float32, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 7)
    x = jax.random.normal(ks[0], (L, BS, D_IN)).astype(dtype)
    We = (jax.random.normal(ks[1], (L, D_IN, D_SAE)) * 0.05).astype(dtype)
    bg = (jax.random.normal(ks[2], (L, D_SAE)) * 0.01).astype(dtype)
    rm = (jax.random.normal(ks[3], (L, D_SAE)) * 0.1).astype(dtype)
    bm = (jax.random.normal(ks[4], (L, D_SAE)) * 0.01).astype(dtype)
    Wd = (jax.random.normal(ks[5], (L, D_SAE, D_IN)) * 0.05).astype(dtype)
    bd = (jax.random.normal(ks[6], (L, D_IN)) * 0.01).astype(dtype)
    return x, We, bg, rm, bm, Wd, bd


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_gated_kernel_matches_reference_values_and_grads(dtype):
    from vit_prisma_tpu.ops.sae_step import (sae_gated_fused_apply,
                                             sae_gated_fused_reference)
    tens = _gated_tensors(dtype=dtype)
    x = tens[0]

    out1 = sae_gated_fused_apply(*tens)
    out2 = sae_gated_fused_reference(*tens)
    tol = 1e-5 if dtype == jnp.float32 else 2e-2
    for a, b, name in zip(out1[:3], out2[:3], ["y", "via", "l1"]):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32),
                                   rtol=tol, atol=tol, err_msg=name)
    np.testing.assert_array_equal(np.asarray(out1[3]), np.asarray(out2[3]))

    # full gated loss: mse + weighted-l1 + aux(via vs x - b_dec), grads
    # on every parameter incl. r_mag/b_gate/b_mag and both b_dec paths
    def loss(fn):
        def f(*params):
            y, via, l1, _ = fn(x, *params)
            sae_in = x - params[-1][:, None, :]
            return (jnp.square(y - x).mean()
                    + 1e-3 * l1.sum() / BS
                    + jnp.square(via - sae_in).sum(-1).mean())
        return jax.grad(f, argnums=tuple(range(6)))(*tens[1:])

    g1 = loss(sae_gated_fused_apply)
    g2 = loss(sae_gated_fused_reference)
    gtol = 2e-4 if dtype == jnp.float32 else 3e-2
    for a, b, name in zip(g1, g2, ["dWe", "dbg", "drm", "dbm", "dWd", "dbd"]):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32),
                                   rtol=gtol, atol=gtol, err_msg=name)


def test_gated_reference_matches_sae_forward():
    """The kernel's unfused twin == the library's generic gated forward
    (sae.py encode/decode path verified against the torch oracle in
    tests/test_sae.py), tying the kernel to the reference semantics."""
    from vit_prisma_tpu.ops.sae_step import sae_gated_fused_reference
    from vit_prisma_tpu.sae.sae import sae_forward

    x, We, bg, rm, bm, Wd, bd = _gated_tensors(L=1)
    cfg = _cfg(architecture="gated")
    params = {"W_enc": We[0], "b_gate": bg[0], "r_mag": rm[0],
              "b_mag": bm[0], "W_dec": Wd[0], "b_dec": bd[0],
              "b_enc": jnp.zeros((D_SAE,))}
    out = sae_forward(params, cfg, x[0], training=False)
    y, via, l1, nact = sae_gated_fused_reference(x, We, bg, rm, bm, Wd, bd)
    np.testing.assert_allclose(np.asarray(y[0]), np.asarray(out.sae_out),
                               rtol=1e-5, atol=1e-5)
    # aux/l1 pieces: recompute what sae_forward reports from via/l1
    aux = float(jnp.square(via[0] - (x[0] - bd[0])).sum(-1).mean())
    np.testing.assert_allclose(aux, float(out.aux_reconstruction_loss),
                               rtol=1e-4)
    l1_loss = cfg.l1_coefficient * float(l1[0]) / BS
    np.testing.assert_allclose(l1_loss, float(out.l1_loss), rtol=1e-4)


def test_gated_fused_single_step_matches_generic():
    cfg_f = _cfg(architecture="gated")
    cfg_g = _cfg(architecture="gated", fused_sae_step=False)
    from vit_prisma_tpu.sae.train import _fused_single_ok
    assert _fused_single_ok(cfg_f, BS)
    s_f, m_f = _run_steps(cfg_f, 3)
    s_g, m_g = _run_steps(cfg_g, 3)
    np.testing.assert_array_equal(np.asarray(s_f.act_freq_scores),
                                  np.asarray(s_g.act_freq_scores))
    np.testing.assert_array_equal(
        np.asarray(s_f.n_forward_passes_since_fired),
        np.asarray(s_g.n_forward_passes_since_fired))
    for name in s_f.params:
        np.testing.assert_allclose(
            np.asarray(s_f.params[name]), np.asarray(s_g.params[name]),
            rtol=1e-4, atol=2e-5, err_msg=f"params[{name}]")
    for mf, mg in zip(m_f, m_g):
        for field in ("loss", "mse_loss", "l1_loss",
                      "aux_reconstruction_loss", "l0",
                      "explained_variance"):
            np.testing.assert_allclose(
                np.asarray(getattr(mf, field)),
                np.asarray(getattr(mg, field)), rtol=2e-4, atol=1e-6,
                err_msg=field)


def test_gated_fused_sweep_step_matches_generic():
    L = 2
    kw = dict(architecture="gated", sweep_layers=tuple(range(L)))
    s_f, m_f = _run_steps(_cfg(**kw), 2, sweep_layers=L)
    s_g, m_g = _run_steps(_cfg(fused_sae_step=False, **kw), 2,
                          sweep_layers=L)
    for name in s_f.params:
        np.testing.assert_allclose(
            np.asarray(s_f.params[name]), np.asarray(s_g.params[name]),
            rtol=1e-4, atol=2e-5, err_msg=f"params[{name}]")
    for mf, mg in zip(m_f, m_g):
        for field in ("loss", "mse_loss", "l1_loss",
                      "aux_reconstruction_loss"):
            np.testing.assert_allclose(
                np.asarray(getattr(mf, field)),
                np.asarray(getattr(mg, field)), rtol=2e-4, atol=1e-6,
                err_msg=field)


@pytest.mark.parametrize("dtype", ["float32", "bfloat16"])
def test_stored_acts_backward_matches_remat(dtype):
    """The stored-acts VJP (forward streams h to HBM, backward skips the
    encoder recompute — see ops/sae_step.py stored-acts section) must give
    the same values and gradients as the rematerializing VJP, for both the
    ReLU and TopK kernels."""
    from vit_prisma_tpu.ops.sae_step import sae_fused_apply_topk
    dt = jnp.dtype(dtype)
    L = 2
    ks = jax.random.split(jax.random.PRNGKey(3), 5)
    x = jax.random.normal(ks[0], (L, BS, D_IN), dt)
    We = (jax.random.normal(ks[1], (L, D_IN, D_SAE)) * 0.05).astype(dt)
    be = (jax.random.normal(ks[2], (L, D_SAE)) * 0.01).astype(dt)
    Wd = (jax.random.normal(ks[3], (L, D_SAE, D_IN)) * 0.05).astype(dt)
    bd = (jax.random.normal(ks[4], (L, D_IN)) * 0.01).astype(dt)

    variants = [
        lambda sa: lambda x_, *p: sae_fused_apply(x_, *p, save_acts=sa),
        lambda sa: lambda x_, *p: sae_fused_apply_topk(x_, *p, k=16,
                                                       save_acts=sa),
    ]
    for make in variants:
        outs, grads = [], []
        for sa in (False, True):
            fn = make(sa)
            y, l1, nact = fn(x, We, be, Wd, bd)
            outs.append((y, l1, nact))

            def f(We, be, Wd, bd):
                y, l1, _ = fn(x, We, be, Wd, bd)
                return (jnp.square(y.astype(jnp.float32) - x.astype(
                    jnp.float32)).mean() + 1e-3 * l1.sum() / BS)

            grads.append(jax.grad(f, argnums=(0, 1, 2, 3))(We, be, Wd, bd))
        for a, b in zip(outs[0], outs[1]):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        for a, b, name in zip(grads[0], grads[1],
                              ["dWe", "dbe", "dWd", "dbd"]):
            np.testing.assert_allclose(np.asarray(a, np.float32),
                                       np.asarray(b, np.float32),
                                       rtol=2e-5, atol=1e-7, err_msg=name)


def test_store_acts_knob_trajectory_equality():
    """cfg.fused_store_acts (None=auto / True / False) must not change the
    training trajectory — the knob picks a VJP *strategy*, not semantics
    (chip-verified bit-identical; this is the CI twin at tile shapes)."""
    states = {}
    for sa in (None, True, False):
        cfg = _cfg(activation_fn_str="topk",
                   activation_fn_kwargs=(("k", 16),),
                   fused_store_acts=sa)
        state, ms = _run_steps(cfg, 3)
        states[sa] = (np.asarray(state.params["W_enc"]),
                      np.asarray(ms[-1].loss))
    for sa in (True, False):
        np.testing.assert_array_equal(states[sa][0], states[None][0])
        np.testing.assert_array_equal(states[sa][1], states[None][1])
