"""SAE training: one fully-jitted train step + the orchestrating trainer.

Counterpart of ``/root/reference/src/vit_prisma/sae/train_sae.py:61``
(``VisionSAETrainer``).  The reference's eager train_step (:278-411) —
unit-norm projection, ghost mask, forward/backward, grad clip,
remove-parallel-gradient, Adam, scheduler, fired/act-freq bookkeeping — is
here ONE XLA program over a carried :class:`SAETrainState`; the host loop
only feeds batches and reads metrics at the logging cadence.  Dead-feature
counters live on-device as carried state, so there is no host sync in the
hot loop.
"""

from __future__ import annotations

import os
import time
from functools import partial
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from vit_prisma_tpu.sae.config import SAERunnerConfig
from vit_prisma_tpu.sae.geometric_median import compute_geometric_median
from vit_prisma_tpu.sae.sae import (
    SparseAutoencoder,
    init_sae_params,
    remove_gradient_parallel_to_decoder_directions,
    sae_forward,
    set_decoder_norm_to_unit_norm,
)
from vit_prisma_tpu.sae.schedulers import get_schedule

Params = Dict[str, jax.Array]


class SAETrainState(NamedTuple):
    params: Params
    opt_state: Any
    act_freq_scores: jax.Array            # [d_sae]
    n_forward_passes_since_fired: jax.Array  # [d_sae]
    n_frac_active_tokens: jax.Array       # scalar
    step: jax.Array                       # scalar int
    n_training_tokens: jax.Array          # scalar int


class StepMetrics(NamedTuple):
    loss: jax.Array
    mse_loss: jax.Array
    l1_loss: jax.Array
    ghost_grad_loss: jax.Array
    aux_reconstruction_loss: jax.Array
    l0: jax.Array
    explained_variance: jax.Array
    n_dead_features: jax.Array
    lr_multiplier: jax.Array


def make_optimizer(cfg: SAERunnerConfig):
    schedule = get_schedule(cfg.lr_scheduler_name,
                            warm_up_steps=cfg.lr_warm_up_steps,
                            training_steps=cfg.total_training_steps)
    lr_fn = lambda step: cfg.lr * schedule(step)
    return optax.adam(lr_fn, b1=cfg.adam_b1, b2=cfg.adam_b2), schedule


def _cast_moments(opt_state, cfg: SAERunnerConfig):
    """Store the Adam moments in ``cfg.adam_dtype`` (bf16 halves the
    dominant optimizer-state HBM traffic; the fused pass reads them back to
    fp32 for the update math — ops/opt_step.py)."""
    if cfg.adam_dtype == "float32":
        return opt_state
    if not cfg.fused_optimizer:
        raise ValueError("adam_dtype='bfloat16' requires fused_optimizer "
                         "(the optax path would silently re-promote the "
                         "moments to fp32 after one step)")
    dt = jnp.dtype(cfg.adam_dtype)
    adam_st = opt_state[0]
    cast = lambda t: jax.tree.map(lambda a: a.astype(dt), t)
    return (adam_st._replace(mu=cast(adam_st.mu), nu=cast(adam_st.nu)),
            *opt_state[1:])


def init_train_state(cfg: SAERunnerConfig, params: Optional[Params] = None,
                     key: Optional[jax.Array] = None) -> SAETrainState:
    if params is None:
        params = init_sae_params(
            cfg, key if key is not None else jax.random.PRNGKey(cfg.seed))
    opt, _ = make_optimizer(cfg)
    return SAETrainState(
        params=params,
        opt_state=_cast_moments(opt.init(params), cfg),
        act_freq_scores=jnp.zeros((cfg.d_sae,), jnp.float32),
        n_forward_passes_since_fired=jnp.zeros((cfg.d_sae,), jnp.float32),
        n_frac_active_tokens=jnp.zeros((), jnp.float32),
        step=jnp.zeros((), jnp.int32),
        n_training_tokens=jnp.zeros((), jnp.int64)
        if jax.config.jax_enable_x64 else jnp.zeros((), jnp.int32),
    )


def _sae_train_step_impl(state: SAETrainState, batch: jax.Array,
                         cfg: SAERunnerConfig,
                         target: Optional[jax.Array] = None
                         ) -> Tuple[SAETrainState, StepMetrics]:
    """Un-jitted step body — shared by the jitted single-SAE step and the
    vmapped all-layer sweep step."""
    opt, schedule = make_optimizer(cfg)

    # 1. decoder unit-norm projection before forward (train_sae.py:305)
    params = set_decoder_norm_to_unit_norm(state.params)

    # 2. ghost mask from fired counters (train_sae.py:330-332)
    ghost_mask = state.n_forward_passes_since_fired > cfg.dead_feature_window

    # 3. forward/backward — optionally in cfg.compute_dtype (bf16 GEMMs +
    # bf16 feature-act traffic; the cast sits inside loss_fn so jax.grad
    # returns fp32 grads against the fp32 master params, and clip/
    # parallel-removal/Adam below run unchanged)
    compute_dt = cfg.compute_jax_dtype

    def loss_fn(p):
        b, t = batch, target
        if compute_dt is not None:
            p = jax.tree.map(lambda a: a.astype(compute_dt), p)
            b = batch.astype(compute_dt)
            t = None if target is None else target.astype(compute_dt)
        out = sae_forward(p, cfg, b, y=t,
                          dead_neuron_mask=ghost_mask, training=True)
        return out.loss, out

    grads, out = jax.grad(loss_fn, has_aux=True)(params)

    if cfg.fused_optimizer:
        # 4+5 fused: clip -> parallel-removal -> Adam in single passes per
        # tensor (ops/opt_step.py; optax-identical math and state layout).
        from vit_prisma_tpu.ops.opt_step import fused_clip_project_adam
        lift = lambda t: jax.tree.map(lambda a: jnp.asarray(a)[None], t)
        drop = lambda t: jax.tree.map(lambda a: a[0], t)
        lr = cfg.lr * schedule(state.opt_state[1].count)
        new_p1, new_opt1 = fused_clip_project_adam(
            lift(params), lift(grads), lift(state.opt_state),
            lr=jnp.asarray(lr)[None], b1=cfg.adam_b1, b2=cfg.adam_b2,
            max_grad_norm=cfg.max_grad_norm,
            use_kernel=cfg.fused_opt_kernel)
        params, opt_state = drop(new_p1), drop(new_opt1)
    else:
        # 4. clip, then remove parallel grad (train_sae.py:392-397)
        if cfg.max_grad_norm:
            gnorm = optax.global_norm(grads)
            scale = jnp.minimum(1.0, cfg.max_grad_norm / (gnorm + 1e-6))
            grads = jax.tree.map(lambda g: g * scale, grads)
        grads = remove_gradient_parallel_to_decoder_directions(grads, params)

        # 5. Adam + schedule
        updates, opt_state = opt.update(grads, state.opt_state, params)
        params = optax.apply_updates(params, updates)

    # 6. fired/act-freq bookkeeping (train_sae.py:356-365)
    feature_acts = out.feature_acts
    did_fire = (feature_acts > 0).sum(axis=-2) > 0
    fired_counter = jnp.where(did_fire, 0.0,
                              state.n_forward_passes_since_fired + 1.0)
    act_freq = state.act_freq_scores + (jnp.abs(feature_acts) > 0
                                        ).astype(jnp.float32).sum(0)
    n_frac = state.n_frac_active_tokens + batch.shape[0]

    # metrics (train_sae.py:610-673 semantics)
    l0 = (feature_acts > 0).astype(jnp.float32).sum(-1).mean()
    tgt = target if (cfg.is_transcoder and target is not None) else batch
    tgt = tgt.astype(cfg.jax_dtype)
    resid_var = jnp.square(tgt - out.sae_out).sum(-1)
    total_var = jnp.square(tgt - tgt.mean(0)).sum(-1)
    explained_variance = (1 - resid_var / total_var).mean()
    l1_val = out.l1_loss if out.l1_loss is not None else jnp.zeros(())

    new_state = SAETrainState(
        params=params,
        opt_state=opt_state,
        act_freq_scores=act_freq,
        n_forward_passes_since_fired=fired_counter,
        n_frac_active_tokens=n_frac,
        step=state.step + 1,
        n_training_tokens=state.n_training_tokens + batch.shape[0],
    )
    metrics = StepMetrics(
        loss=out.loss, mse_loss=out.mse_loss, l1_loss=l1_val,
        ghost_grad_loss=out.ghost_grad_loss,
        aux_reconstruction_loss=out.aux_reconstruction_loss,
        l0=l0, explained_variance=explained_variance,
        n_dead_features=ghost_mask.sum(),
        lr_multiplier=schedule(state.step))
    return new_state, metrics


def _fused_step_ok(cfg: SAERunnerConfig, n_rows: int,
                   n_layers: int = 1,
                   allow_single_layer: bool = False) -> bool:
    """Config+shape gate for the fused Pallas step (ops/sae_step.py) — the
    standard-ReLU fast path; everything else uses the generic XLA impl.

    Applies only to the MULTI-layer sweep (n_layers >= 2): there XLA's
    lowering of the vmapped step inserts ~15ms of [L, B, d_sae] layout
    copies per step and the kernel wins 1.25x (measured, ViT-L/14 sweep
    shapes).  At L=1 XLA's own GEMM fusion is already within a few percent
    of the kernel and the generic path stays faster.

    ``allow_single_layer``: the shard_map mesh path sets this — its
    per-shard layer count can be 1 while the ALTERNATIVE there is not the
    measured single-device XLA fusion but the GSPMD-partitioned vmapped
    step (which carries the layout-copy overhead regardless), so the
    kernel stays preferable.  TopK also sets it (via
    :func:`_fused_single_ok`): unlike ReLU, the L=1 XLA alternative pays a
    full sort or a standalone threshold-kernel round trip of the
    [B, d_sae] pre-acts, so the fused kernel wins at any layer count."""
    if n_layers < 2 and not allow_single_layer:
        return False
    if not (cfg.fused_sae_step
            and cfg.architecture in ("standard", "gated")
            and cfg.activation_fn_str in ("relu", "topk")
            and cfg.normalize_activations == "none"
            and not cfg.use_ghost_grads
            and not cfg.is_transcoder):
        return False
    itemsize = jnp.dtype(cfg.compute_jax_dtype or cfg.jax_dtype).itemsize
    if cfg.architecture == "gated":
        # gated forward is ReLU-only in the kernel (the reference's gated
        # TopK variant stays on the XLA path)
        if cfg.activation_fn_str != "relu":
            return False
        from vit_prisma_tpu.ops.sae_step import fused_gated_step_eligible
        return fused_gated_step_eligible(n_rows, cfg.d_in, cfg.d_sae,
                                         itemsize)
    if cfg.activation_fn_str == "topk":
        # the fused kernel is EXACT — an explicit approx opt-in keeps the
        # XLA approx_max_k path instead of silently upgrading semantics
        if cfg.topk_use_approx or not cfg.topk_k or cfg.topk_k >= cfg.d_sae:
            return False
        from vit_prisma_tpu.ops.sae_step import fused_topk_step_eligible
        return fused_topk_step_eligible(n_rows, cfg.d_in, cfg.d_sae,
                                        itemsize)
    if cfg.lp_norm != 1.0:
        return False
    from vit_prisma_tpu.ops.sae_step import fused_step_eligible
    return fused_step_eligible(n_rows, cfg.d_in, cfg.d_sae, itemsize)


def _fused_single_ok(cfg: SAERunnerConfig, n_rows: int) -> bool:
    """Single-SAE (L=1) fused-kernel gate: TopK and gated take it (see
    :func:`_fused_step_ok` on why standard-ReLU stays on the XLA path at
    L=1).  For gated, the L=1 XLA alternative pays the reference's second
    encoder GEMM plus two [B, d_sae] HBM round trips — the kernel's
    one-GEMM encoder and VMEM-resident acts win at any layer count
    (measured: docs/PERFORMANCE.md)."""
    return ((cfg.activation_fn_str == "topk"
             or cfg.architecture == "gated")
            and _fused_step_ok(cfg, n_rows, 1, allow_single_layer=True))


def _sae_train_step_fused(state: SAETrainState, batch: jax.Array,
                          cfg: SAERunnerConfig,
                          data_axis: Optional[str] = None,
                          layer_major: bool = False
                          ) -> Tuple[SAETrainState, StepMetrics]:
    """Stacked-layer train step on the fused kernel: ``batch`` [B, L, d_in],
    ``state`` the stacked sweep state (single-SAE callers wrap with L=1).

    ``layer_major``: the batch is already [L, B, d_in].  The kernel wants
    layer-major; a [B, L, d] batch pays a strided 100MB transpose INSIDE
    the step (measured 6.3ms/step at sweep shapes — ~9% of the step).  The
    multi-step paths hoist one [K, B, L, d] -> [K, L, B, d] transpose out
    of the scan instead and pass ``layer_major=True``.

    Same semantics as vmapping :func:`_sae_train_step_impl` over layers for
    the standard-ReLU configuration — the feature activations just never
    round-trip HBM (forward) and are rematerialized tile-wise (backward).
    Per-layer losses are summed for the single jax.grad call (the layers'
    params are disjoint, so the grads are identical to per-layer grads).

    ``data_axis``: mesh axis name when running per-shard under ``shard_map``
    (parallel/mesh.py) — rows are data-parallel, so the step inserts the
    explicit collectives that GSPMD would otherwise place: a pmean for the
    batch mean in the normalized-MSE denominator, a pmean of the grads, a
    psum of the fired/act-freq counters, and pmeans on the reported
    metrics.  With equal shard sizes the result matches the single-device
    global-batch step."""
    from vit_prisma_tpu.ops.sae_step import (sae_fused_apply,
                                             sae_fused_apply_topk,
                                             sae_gated_fused_apply)

    opt, schedule = make_optimizer(cfg)
    B = batch.shape[1] if layer_major else batch.shape[0]
    B_global = B if data_axis is None else B * jax.lax.axis_size(data_axis)
    pmean = (lambda v: v) if data_axis is None \
        else (lambda v: jax.lax.pmean(v, data_axis))
    params = set_decoder_norm_to_unit_norm(state.params)
    ghost_mask = state.n_forward_passes_since_fired > cfg.dead_feature_window
    compute_dt = cfg.compute_jax_dtype
    is_topk = cfg.activation_fn_str == "topk"
    is_gated = cfg.architecture == "gated"
    x = batch if layer_major else jnp.swapaxes(batch, 0, 1)  # [L, B, d_in]

    def loss_fn(p):
        if compute_dt is not None:
            p = jax.tree.map(lambda a: a.astype(compute_dt), p)
        xc = x.astype(p["W_enc"].dtype)
        aux_l = None
        if is_gated:
            y, via, l1_sums, nact = sae_gated_fused_apply(
                xc, p["W_enc"], p["b_gate"], p["r_mag"], p["b_mag"],
                p["W_dec"], p["b_dec"])
        elif is_topk:
            y, l1_sums, nact = sae_fused_apply_topk(
                xc, p["W_enc"], p["b_enc"], p["W_dec"], p["b_dec"],
                k=cfg.topk_k, save_acts=cfg.fused_store_acts)
        else:
            y, l1_sums, nact = sae_fused_apply(
                xc, p["W_enc"], p["b_enc"], p["W_dec"], p["b_dec"],
                save_acts=cfg.fused_store_acts)
        xt = jax.lax.stop_gradient(xc)
        cent = xt - pmean(xt.mean(axis=1, keepdims=True))
        norm = jnp.sqrt(jnp.square(cent).sum(
            axis=-1, keepdims=True, dtype=jnp.float32)).astype(xt.dtype)
        mse_l = (jnp.square(y - xt) / norm).mean(axis=(1, 2),
                                                 dtype=jnp.float32)
        if is_gated:
            # gate L1 (decoder-norm weighted, from the kernel) + aux
            # reconstruction vs sae_in = x - b_dec (b_dec grad LIVE through
            # both terms; reference sae.py:773-792, means over the batch)
            l1_l = cfg.l1_coefficient * l1_sums / B
            sae_in = xt - p["b_dec"][:, None, :]
            aux_l = jnp.square(via - sae_in).sum(
                axis=-1, dtype=jnp.float32).mean(axis=-1)
        else:
            # TopK skips the sparsity penalty (reference sae.py:617-626)
            l1_l = jnp.zeros_like(mse_l) if is_topk \
                else cfg.l1_coefficient * l1_sums / B
        if aux_l is None:
            aux_l = jnp.zeros_like(mse_l)
        loss_l = mse_l + l1_l + aux_l
        return loss_l.sum(), (y, nact, mse_l, l1_l, aux_l, loss_l)

    grads, (y, nact, mse_l, l1_l, aux_l, loss_l) = \
        jax.grad(loss_fn, has_aux=True)(params)
    if data_axis is not None:
        # mean of per-shard grads == grad of the global-batch mean loss
        grads = jax.tree.map(lambda g: jax.lax.pmean(g, data_axis), grads)
        nact = jax.lax.psum(nact, data_axis)
        mse_l, l1_l, loss_l = pmean(mse_l), pmean(l1_l), pmean(loss_l)
        aux_l = pmean(aux_l)

    # clip -> parallel-removal -> Adam, per layer (identical to the
    # vmapped generic path; the L axis maps over every state leaf)
    if cfg.fused_optimizer:
        from vit_prisma_tpu.ops.opt_step import fused_clip_project_adam
        lr = cfg.lr * schedule(state.opt_state[1].count)  # [L]
        new_params, new_opt = fused_clip_project_adam(
            grads=grads, params=params, opt_state=state.opt_state,
            lr=lr, b1=cfg.adam_b1, b2=cfg.adam_b2,
            max_grad_norm=cfg.max_grad_norm,
            use_kernel=cfg.fused_opt_kernel)
    else:
        def post(g, p, opt_state):
            if cfg.max_grad_norm:
                gnorm = optax.global_norm(g)
                scale = jnp.minimum(1.0, cfg.max_grad_norm / (gnorm + 1e-6))
                g = jax.tree.map(lambda t: t * scale, g)
            g = remove_gradient_parallel_to_decoder_directions(g, p)
            updates, opt_state = opt.update(g, opt_state, p)
            return optax.apply_updates(p, updates), opt_state

        new_params, new_opt = jax.vmap(post)(grads, params, state.opt_state)

    # counters: nact IS the reference's (|h| > 0).sum(0) (train_sae.py:
    # 356-365; exact comparisons, bf16-safe)
    did_fire = nact > 0
    fired_counter = jnp.where(did_fire, 0.0,
                              state.n_forward_passes_since_fired + 1.0)
    act_freq = state.act_freq_scores + nact
    l0 = nact.sum(axis=-1) / B_global

    xt = x.astype(cfg.jax_dtype)
    resid_var = jnp.square(xt - y.astype(xt.dtype)).sum(-1)
    total_var = jnp.square(xt - pmean(xt.mean(axis=1, keepdims=True))
                           ).sum(-1)
    explained_variance = pmean((1 - resid_var / total_var).mean(axis=-1))

    zeros_l = jnp.zeros_like(loss_l)
    new_state = SAETrainState(
        params=new_params,
        opt_state=new_opt,
        act_freq_scores=act_freq,
        n_forward_passes_since_fired=fired_counter,
        n_frac_active_tokens=state.n_frac_active_tokens + B_global,
        step=state.step + 1,
        n_training_tokens=state.n_training_tokens + B_global,
    )
    metrics = StepMetrics(
        loss=loss_l, mse_loss=mse_l, l1_loss=l1_l,
        ghost_grad_loss=zeros_l, aux_reconstruction_loss=aux_l,
        l0=l0, explained_variance=explained_variance,
        n_dead_features=ghost_mask.sum(axis=-1).astype(jnp.float32),
        lr_multiplier=schedule(state.step))
    return new_state, metrics


@partial(jax.jit, static_argnames=("cfg",), donate_argnames=("state",))
def sae_train_step(state: SAETrainState, batch: jax.Array,
                   cfg: SAERunnerConfig,
                   target: Optional[jax.Array] = None
                   ) -> Tuple[SAETrainState, StepMetrics]:
    """One training step (train_sae.py:278-411), fully on-device.

    ``batch``: [train_batch_size, d_in] activation rows (``target`` is the
    output-hook activations for transcoders).  The state buffer is donated —
    the step updates in place in HBM.

    TopK configs route through the fused Pallas step as a 1-layer stack
    (the lift/drop reshapes are free under jit): the unfused alternative
    pays a full [B, d_sae] sort or threshold-kernel round trip every step.
    """
    if target is None and _fused_single_ok(cfg, batch.shape[0]):
        lifted = jax.tree.map(lambda a: a[None], state)
        new1, m1 = _sae_train_step_fused(lifted, batch[:, None, :], cfg)
        return (jax.tree.map(lambda a: a[0], new1),
                jax.tree.map(lambda a: a[0], m1))
    return _sae_train_step_impl(state, batch, cfg, target)


def _apply_window_reset(state: SAETrainState,
                        cfg: SAERunnerConfig) -> SAETrainState:
    """In-program feature-sparsity window reset (train_sae.py:309-327):
    zero the act-freq counters whenever the post-step count hits a
    ``feature_sampling_window`` multiple.  Equivalent to the host-side
    :func:`reset_sparsity_counters` call of the single-step path; used by
    the fused multi-step programs where the host never sees the
    intermediate steps.  ``state.step`` may be scalar or [L] (sweep)."""
    w = cfg.feature_sampling_window
    if not w:
        return state
    keep = 1.0 - ((state.step % w) == 0).astype(jnp.float32)
    af = state.act_freq_scores * jnp.reshape(
        keep, keep.shape + (1,) * (state.act_freq_scores.ndim - keep.ndim))
    nf = state.n_frac_active_tokens * keep
    return state._replace(act_freq_scores=af, n_frac_active_tokens=nf)


def _multistep_body(state: SAETrainState, batches: jax.Array,
                    cfg: SAERunnerConfig,
                    targets: Optional[jax.Array] = None
                    ) -> Tuple[SAETrainState, StepMetrics]:
    """Unjitted K-step scan body shared by :func:`sae_train_multistep` and
    the fused cycle program (:func:`make_fused_cycle`)."""
    if targets is None:
        if _fused_single_ok(cfg, batches.shape[1]):
            lifted = jax.tree.map(lambda a: a[None], state)

            def body_k(s, b):
                # [B, d] -> [L=1, B, d] is a free reshape (layer-major)
                s, m = _sae_train_step_fused(s, b[None], cfg,
                                             layer_major=True)
                return _apply_window_reset(s, cfg), m
            new1, m1 = jax.lax.scan(body_k, lifted, batches)
            return (jax.tree.map(lambda a: a[0], new1),
                    jax.tree.map(lambda a: a[:, 0], m1))

        def body(s, b):
            s, m = _sae_train_step_impl(s, b, cfg)
            return _apply_window_reset(s, cfg), m
        return jax.lax.scan(body, state, batches)

    def body_t(s, bt):
        s, m = _sae_train_step_impl(s, bt[0], cfg, bt[1])
        return _apply_window_reset(s, cfg), m
    return jax.lax.scan(body_t, state, (batches, targets))


@partial(jax.jit, static_argnames=("cfg",), donate_argnames=("state",))
def sae_train_multistep(state: SAETrainState, batches: jax.Array,
                        cfg: SAERunnerConfig,
                        targets: Optional[jax.Array] = None
                        ) -> Tuple[SAETrainState, StepMetrics]:
    """K training steps as ONE XLA program: ``lax.scan`` of the step body
    over ``batches`` [K, B, d_in] (``targets`` likewise for transcoders).

    One host dispatch per K steps instead of per step — the dominant cost
    of the eager loop this replaces (reference train_sae.py:792) once the
    step itself is a single compiled program.  Metrics come back stacked
    [K, ...] so logging cadence/abort checks see exactly the per-step
    values; sparsity-window resets fire in-program at the same step counts
    as the host-side single-step path."""
    return _multistep_body(state, batches, cfg, targets)


@partial(jax.jit, static_argnames=("cfg",), donate_argnames=("state",))
def sae_sweep_train_step(state: SAETrainState, batch: jax.Array,
                         cfg: SAERunnerConfig
                         ) -> Tuple[SAETrainState, StepMetrics]:
    """All-layer sweep step: train L independent SAEs simultaneously from
    one harvested batch.

    ``state`` leaves carry a leading layer axis [L, ...]; ``batch`` is
    [B, L, d_in] (one token row per layer from the shared cached forward).
    vmap turns the per-SAE GEMMs into batched [L, B, d] x [L, d, d_sae]
    contractions — the TPU-native replacement for running the reference's
    trainer once per layer."""
    if _fused_step_ok(cfg, batch.shape[0], batch.shape[1]):
        return _sae_train_step_fused(state, batch, cfg)
    step = lambda s, b: _sae_train_step_impl(s, b, cfg)
    return jax.vmap(step)(state, jnp.swapaxes(batch, 0, 1))


def _sweep_multistep_body(state: SAETrainState, batches: jax.Array,
                          cfg: SAERunnerConfig
                          ) -> Tuple[SAETrainState, StepMetrics]:
    """Unjitted sweep K-step body (shared with the fused cycle)."""
    if _fused_step_ok(cfg, batches.shape[1], batches.shape[2]):
        # one [K, B, L, d] -> [K, L, B, d] transpose outside the scan
        # instead of a strided 100MB transpose inside every step
        batches_t = jnp.swapaxes(batches, 1, 2)

        def body_f(s, b):
            s, m = _sae_train_step_fused(s, b, cfg, layer_major=True)
            return _apply_window_reset(s, cfg), m
        return jax.lax.scan(body_f, state, batches_t)

    def body(s, b):
        step = lambda ss, bb: _sae_train_step_impl(ss, bb, cfg)
        s, m = jax.vmap(step)(s, jnp.swapaxes(b, 0, 1))
        return _apply_window_reset(s, cfg), m
    return jax.lax.scan(body, state, batches)


@partial(jax.jit, static_argnames=("cfg",), donate_argnames=("state",))
def sae_sweep_train_multistep(state: SAETrainState, batches: jax.Array,
                              cfg: SAERunnerConfig
                              ) -> Tuple[SAETrainState, StepMetrics]:
    """K sweep steps in one XLA program: scan of the vmapped all-layer step
    over ``batches`` [K, B, L, d_in].  Metrics stack to [K, L, ...]."""
    return _sweep_multistep_body(state, batches, cfg)


def _warn_unserved_half(ptr: int, half: int) -> None:
    """train_cycles assumes the buffer's first half has been fully served
    (ptr == half) before its first cycle; entering earlier silently drops
    the unserved rows from the training stream (the cycle overwrites them
    in the mix), diverging from the next_batches/train_steps equivalence —
    surface that, mirroring next_batches' early-refill warning."""
    if ptr != half:
        import warnings
        warnings.warn(
            f"train_cycles entered with store.ptr={ptr} != half={half}: "
            f"{half - ptr} already-harvested rows will be dropped unserved "
            "by the first cycle's mix. Serve them first (next_batches / "
            "train_steps) to keep the documented stream equivalence.",
            stacklevel=3)


def make_fused_cycle(cfg: SAERunnerConfig, store):
    """Build the fused steady-state cycle: gather images -> harvest the
    fresh half -> buffer mix -> K train steps, ALL as one XLA program.

    Why: on a single chip the refill's harvest and mix serialize with the
    train steps anyway — what the multi-dispatch path pays extra is host
    round-trip latency per dispatch (the dominant refill overhead once the
    dataset is device-resident).  One dispatch per cycle removes it, and
    XLA schedules the whole cycle (reference counterpart: the eager
    refill-then-train loop of train_sae.py:772-861 /
    activations_store.py:445-503).

    Requirements (asserted): ``store.fused_cycle_available`` (device-
    resident dataset, single device, prefetch off) and
    ``K * train_batch_size == half the buffer`` so one cycle serves
    exactly the refilled half.  The image stream, mix-key stream, and row
    semantics are identical to the ``next_batches``/``train_steps`` path
    (test-gated by tests/test_fused_cycle.py).

    Returns ``cycle(state, buffer, key, idx) -> (state, buffer, metrics)``
    with ``state`` and ``buffer`` donated; ``idx`` is
    ``store.next_cycle_indices()`` and ``key`` ``store.advance_key()``.
    """
    assert store.fused_cycle_available, (
        "fused cycle needs a device-resident dataset, a single-device "
        "store, and prefetch=False")
    bs = cfg.train_batch_size
    half = store.buffer.shape[0] // 2
    K = half // bs
    assert K * bs == half, (
        f"train_batch_size({bs}) must divide the half-buffer ({half})")
    harvest_body = store.harvest_body
    n_fresh = half  # the floor half is harvested (ceil half retained),
    #               matching _refill_half / _mix exactly
    sweep = bool(cfg.sweep_layers)
    from vit_prisma_tpu.ops.shuffle import permute_rows

    # params/dev_images are explicit operands, NOT closure captures — a
    # captured array is baked into the program as a constant, which bloats
    # the serialized HLO by the full parameter size (remote-compile
    # services reject it outright)
    @partial(jax.jit, donate_argnums=(0, 1))
    def _cycle(state, buffer, key, idx, params, dev_images, aug_keys):
        imgs = jnp.take(dev_images, idx.reshape(-1),
                        axis=0).reshape(idx.shape + dev_images.shape[1:])
        if aug_keys is None:
            rows = jax.lax.map(lambda im: harvest_body(params, im), imgs)
        else:
            # per-store-batch augmentation keys, same stream order as the
            # stepwise path's get_activations chunks
            rows = jax.lax.map(
                lambda a: harvest_body(params, a[0], a[1]),
                (imgs, aug_keys))
        fresh = rows.reshape((-1,) + rows.shape[2:])[:n_fresh]
        merged = jnp.concatenate([buffer[half:], fresh], axis=0)
        buffer2 = permute_rows(key, merged)
        batches = buffer2[:K * bs].reshape((K, bs) + buffer2.shape[1:])
        if sweep:
            state, metrics = _sweep_multistep_body(state, batches, cfg)
        else:
            state, metrics = _multistep_body(state, batches, cfg)
        return state, buffer2, metrics

    def cycle(state, buffer, key, idx):
        aug_keys = (store.advance_aug_keys(idx.shape[0])
                    if store.augment is not None else None)
        return _cycle(state, buffer, key, idx, store.model.params,
                      store._dev_images, aug_keys)

    return cycle


def init_sweep_state(cfg: SAERunnerConfig, n_layers: int,
                     key: Optional[jax.Array] = None) -> SAETrainState:
    """Stacked train state for ``n_layers`` independent SAEs."""
    if key is None:
        key = jax.random.PRNGKey(cfg.seed)
    keys = jax.random.split(key, n_layers)
    states = [init_train_state(cfg, key=k) for k in keys]
    return jax.tree.map(lambda *xs: jnp.stack(xs), *states)


def reset_sparsity_counters(state: SAETrainState) -> SAETrainState:
    """Feature-sparsity window reset (train_sae.py:309-327)."""
    return state._replace(
        act_freq_scores=jnp.zeros_like(state.act_freq_scores),
        n_frac_active_tokens=jnp.zeros_like(state.n_frac_active_tokens))


def initialize_b_dec(cfg: SAERunnerConfig, params: Params,
                     activations: jax.Array) -> Params:
    """b_dec init from stored activations (sae.py:196-242,
    train_sae.py:245-276)."""
    out = dict(params)
    if cfg.b_dec_init_method == "geometric_median":
        out["b_dec"] = compute_geometric_median(
            activations, maxiter=100).median.astype(cfg.jax_dtype)
    elif cfg.b_dec_init_method == "mean":
        out["b_dec"] = activations.mean(0).astype(cfg.jax_dtype)
    elif cfg.b_dec_init_method == "zeros":
        pass
    return out


def _token_thresholds(cfg: SAERunnerConfig, n: int):
    """Evenly-spaced token thresholds (train_sae.py:211-220)."""
    if not n:
        return []
    total = cfg.total_training_tokens
    return list(range(0, total, total // n))[1:]


def _build_val_batch(eval_dataset, n: int):
    """One fixed labelled eval batch (images, labels) from a dataset of
    (image, label) items or bare images (train_sae.py:414-445)."""
    items = [eval_dataset[i] for i in range(n)]
    if isinstance(items[0], (tuple, list)):
        images = np.stack([np.asarray(it[0]) for it in items])
        labels = np.asarray([int(it[1]) for it in items])
    else:
        images = np.stack([np.asarray(it) for it in items])
        labels = np.zeros((n,), np.int64)
    return jnp.asarray(images), jnp.asarray(labels)


def _class_emb_or_identity(model, images, class_embeddings):
    """Class directions for the substitution CE: the provided zero-shot /
    probe matrix, else an identity readout over the model's own output."""
    if class_embeddings is not None:
        return jnp.asarray(class_embeddings)
    probe = model(images[:1])
    return jnp.eye(probe.shape[-1], dtype=probe.dtype)


class VisionSAETrainer:
    """Orchestrator (train_sae.py:61-861): streams token rows from an
    activation store into the jitted step; handles sparsity-window resets,
    checkpoints, optional wandb, and bad-run aborts."""

    def __init__(self, cfg: SAERunnerConfig, model=None, store=None,
                 key: Optional[jax.Array] = None,
                 eval_dataset=None, class_embeddings=None, mesh=None):
        self.cfg = cfg
        self.model = model
        self.store = store
        self.mesh = mesh if mesh is not None else getattr(store, "mesh", None)
        self.key = key if key is not None else jax.random.PRNGKey(cfg.seed)
        params = init_sae_params(cfg, self.key)
        if store is not None and cfg.b_dec_init_method != "zeros":
            sample = store.peek_tokens(min(4096 * 8, cfg.tokens_per_buffer))
            params = initialize_b_dec(cfg, params, sample)
        self.state = init_train_state(cfg, params=params)
        # Host mirror of the device step counter: cadence decisions
        # (sparsity-window resets, log frequency) read this instead of
        # ``int(self.state.step)`` — a per-step device fetch would force a
        # full sync and serialize the dispatch pipeline.  Synced from the
        # state here and in :meth:`load_state`; swap states through that
        # method (not by assigning ``.state``) to keep the cadences
        # resume-correct.
        self._host_step = int(self.state.step)
        self._sharded_step = None
        self._sharded_multistep = None
        if self.mesh is not None:
            # dp(batch) x tp(d_sae) feature-parallel step — SURVEY §2.11;
            # the whole train state (params + Adam moments + counters) is
            # placed on the mesh once and donated every step.
            from vit_prisma_tpu.parallel.mesh import shard_sae_train_step
            place, step = shard_sae_train_step(cfg, self.mesh, self.state)
            self.state = place(self.state)
            self._sharded_step = step
        self.checkpoint_thresholds = self._make_checkpoint_thresholds()
        self.validation_thresholds = self._make_thresholds(cfg.n_validation_runs)
        # in-training validation inputs (train_sae.py:414-535): a labelled
        # eval dataset and class directions for the substitution CE
        self.eval_dataset = eval_dataset if eval_dataset is not None else \
            getattr(store, "eval_dataset", None)
        self.class_embeddings = class_embeddings
        self._val_step = None
        self._val_batch = None
        self._wandb = None
        if cfg.log_to_wandb:
            try:
                import wandb
                self._wandb = wandb
                wandb.init(project=cfg.wandb_project, entity=cfg.wandb_entity,
                           config=cfg.to_dict())
            except Exception:
                self._wandb = None

    def _make_thresholds(self, n: int):
        return _token_thresholds(self.cfg, n)

    def _make_checkpoint_thresholds(self):
        return _token_thresholds(self.cfg, self.cfg.n_checkpoints)

    @staticmethod
    def load_dataset(cfg: SAERunnerConfig):
        """(train, eval) datasets from cfg (train_sae.py:149-209):
        ``imagenet1k`` (folder-per-class train/val paths), ``cifar10``
        (pickle batches under dataset_path), or any image folder with an
        80/20 split.  Items are (image[C,H,W] float32, label)."""
        from vit_prisma_tpu.dataloaders.transforms import get_model_transforms
        transform = get_model_transforms(cfg.model_name)

        if cfg.dataset_name == "imagenet1k":
            from vit_prisma_tpu.dataloaders.imagenet import ImageFolderDataset
            train = ImageFolderDataset(
                cfg.dataset_train_path or cfg.dataset_path,
                transform=transform)
            all_jpeg = all(p.lower().endswith((".jpg", ".jpeg"))
                           for p, _ in train.samples)
            if cfg.use_native_loader and not all_jpeg:
                import warnings
                warnings.warn("use_native_loader: dataset contains "
                              "non-JPEG images the C++ decoder cannot "
                              "read; keeping the indexed PIL pipeline")
            if cfg.use_native_loader and all_jpeg:
                # the C++ prefetching worker pool feeds the store directly
                # (batch-iterator protocol) with the MODEL's preprocessing
                # stats; val stays indexed for the labeled eval passes
                from vit_prisma_tpu.dataloaders.native import (
                    NativeBatchLoader)
                from vit_prisma_tpu.dataloaders.transforms import (
                    get_model_transform_params)
                _, mean, std = get_model_transform_params(cfg.model_name)
                train = NativeBatchLoader(
                    [p for p, _ in train.samples],
                    batch_size=cfg.store_batch_size,
                    out_size=cfg.image_size,  # what the harvest model eats
                    mean=mean, std=std, seed=cfg.seed,
                    uint8_wire=(cfg.store_wire_dtype == "uint8"))
            val = ImageFolderDataset(
                cfg.dataset_val_path or cfg.dataset_path,
                transform=transform)
            return train, val
        if cfg.dataset_name == "cifar10":
            from vit_prisma_tpu.dataloaders.cifar import load_cifar_10
            train, val, _ = load_cifar_10(cfg.dataset_path,
                                          image_size=cfg.image_size)
            return train, val
        # generic image folder, 80/20 split (train_sae.py:186-203)
        from vit_prisma_tpu.dataloaders.imagenet import ImageFolderDataset
        ds = ImageFolderDataset(cfg.dataset_path, transform=transform)
        rng = np.random.default_rng(cfg.seed)
        order = rng.permutation(len(ds))
        n_train = int(0.8 * len(ds))
        train = [ds[int(i)] for i in order[:n_train]]
        val = [ds[int(i)] for i in order[n_train:]]
        return train, val

    @property
    def sae(self) -> SparseAutoencoder:
        return SparseAutoencoder(self.cfg, params=self.state.params)

    def train_step(self, batch, target=None):
        if self._sharded_step is not None and target is None:
            self.state, metrics = self._sharded_step(self.state, batch)
        else:
            # transcoder targets fall back to the plain jit; with a placed
            # sharded state GSPMD propagates the same layouts.
            self.state, metrics = sae_train_step(self.state, batch, self.cfg,
                                                 target)
        self._host_step += 1
        w = self.cfg.feature_sampling_window
        if w and (self._host_step % w) == 0:
            self.state = reset_sparsity_counters(self.state)
        return metrics

    def train_steps(self, batches, targets=None) -> StepMetrics:
        """K fused train steps from one dispatch (``sae_train_multistep``).

        ``batches``: [K, B, d_in] (pair with ``store.next_batches(K)``).
        Returns per-step metrics stacked on the leading axis; the
        sparsity-window resets fire inside the program."""
        if targets is None and self.mesh is not None:
            if self._sharded_multistep is None:
                from vit_prisma_tpu.parallel.mesh import \
                    shard_sae_train_multistep
                self._sharded_multistep = shard_sae_train_multistep(
                    self.cfg, self.mesh, self.state)
            self.state, metrics = self._sharded_multistep(self.state, batches)
        else:
            self.state, metrics = sae_train_multistep(self.state, batches,
                                                      self.cfg, targets)
        self._host_step += batches.shape[0]
        return metrics

    def train_cycles(self, n_cycles: int) -> StepMetrics:
        """``n_cycles`` fused steady-state cycles: refill + the half-
        buffer's train steps in ONE dispatch each (:func:`make_fused_cycle`
        — see :meth:`SAESweepTrainer.train_cycles`).  Returns the LAST
        cycle's stacked per-step metrics (intermediate cycles' metrics are
        not materialized — use :meth:`train_steps` for per-step logging)."""
        store = self.store
        if n_cycles < 1:
            raise ValueError(f"train_cycles requires n_cycles >= 1 "
                             f"(got {n_cycles})")
        if getattr(self, "_cycle", None) is None:
            self._cycle = make_fused_cycle(self.cfg, store)
        half = store.buffer.shape[0] // 2
        _warn_unserved_half(store.ptr, half)
        K = half // self.cfg.train_batch_size
        metrics = None
        for _ in range(n_cycles):
            idx = jnp.asarray(store.next_cycle_indices(), jnp.int32)
            self.state, store.buffer, metrics = self._cycle(
                self.state, store.buffer, store.advance_key(), idx)
            self._host_step += K
        store.ptr = half
        return metrics

    def load_state(self, state: SAETrainState) -> "VisionSAETrainer":
        """Swap in a (resumed) train state and re-sync the host-side step
        mirror, keeping sparsity-window/step cadences resume-correct."""
        self.state = state
        self._host_step = int(np.asarray(state.step).reshape(-1)[0])
        return self

    def log_metrics(self, metrics: StepMetrics, step: Optional[int] = None):
        host = jax.device_get(metrics)  # one transfer for all fields
        vals = {k: float(getattr(host, k)) for k in metrics._fields}
        if self._wandb is not None:
            self._wandb.log(vals, step=self._host_step if step is None
                            else step)
        return vals

    def check_run_tolerance(self, metrics: StepMetrics) -> bool:
        """Bad-run abort conditions (train_sae.py:637-644).  Returns True if
        the run should be aborted."""
        if self.cfg.min_l0 is not None and float(metrics.l0) < self.cfg.min_l0:
            return True
        if (self.cfg.min_explained_variance is not None and
                float(metrics.explained_variance) < self.cfg.min_explained_variance):
            return True
        return False

    # -- in-training validation (train_sae.py:414-535) ---------------------
    def _get_val_inputs(self):
        """One fixed labelled eval batch (images, labels), lazily built."""
        if self._val_batch is None and self.eval_dataset is not None:
            self._val_batch = _build_val_batch(
                self.eval_dataset, min(self.cfg.store_batch_size,
                                       len(self.eval_dataset)))
        return self._val_batch

    def validate(self) -> Optional[Dict[str, float]]:
        """One validation pass: EV/L0/cos-sim on held-out data, plus the
        substitution CE (clean/recon/zero-ablated + CE-recovered score)
        when class embeddings are available (train_sae.py:414-535, fused
        like sae/evals.py).  Returns the metric dict (also wandb-logged
        under ``validation_metrics/``), or None if no eval data."""
        batch = self._get_val_inputs()
        if batch is None or self.model is None:
            return None
        images, labels = batch
        class_emb = _class_emb_or_identity(self.model, images,
                                           self.class_embeddings)
        if self._val_step is None:
            from vit_prisma_tpu.sae.evals import make_eval_step
            self._val_step = make_eval_step(self.model, self.sae)
        s = self._val_step(self.model.params, self.state.params,
                           images, labels, class_emb)
        clean = float(s.loss)
        recons = float(s.recons_loss)
        zero = float(s.zero_abl_loss)
        denom = zero - clean
        score = (zero - recons) / denom if abs(denom) > 1e-9 else float("nan")
        vals = {
            "validation_metrics/substitution_loss": recons,
            "validation_metrics/zero_ablation_loss": zero,
            "validation_metrics/model_loss": clean,
            "validation_metrics/substitution_score": score,
            "validation_metrics/L0": float(np.mean(np.asarray(s.l0_image))),
            "validation_metrics/cos_sim": float(s.cos_sim),
        }
        if self._wandb is not None:
            self._wandb.log(vals, step=int(self.state.step))
        if self.cfg.verbose:
            print(f"val @ step {int(self.state.step)}: "
                  f"CE-recovered {score:.3f} "
                  f"(clean {clean:.4f} recon {recons:.4f} zero {zero:.4f})")
        return vals

    def check_validation_tolerance(self, vals: Dict[str, float]) -> bool:
        """True if the run should abort on a CE-recovered regression."""
        if self.cfg.min_ce_recovered is None:
            return False
        score = vals.get("validation_metrics/substitution_score")
        return score is not None and score == score and \
            score < self.cfg.min_ce_recovered

    def save_checkpoint(self, tag: Optional[str] = None):
        sae = self.sae
        n = tag if tag is not None else f"n_tokens_{int(self.state.n_training_tokens)}"
        path = os.path.join(self.cfg.checkpoint_path, f"{sae.get_name()}_{n}")
        sae.save_model(path)
        # log feature sparsity alongside (train_sae.py:697-746)
        sparsity = np.asarray(
            self.state.act_freq_scores /
            jnp.maximum(self.state.n_frac_active_tokens, 1.0))
        np.save(path + "_log_feature_sparsity.npy",
                np.log10(sparsity + 1e-10))
        if self._wandb is not None and self.cfg.wandb_checkpoint_artifacts:
            self._upload_checkpoint_artifact(path)
        return path

    def _upload_checkpoint_artifact(self, path: str):
        """wandb model + sparsity artifacts (train_sae.py:697-746)."""
        try:
            run_id = self._wandb.run.id if self._wandb.run else "run"
            name = os.path.basename(path).replace("/", "_")
            model_art = self._wandb.Artifact(
                f"{name}_{run_id}", type="model",
                metadata=dict(self.cfg.to_dict()))
            model_file = path if os.path.exists(path) else path + ".npz"
            model_art.add_file(model_file)
            self._wandb.log_artifact(model_art,
                                     aliases=["latest", f"step_{int(self.state.step)}"])
            sparsity_art = self._wandb.Artifact(
                f"{name}_log_feature_sparsity_{run_id}", type="log_feature_sparsity",
                metadata=dict(self.cfg.to_dict()))
            sparsity_art.add_file(path + "_log_feature_sparsity.npy")
            self._wandb.log_artifact(sparsity_art)
        except Exception as e:  # artifact upload must never kill training
            if self.cfg.verbose:
                print(f"wandb artifact upload failed: {e}")

    def run(self, max_steps: Optional[int] = None) -> SparseAutoencoder:
        """Main loop driven by total_training_tokens (train_sae.py:772-861):
        train steps + periodic logging, in-training validation with
        CE-recovered abort (:414-535), and token-threshold checkpoints."""
        assert self.store is not None, "run() requires an activation store"
        total = self.cfg.total_training_tokens
        thresholds = list(self.checkpoint_thresholds)
        val_thresholds = list(self.validation_thresholds)
        k = max(1, int(self.cfg.steps_per_dispatch))
        bs = self.cfg.train_batch_size
        freq = self.cfg.wandb_log_frequency
        step = 0
        # one sync here, then pure host accounting (tokens advance by a
        # static amount per dispatch) — the loop never blocks on the device
        # except at logging/validation cadence
        self._host_step = int(self.state.step)
        start_step = self._host_step  # resumed runs keep global step ids
        n_tokens = int(self.state.n_training_tokens)
        t0 = time.time()
        while n_tokens < total:
            if max_steps is not None and step >= max_steps:
                break
            # clamp the final chunk so max_steps is exact (a short chunk
            # compiles its own multistep program once)
            chunk = k if max_steps is None else min(k, max_steps - step)
            if chunk == 1:
                batch = self.store.next_batch()
                if self.cfg.is_transcoder:
                    metrics = self.train_step(batch[..., 0, :],
                                              batch[..., 1, :])
                else:
                    metrics = self.train_step(batch)
            else:
                batches = self.store.next_batches(chunk)
                if self.cfg.is_transcoder:
                    metrics = self.train_steps(batches[..., 0, :],
                                               batches[..., 1, :])
                else:
                    metrics = self.train_steps(batches)
            for j in range(chunk):
                step += 1
                n_tokens += bs
                if step % freq:
                    continue
                m = metrics if chunk == 1 else \
                    jax.tree.map(lambda a, j=j: a[j], metrics)
                vals = self.log_metrics(m, step=start_step + step)
                if self.cfg.verbose:
                    print(f"step {start_step + step} tokens {n_tokens} "
                          f"loss {vals['loss']:.4f} L0 {vals['l0']:.1f} "
                          f"ev {vals['explained_variance']:.3f} "
                          f"({n_tokens / (time.time() - t0):.0f} tok/s)")
                if self.check_run_tolerance(m):
                    raise RuntimeError(
                        "SAE training below quality tolerance "
                        f"(metrics={vals}); aborting run")
            while val_thresholds and n_tokens >= val_thresholds[0]:
                val_thresholds.pop(0)
                vvals = self.validate()
                if vvals is not None and self.check_validation_tolerance(vvals):
                    raise RuntimeError(
                        "SAE validation CE-recovered below tolerance "
                        f"({vvals['validation_metrics/substitution_score']:.3f}"
                        f" < {self.cfg.min_ce_recovered}); aborting run")
            while thresholds and n_tokens >= thresholds[0]:
                thresholds.pop(0)
                self.save_checkpoint()
        if self.cfg.n_validation_runs:
            self.validate()
        if self.cfg.n_checkpoints:
            self.save_checkpoint(tag="final")
        return self.sae


class SAESweepTrainer:
    """All-layer SAE sweep: one shared cached forward feeds L SAEs trained
    simultaneously (the TPU-native form of the reference's per-layer sweep
    scripts; BASELINE config 5).  ``run()`` has the same observability as
    the single-SAE trainer (train_sae.py:610-673 semantics applied
    per-layer): metric logging at ``wandb_log_frequency``, token-threshold
    checkpoints, and a bad-run abort on the per-layer tolerances."""

    def __init__(self, cfg: SAERunnerConfig, model=None, store=None,
                 key: Optional[jax.Array] = None, mesh=None,
                 eval_dataset=None, class_embeddings=None):
        assert cfg.sweep_layers, "cfg.sweep_layers must list the layers"
        self.cfg = cfg
        self.layers = list(cfg.sweep_layers)
        self.model = model
        self.store = store
        self.mesh = mesh if mesh is not None else getattr(store, "mesh", None)
        key = key if key is not None else jax.random.PRNGKey(cfg.seed)
        self.state = init_sweep_state(cfg, len(self.layers), key)
        if store is not None and cfg.b_dec_init_method != "zeros":
            n = min(4096 * 8, cfg.tokens_per_buffer)
            b_decs = []
            for slot in range(len(self.layers)):
                sample = store.peek_tokens(n, layer_slot=slot)
                b_decs.append(initialize_b_dec(cfg, {"b_dec": None},
                                               sample)["b_dec"])
            params = dict(self.state.params)
            params["b_dec"] = jnp.stack(b_decs)
            self.state = self.state._replace(params=params)
        self._host_step = int(self.state.step[0])
        self._sharded_step = None
        self._sharded_multistep = None
        if self.mesh is not None:
            # layer-parallel over 'model' x dp over 'data' (SURVEY §2.11):
            # the L independent SAEs shard over the model axis, so the
            # sweep step runs collective-free.
            from vit_prisma_tpu.parallel.mesh import shard_sae_sweep_step
            place, step = shard_sae_sweep_step(cfg, self.mesh, self.state)
            self.state = place(self.state)
            self._sharded_step = step
        self.checkpoint_thresholds = _token_thresholds(cfg, cfg.n_checkpoints)
        self.validation_thresholds = _token_thresholds(cfg,
                                                       cfg.n_validation_runs)
        # in-training validation inputs, as in the single-SAE trainer
        self.eval_dataset = eval_dataset if eval_dataset is not None else \
            getattr(store, "eval_dataset", None)
        self.class_embeddings = class_embeddings
        self._val_step = None
        self._val_batch = None
        self._wandb = None
        if cfg.log_to_wandb:
            try:
                import wandb
                self._wandb = wandb
                wandb.init(project=cfg.wandb_project, entity=cfg.wandb_entity,
                           config=cfg.to_dict())
            except Exception:
                self._wandb = None

    def train_step(self, batch):
        """batch: [B, L, d_in] from a sweep-configured store."""
        if self._sharded_step is not None:
            self.state, metrics = self._sharded_step(self.state, batch)
        else:
            self.state, metrics = sae_sweep_train_step(self.state, batch,
                                                       self.cfg)
        self._host_step += 1
        w = self.cfg.feature_sampling_window
        if w and (self._host_step % w) == 0:
            self.state = reset_sparsity_counters(self.state)
        return metrics

    def train_steps(self, batches) -> StepMetrics:
        """K fused sweep steps (``sae_sweep_train_multistep``);
        ``batches``: [K, B, L, d_in].  Metrics stack to [K, L, ...]."""
        if self.mesh is not None:
            if self._sharded_multistep is None:
                from vit_prisma_tpu.parallel.mesh import \
                    shard_sae_sweep_multistep
                self._sharded_multistep = shard_sae_sweep_multistep(
                    self.cfg, self.mesh, self.state)
            self.state, metrics = self._sharded_multistep(self.state, batches)
        else:
            self.state, metrics = sae_sweep_train_multistep(
                self.state, batches, self.cfg)
        self._host_step += batches.shape[0]
        return metrics

    def train_cycles(self, n_cycles: int) -> StepMetrics:
        """``n_cycles`` fused steady-state cycles — refill (gather +
        harvest + mix) AND the half-buffer's train steps in ONE dispatch
        per cycle (:func:`make_fused_cycle`).  Needs
        ``store.fused_cycle_available``; serves the same rows as
        ``train_steps(store.next_batches(K))`` with K spanning the half.
        Returns the LAST cycle's stacked per-step metrics."""
        store = self.store
        if n_cycles < 1:
            raise ValueError(f"train_cycles requires n_cycles >= 1 "
                             f"(got {n_cycles})")
        if getattr(self, "_cycle", None) is None:
            self._cycle = make_fused_cycle(self.cfg, store)
        half = store.buffer.shape[0] // 2
        _warn_unserved_half(store.ptr, half)
        K = half // self.cfg.train_batch_size
        metrics = None
        for _ in range(n_cycles):
            idx = jnp.asarray(store.next_cycle_indices(), jnp.int32)
            self.state, store.buffer, metrics = self._cycle(
                self.state, store.buffer, store.advance_key(), idx)
            self._host_step += K
        store.ptr = half  # the cycle served exactly the refilled half
        return metrics

    def sae_for_layer(self, i: int) -> SparseAutoencoder:
        params = jax.tree.map(lambda a: a[i], self.state.params)
        layer_cfg = self.cfg.replace(sweep_layers=None,
                                     hook_point_layer=self.layers[i])
        return SparseAutoencoder(layer_cfg, params=params)

    def save_checkpoints(self, out_dir: str):
        paths = []
        for i in range(len(self.layers)):
            sae = self.sae_for_layer(i)
            path = os.path.join(out_dir, f"{sae.get_name()}")
            sae.save_model(path)
            paths.append(path)
        return paths

    def log_metrics(self, metrics: StepMetrics,
                    step: Optional[int] = None) -> Dict[str, Any]:
        """Per-layer + mean metrics (train_sae.py:610-673 applied to the
        stacked sweep state).  ``step``: explicit wandb step for the
        intra-chunk per-step metrics of the fused-dispatch loop (without
        it, every step in a chunk would log under the same
        already-advanced host counter)."""
        vals: Dict[str, Any] = {}
        host = jax.device_get(metrics)  # one transfer for all fields
        for k in metrics._fields:
            arr = np.asarray(getattr(host, k), np.float32)
            vals[k] = float(arr.mean())
            for i, layer in enumerate(self.layers):
                vals[f"layer_{layer}/{k}"] = float(arr[i])
        if self._wandb is not None:
            self._wandb.log(vals, step=self._host_step if step is None
                            else step)
        return vals

    def check_run_tolerance(self, metrics: StepMetrics) -> Optional[int]:
        """Index of the first layer violating the bad-run tolerances
        (train_sae.py:637-644), or None."""
        l0 = np.asarray(metrics.l0)
        ev = np.asarray(metrics.explained_variance)
        for i in range(len(self.layers)):
            if self.cfg.min_l0 is not None and l0[i] < self.cfg.min_l0:
                return i
            if (self.cfg.min_explained_variance is not None and
                    ev[i] < self.cfg.min_explained_variance):
                return i
        return None

    def _get_val_inputs(self):
        """One fixed labelled eval batch, lazily built (shared with the
        single-SAE trainer's `_get_val_inputs`)."""
        if self._val_batch is None and self.eval_dataset is not None:
            self._val_batch = _build_val_batch(
                self.eval_dataset, min(self.cfg.store_batch_size,
                                       len(self.eval_dataset)))
        return self._val_batch

    def validate(self) -> Optional[Dict[str, float]]:
        """One in-training validation pass over ALL sweep layers in a
        single XLA program (`make_sweep_eval_step`: one clean forward +
        vmapped SAE forwards + prefix-shared substituted/zero suffixes),
        giving the sweep the single-SAE trainer's quality story
        (reference: `evaluate()` re-run per trained layer,
        train_sae.py:414-535 × evals.py:920-1008).  Returns per-layer +
        mean metrics (wandb-logged under ``validation_metrics/``), or
        None when no eval data / model is attached."""
        batch = self._get_val_inputs()
        if batch is None or self.model is None:
            return None
        images, labels = batch
        class_emb = _class_emb_or_identity(self.model, images,
                                           self.class_embeddings)
        if self._val_step is None:
            from vit_prisma_tpu.sae.evals import make_sweep_eval_step
            self._val_step = make_sweep_eval_step(self.model, self.cfg,
                                                  self.layers)
        s = self._val_step(self.model.params, self.state.params,
                           images, labels, class_emb)
        s = jax.device_get(s)  # one transfer for every layer's stats
        vals: Dict[str, float] = {}
        scores = []
        for i, layer in enumerate(self.layers):
            clean = float(s.loss[i])
            recons = float(s.recons_loss[i])
            zero = float(s.zero_abl_loss[i])
            denom = zero - clean
            score = (zero - recons) / denom if abs(denom) > 1e-9 \
                else float("nan")
            scores.append(score)
            p = f"layer_{layer}/validation_metrics/"
            vals[p + "substitution_loss"] = recons
            vals[p + "zero_ablation_loss"] = zero
            vals[p + "model_loss"] = clean
            vals[p + "substitution_score"] = score
            vals[p + "L0"] = float(np.mean(np.asarray(s.l0_image[i])))
            vals[p + "cos_sim"] = float(s.cos_sim[i])
        vals["validation_metrics/substitution_score"] = \
            float(np.nanmean(scores)) if scores else float("nan")
        if self._wandb is not None:
            self._wandb.log(vals, step=self._host_step)
        if self.cfg.verbose:
            print(f"sweep val @ step {self._host_step}: CE-recovered "
                  + " ".join(f"L{l}={sc:.3f}"
                             for l, sc in zip(self.layers, scores)))
        return vals

    def check_validation_tolerance(self, vals: Dict[str, float]
                                   ) -> Optional[int]:
        """Index of the first layer whose CE-recovered score violates
        ``cfg.min_ce_recovered`` (the sweep form of the single trainer's
        abort), or None."""
        if self.cfg.min_ce_recovered is None:
            return None
        for i, layer in enumerate(self.layers):
            score = vals.get(
                f"layer_{layer}/validation_metrics/substitution_score")
            if score is not None and score == score and \
                    score < self.cfg.min_ce_recovered:
                return i
        return None

    def evaluate(self, data_iter, class_embeddings=None,
                 eval_cfg=None) -> List[Dict[str, Any]]:
        """Final all-layer eval over a labelled dataset — one fused
        program per batch covering every sweep layer
        (:func:`vit_prisma_tpu.sae.evals.sweep_process_dataset`).
        Returns one metric dict per layer."""
        assert self.model is not None, "evaluate() requires a model"
        from vit_prisma_tpu.sae.evals import (EvalConfig,
                                              sweep_process_dataset)
        if class_embeddings is None:
            batch = self._get_val_inputs()
            assert batch is not None, \
                "evaluate() needs class_embeddings or an eval_dataset"
            class_embeddings = _class_emb_or_identity(
                self.model, batch[0], self.class_embeddings)
        if eval_cfg is None:
            eval_cfg = EvalConfig()
        return sweep_process_dataset(
            self.model, self.cfg, self.layers, self.state.params,
            data_iter, class_embeddings, eval_cfg)

    def run(self, max_steps: Optional[int] = None):
        assert self.store is not None
        total = self.cfg.total_training_tokens
        thresholds = list(self.checkpoint_thresholds)
        val_thresholds = list(self.validation_thresholds)
        k = max(1, int(self.cfg.steps_per_dispatch))
        bs = self.cfg.train_batch_size
        freq = self.cfg.wandb_log_frequency
        step = 0
        self._host_step = int(self.state.step[0])
        start_step = self._host_step
        n_tokens = int(self.state.n_training_tokens[0])
        t0 = time.time()
        while n_tokens < total:
            if max_steps is not None and step >= max_steps:
                break
            chunk = k if max_steps is None else min(k, max_steps - step)
            if chunk == 1:
                metrics = self.train_step(self.store.next_batch())
            else:
                metrics = self.train_steps(self.store.next_batches(chunk))
            for j in range(chunk):
                step += 1
                n_tokens += bs
                if step % freq:
                    continue
                m = metrics if chunk == 1 else \
                    jax.tree.map(lambda a, j=j: a[j], metrics)
                vals = self.log_metrics(m, step=start_step + step)
                if self.cfg.verbose:
                    print(f"sweep step {start_step + step} "
                          f"tokens/layer {n_tokens} "
                          f"mean loss {vals['loss']:.4f} "
                          f"mean L0 {vals['l0']:.1f} "
                          f"mean ev {vals['explained_variance']:.3f} "
                          f"({n_tokens * len(self.layers) / (time.time() - t0):.0f}"
                          " SAE-tok/s)")
                bad = self.check_run_tolerance(m)
                if bad is not None:
                    raise RuntimeError(
                        f"SAE sweep layer {self.layers[bad]} below quality "
                        f"tolerance (metrics={vals}); aborting run")
            while thresholds and n_tokens >= thresholds[0]:
                thresholds.pop(0)
                self.save_checkpoints(os.path.join(
                    self.cfg.checkpoint_path,
                    f"sweep_n_tokens_{n_tokens}"))
            while val_thresholds and n_tokens >= val_thresholds[0]:
                val_thresholds.pop(0)
                vvals = self.validate()
                if vvals is not None:
                    bad = self.check_validation_tolerance(vvals)
                    if bad is not None:
                        layer = self.layers[bad]
                        raise RuntimeError(
                            f"SAE sweep layer {layer} CE-recovered "
                            f"{vvals[f'layer_{layer}/validation_metrics/substitution_score']:.3f}"
                            f" below min_ce_recovered="
                            f"{self.cfg.min_ce_recovered}; aborting run")
        if self.cfg.n_validation_runs:
            self.validate()
        if self.cfg.n_checkpoints:
            self.save_checkpoints(os.path.join(self.cfg.checkpoint_path,
                                               "sweep_final"))
        return [self.sae_for_layer(i) for i in range(len(self.layers))]


# ---------------------------------------------------------------------------
# Full training-state checkpointing (beyond the reference: the reference
# never saves SAE optimizer state, so mid-run resume is impossible there;
# SURVEY.md §5.4)
# ---------------------------------------------------------------------------

def save_train_state(path: str, state: SAETrainState,
                     cfg: SAERunnerConfig) -> str:
    """Save the COMPLETE train state (params + Adam moments + counters) for
    exact mid-run resume."""
    import pickle

    if not path.endswith(".pkl"):
        path = path + ".pkl"
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    host_state = jax.tree.map(np.asarray, state)
    with open(path, "wb") as f:
        pickle.dump({"cfg": cfg.to_dict(), "state": host_state}, f)
    return path


def load_train_state(path: str) -> Tuple[SAETrainState, SAERunnerConfig]:
    import pickle

    if not path.endswith(".pkl") and os.path.exists(path + ".pkl"):
        path = path + ".pkl"
    with open(path, "rb") as f:
        blob = pickle.load(f)
    cfg = SAERunnerConfig.from_dict(blob["cfg"])
    state = jax.tree.map(jnp.asarray, blob["state"])
    return state, cfg


def save_train_state_sharded(path: str, state: SAETrainState,
                             cfg: SAERunnerConfig) -> str:
    """Orbax checkpoint of the COMPLETE train state — each device writes
    its own shards, no host gather (the production multi-chip form of
    :func:`save_train_state`; the pickle path pulls everything to host).
    Layout/sharding metadata is stored with the arrays, so restore
    re-places leaves on the same mesh."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.join(path, "state"), state._asdict(), force=True)
    ckptr.wait_until_finished()
    with open(os.path.join(path, "config.json"), "w") as f:
        import json
        json.dump(cfg.to_dict(), f)
    return path


def load_train_state_sharded(path: str, mesh=None
                             ) -> Tuple[SAETrainState, SAERunnerConfig]:
    """Restore an Orbax train-state checkpoint.  With ``mesh``, leaves are
    restored directly into the feature-parallel shardings
    (parallel/mesh.py) — no single-host materialization."""
    import json

    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    with open(os.path.join(path, "config.json")) as f:
        cfg = SAERunnerConfig.from_dict(json.load(f))
    ckptr = ocp.StandardCheckpointer()
    # restore against an abstract template so the optax NamedTuple
    # structure of opt_state survives (orbax would return plain dicts)
    template = init_train_state(cfg)
    if mesh is not None:
        from vit_prisma_tpu.parallel.mesh import sae_state_shardings
        sh = sae_state_shardings(mesh, template)
        abstract = jax.tree.map(
            lambda a, s: jax.ShapeDtypeStruct(a.shape, a.dtype, sharding=s),
            template._asdict(), sh._asdict())
    else:
        abstract = jax.tree.map(
            lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype),
            template._asdict())
    restored = ckptr.restore(os.path.join(path, "state"), abstract)
    state = SAETrainState(**{k: restored[k] for k in SAETrainState._fields})
    return state, cfg
