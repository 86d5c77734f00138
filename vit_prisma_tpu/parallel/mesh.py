"""Device-mesh sharding for multi-chip training/inference.

The reference's only multi-device facility is contiguous layer->GPU
placement (``/root/reference/src/vit_prisma/utils/devices.py:17-43``); the
TPU-native replacement is GSPMD over a ``jax.sharding.Mesh`` (SURVEY.md
§2.11/§5.8): batch data-parallel over the ``data`` axis, tensor-parallel
sharding of attention heads / d_mlp / d_sae over the ``model`` axis, with
XLA inserting the collectives (psum/all-gather over ICI).

Usage::

    mesh = make_mesh(data=2, model=4)
    p_sh = vit_param_shardings(mesh, params)       # heads/d_mlp sharded
    params = jax.device_put(params, p_sh)
    step = shard_sae_train_step(cfg, mesh)         # dp batch + tp d_sae
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from vit_prisma_tpu.sae.config import SAERunnerConfig


def make_mesh(data: int = 1, model: int = 1, devices=None) -> Mesh:
    """A (data, model) mesh.  With real TPUs the default device order keeps
    the model axis on the fastest ICI ring."""
    if devices is None:
        devices = jax.devices()
    n = data * model
    assert len(devices) >= n, f"need {n} devices, have {len(devices)}"
    dev_array = np.asarray(devices[:n]).reshape(data, model)
    return Mesh(dev_array, axis_names=("data", "model"))


# ---------------------------------------------------------------------------
# Multi-slice (DCN) meshes
# ---------------------------------------------------------------------------

def _slice_id(device) -> int:
    """The ICI-domain id of a device: TPU multi-slice exposes
    ``slice_index``; multi-host single-slice platforms fall back to
    ``process_index`` (a host's local devices always share an ICI
    domain or faster)."""
    sid = getattr(device, "slice_index", None)
    if sid is None:
        sid = getattr(device, "process_index", 0)
    return int(sid or 0)


def multislice_device_array(devices, model: int) -> np.ndarray:
    """Order ``devices`` into a (data, model) array whose ``model`` rows
    never cross a slice boundary.

    Tensor-parallel collectives (psum/all-gather on every layer) then ride
    ICI only, while the ``data`` axis — one all-reduce per step — is the
    only axis whose collectives cross the slow DCN links, and its device
    order keeps same-slice replicas adjacent so XLA's hierarchical
    all-reduce does intra-slice reduction first (the scaling-book recipe:
    dp over DCN, tp over ICI)."""
    groups: Dict[int, list] = {}
    for d in devices:
        groups.setdefault(_slice_id(d), []).append(d)
    slices = [groups[k] for k in sorted(groups)]
    per = len(slices[0])
    if any(len(s) != per for s in slices):
        raise ValueError(
            f"uneven slices: {[len(s) for s in slices]} devices per slice")
    if per % model:
        raise ValueError(
            f"model={model} must divide the {per} devices of one slice "
            "(the model axis may not cross a DCN boundary)")
    # [n_slices, per//model, model] -> data-major with the slice index as
    # the slowest-varying component of the data axis
    arr = np.asarray([s for s in slices], dtype=object)
    return arr.reshape(len(slices) * (per // model), model)


def make_multislice_mesh(model: int = 1, devices=None) -> Mesh:
    """A DCN-aware (data, model) mesh over all slices/hosts.

    ``model`` is the tensor-parallel width (must fit inside one slice);
    the data axis absorbs everything else, spanning slices.  On a single
    slice this reduces exactly to :func:`make_mesh`.  In a multi-process
    program call :func:`distributed_init` first so ``jax.devices()`` sees
    the global device set."""
    if devices is None:
        devices = jax.devices()
    return Mesh(multislice_device_array(devices, model),
                axis_names=("data", "model"))


def distributed_init(**kwargs) -> bool:
    """Initialize the JAX distributed runtime for multi-host/multi-slice
    runs (no-op when single-process or already initialized).  Returns True
    when a multi-process runtime is active."""
    try:
        if jax.process_count() > 1:
            return True  # already initialized
    except RuntimeError:
        pass
    try:
        jax.distributed.initialize(**kwargs)
    except (ValueError, RuntimeError):
        # single-process (no coordinator/env config) — local run
        return False
    return jax.process_count() > 1


def _ns(mesh: Mesh, *spec) -> NamedSharding:
    return NamedSharding(mesh, P(*spec))


def replicated(mesh: Mesh) -> NamedSharding:
    return _ns(mesh)


# ---------------------------------------------------------------------------
# ViT parameter shardings: attention heads and d_mlp over 'model'
# ---------------------------------------------------------------------------

def vit_param_shardings(mesh: Mesh, params: Dict[str, Any]):
    """Tensor-parallel layout for the stacked ViT tree:

    - ``attn.W_{Q,K,V}`` [L, H, D, Dh] and ``W_O`` [L, H, Dh, D]: heads over
      ``model`` (Megatron-style column/row parallel; attention is
      head-local so no collectives until the output projection psum).
    - ``mlp.W_in`` [L, D, M]: M over ``model``; ``W_out`` [L, M, D]: M over
      ``model`` (row-parallel, psum at the output).
    - everything else replicated.
    """
    def rule(path, leaf):
        keys = [getattr(p, "key", None) for p in path]
        if "attn" in keys:
            name = keys[-1]
            if name in ("W_Q", "W_K", "W_V", "W_O"):
                return _ns(mesh, None, "model")
            if name in ("b_Q", "b_K", "b_V"):
                return _ns(mesh, None, "model")
            return replicated(mesh)
        if "mlp" in keys:
            name = keys[-1]
            if name == "W_in":
                return _ns(mesh, None, None, "model")
            if name == "W_out":
                return _ns(mesh, None, "model", None)
            if name == "b_in":
                return _ns(mesh, None, "model")
            return replicated(mesh)
        return replicated(mesh)

    return jax.tree_util.tree_map_with_path(rule, params)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return _ns(mesh, "data")


def shard_vit_forward(model, mesh: Mesh, names_filter=None,
                      stop_at_layer: Optional[int] = None):
    """Compile the (optionally cached) ViT forward with dp batch + tp
    params.  Returns ``fn(params, images)``.

    The fused attention kernel partitions over batch/head blocks via its
    custom_partitioning (ops/attention.py), so the sharded forward keeps
    the Pallas mix."""
    from vit_prisma_tpu.models.vit import vit_forward
    from vit_prisma_tpu.prisma.hooks import NULL_HOOKS, HookRuntime
    cfg = model.cfg

    def fwd(params, images):
        if names_filter is None:
            return vit_forward(params, cfg, images, NULL_HOOKS, stop_at_layer)
        rt = HookRuntime(names_filter=names_filter)
        out = vit_forward(params, cfg, images, rt, stop_at_layer)
        return out, dict(rt.cache)

    return jax.jit(fwd, in_shardings=(vit_param_shardings(mesh, model.params),
                                      batch_sharding(mesh)))


# ---------------------------------------------------------------------------
# SAE shardings: d_sae over 'model', batch over 'data'
# ---------------------------------------------------------------------------

def sae_param_shardings(mesh: Mesh, params: Dict[str, Any]):
    """Feature-parallel SAE: encoder columns / decoder rows / feature biases
    and counters over ``model``.  Encode is collective-free; decode
    contracts over the sharded d_sae → one psum."""
    spec = {}
    for k, v in params.items():
        if k in ("W_enc",):
            spec[k] = _ns(mesh, None, "model")
        elif k in ("W_dec",):
            spec[k] = _ns(mesh, "model", None)
        elif k in ("b_enc", "b_gate", "r_mag", "b_mag"):
            spec[k] = _ns(mesh, "model")
        else:  # b_dec, b_dec_out, W_skip
            spec[k] = replicated(mesh)
    return spec


def sae_state_shardings(mesh: Mesh, state):
    """Shardings for the full SAETrainState: params and the Adam moments
    (which mirror the param dict structure) follow the feature-parallel
    layout; per-feature counters over 'model'; scalars replicated."""
    from vit_prisma_tpu.sae.train import SAETrainState
    p_sh = sae_param_shardings(mesh, state.params)
    rep = replicated(mesh)
    param_keys = set(state.params.keys())

    def map_opt(node):
        if isinstance(node, dict):
            if set(node.keys()) == param_keys:
                return p_sh  # an Adam moment tree (mu or nu)
            return {k: map_opt(v) for k, v in node.items()}
        if isinstance(node, tuple):
            mapped = tuple(map_opt(v) for v in node)
            return type(node)(*mapped) if hasattr(node, "_fields") else mapped
        if isinstance(node, list):
            return [map_opt(v) for v in node]
        return rep

    feat = _ns(mesh, "model")
    return SAETrainState(
        params=p_sh, opt_state=map_opt(state.opt_state),
        act_freq_scores=feat,
        n_forward_passes_since_fired=feat,
        n_frac_active_tokens=rep, step=rep, n_training_tokens=rep)


def shard_sae_train_step(cfg: SAERunnerConfig, mesh: Mesh, state):
    """Compile the SAE train step with dp(batch) x tp(d_sae) shardings.
    Returns ``(place_state, step_fn)``.

    The Pallas TopK threshold kernel is a custom call GSPMD can't
    partition — the sharded step uses the XLA top_k/approx paths."""
    from vit_prisma_tpu.sae.train import sae_train_step

    cfg = cfg.replace(fused_topk=False, fused_opt_kernel=False)
    st_sh = sae_state_shardings(mesh, state)
    b_sh = batch_sharding(mesh)

    def step(state, batch):
        return sae_train_step(state, batch, cfg)

    fn = jax.jit(step, in_shardings=(st_sh, b_sh), donate_argnums=(0,))

    def place_state(state):
        return jax.device_put(state, st_sh)

    return place_state, fn


def shard_sae_train_multistep(cfg: SAERunnerConfig, mesh: Mesh, state):
    """Fused K-step variant of :func:`shard_sae_train_step`: batches carry a
    leading scan axis [K, B, d_in] (replicated) with rows dp-sharded."""
    from vit_prisma_tpu.sae.train import sae_train_multistep

    cfg = cfg.replace(fused_topk=False, fused_opt_kernel=False)  # no pallas under GSPMD
    st_sh = sae_state_shardings(mesh, state)
    b_sh = _ns(mesh, None, "data")

    def steps(state, batches):
        return sae_train_multistep(state, batches, cfg)

    return jax.jit(steps, in_shardings=(st_sh, b_sh), donate_argnums=(0,))


# ---------------------------------------------------------------------------
# All-layer sweep shardings: layer axis over 'model', batch over 'data'
# ---------------------------------------------------------------------------

def sweep_state_shardings(mesh: Mesh, state):
    """Shardings for a stacked SAESweepTrainer state: every leaf carries a
    leading layer axis, sharded over ``model`` (layers are independent, so
    the sweep step runs collective-free); scalars-per-layer too."""
    from vit_prisma_tpu.sae.train import SAETrainState

    def shard_leaf(leaf):
        return _ns(mesh, "model")

    return jax.tree.map(shard_leaf, state)


def sweep_batch_sharding(mesh: Mesh) -> NamedSharding:
    """[B, L, d_in]: batch over data, layers over model."""
    return _ns(mesh, "data", "model")


def _sweep_fused_shard_map(cfg: SAERunnerConfig, mesh: Mesh, state):
    """If the fused Pallas step applies per-shard, return a shard_map'd
    local-step builder, else None.

    A pallas_call is a custom call GSPMD can't partition, so the kernel
    path runs under ``shard_map``: each device holds L/model layers x
    B/data rows and the step inserts the explicit collectives itself
    (grad/batch-stat pmean, counter psum — see
    ``_sae_train_step_fused(data_axis=)``).  The layer axis needs no
    collectives at all (SAEs are independent)."""
    from vit_prisma_tpu.sae.train import _fused_step_ok

    dp = mesh.shape["data"]
    mp = mesh.shape["model"]
    L = int(state.step.shape[0])
    B = cfg.train_batch_size
    if L % mp or B % dp:
        return None
    if not _fused_step_ok(cfg, B // dp, L // mp, allow_single_layer=True):
        return None

    from vit_prisma_tpu.sae.train import StepMetrics, _sae_train_step_fused

    st_spec = jax.tree.map(lambda _: P("model"), state)

    def wrap(local_fn, batch_spec, metric_spec):
        m_spec = StepMetrics(*([metric_spec] * len(StepMetrics._fields)))
        return jax.shard_map(local_fn, mesh=mesh,
                             in_specs=(st_spec, batch_spec),
                             out_specs=(st_spec, m_spec), check_vma=False)

    return wrap


def shard_sae_sweep_step(cfg: SAERunnerConfig, mesh: Mesh, state):
    """Compile the all-layer sweep step with dp(batch) x layer-parallel
    sharding.  Returns (place_state, step_fn).

    Uses the shard_map'd fused Pallas kernel when the per-shard config/
    shapes allow it (see :func:`_sweep_fused_shard_map`); otherwise the
    pure-XLA vmapped step under GSPMD."""
    from vit_prisma_tpu.sae.train import (_sae_train_step_fused,
                                          sae_sweep_train_step)

    st_sh = sweep_state_shardings(mesh, state)
    b_sh = sweep_batch_sharding(mesh)
    wrap = _sweep_fused_shard_map(cfg, mesh, state)

    if wrap is not None:
        def local_step(s, b):
            return _sae_train_step_fused(s, b, cfg, data_axis="data")
        fn = jax.jit(wrap(local_step, P("data", "model"), P("model")),
                     donate_argnums=(0,))
    else:
        xcfg = cfg.replace(fused_sae_step=False, fused_topk=False,
                           fused_opt_kernel=False)

        def step(state, batch):
            return sae_sweep_train_step(state, batch, xcfg)

        fn = jax.jit(step, in_shardings=(st_sh, b_sh), donate_argnums=(0,))

    def place_state(s):
        return jax.device_put(s, st_sh)

    return place_state, fn


def shard_sae_sweep_multistep(cfg: SAERunnerConfig, mesh: Mesh, state):
    """Fused K-step variant of :func:`shard_sae_sweep_step`: batches
    [K, B, L, d_in] with rows over 'data' and layers over 'model'.  The
    lax.scan lives INSIDE the shard_map when the Pallas kernel applies,
    so the whole K-step program is one collective region."""
    from vit_prisma_tpu.sae.train import (_apply_window_reset,
                                          _sae_train_step_fused,
                                          sae_sweep_train_multistep)

    st_sh = sweep_state_shardings(mesh, state)
    b_sh = _ns(mesh, None, "data", "model")
    wrap = _sweep_fused_shard_map(cfg, mesh, state)

    if wrap is not None:
        def local_steps(s, batches):
            def body(ss, b):
                ss, m = _sae_train_step_fused(ss, b, cfg, data_axis="data")
                return _apply_window_reset(ss, cfg), m
            return jax.lax.scan(body, s, batches)
        return jax.jit(wrap(local_steps, P(None, "data", "model"),
                            P(None, "model")), donate_argnums=(0,))

    xcfg = cfg.replace(fused_sae_step=False, fused_topk=False,
                       fused_opt_kernel=False)

    def steps(state, batches):
        return sae_sweep_train_multistep(state, batches, xcfg)

    return jax.jit(steps, in_shardings=(st_sh, b_sh), donate_argnums=(0,))
