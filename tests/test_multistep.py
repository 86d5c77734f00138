"""Fused multi-step training == K single steps, exactly.

The multi-step programs (``sae_train_multistep`` / ``sae_sweep_train_multistep``
+ ``store.next_batches`` + ``cfg.steps_per_dispatch``) exist to amortize host
dispatch; they must be numerically identical to the single-step path the
reference semantics are verified against (train_sae.py:278-411, :792),
including the feature-sparsity window resets (:309-327) firing mid-chunk.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vit_prisma_tpu.sae import (
    SAERunnerConfig,
    init_sweep_state,
    init_train_state,
    sae_sweep_train_multistep,
    sae_sweep_train_step,
    sae_train_multistep,
    sae_train_step,
)
from vit_prisma_tpu.sae.train import (
    SAESweepTrainer,
    VisionSAETrainer,
    reset_sparsity_counters,
)

D_IN, EXPANSION, BS = 16, 4, 32


def _cfg(**kw):
    base = dict(d_in=D_IN, expansion_factor=EXPANSION, train_batch_size=BS,
                lr=1e-3, lr_scheduler_name="constant",
                b_dec_init_method="zeros", log_to_wandb=False,
                feature_sampling_window=2, context_size=1)
    base.update(kw)
    return SAERunnerConfig(**base)


def _tree_allclose(a, b):
    # scan vs straight-line compilation reorders fusions; equality holds to
    # float32 rounding, not bit-exactly
    flat_a, _ = jax.tree.flatten(a)
    flat_b, _ = jax.tree.flatten(b)
    for x, y in zip(flat_a, flat_b):
        np.testing.assert_allclose(np.asarray(x, np.float64),
                                   np.asarray(y, np.float64),
                                   rtol=5e-6, atol=1e-6)


K = 5  # odd vs window=2: resets fire mid-chunk at steps 2 and 4


def test_multistep_equals_singles():
    cfg = _cfg()
    batches = jax.random.normal(jax.random.PRNGKey(1), (K, BS, D_IN))

    ref = init_train_state(cfg, key=jax.random.PRNGKey(0))
    singles = []
    for j in range(K):
        ref, m = sae_train_step(ref, batches[j], cfg)
        singles.append(m)
        if int(ref.step) % cfg.feature_sampling_window == 0:
            ref = reset_sparsity_counters(ref)

    fused_state, fused_m = sae_train_multistep(
        init_train_state(cfg, key=jax.random.PRNGKey(0)), batches, cfg)

    _tree_allclose(ref, fused_state)
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *singles)
    _tree_allclose(stacked, fused_m)


def test_multistep_transcoder_targets():
    cfg = _cfg(architecture="transcoder", is_transcoder=True, d_out=D_IN)
    key = jax.random.PRNGKey(2)
    batches = jax.random.normal(key, (K, BS, D_IN))
    targets = jax.random.normal(jax.random.PRNGKey(3), (K, BS, D_IN))

    ref = init_train_state(cfg, key=jax.random.PRNGKey(0))
    for j in range(K):
        ref, _ = sae_train_step(ref, batches[j], cfg, targets[j])
        if int(ref.step) % cfg.feature_sampling_window == 0:
            ref = reset_sparsity_counters(ref)

    fused, _ = sae_train_multistep(
        init_train_state(cfg, key=jax.random.PRNGKey(0)), batches, cfg,
        targets)
    _tree_allclose(ref, fused)


def test_sweep_multistep_equals_singles():
    L = 3
    cfg = _cfg(sweep_layers=tuple(range(L)))
    batches = jax.random.normal(jax.random.PRNGKey(4), (K, BS, L, D_IN))

    ref = init_sweep_state(cfg, L, key=jax.random.PRNGKey(0))
    for j in range(K):
        ref, _ = sae_sweep_train_step(ref, batches[j], cfg)
        if int(ref.step[0]) % cfg.feature_sampling_window == 0:
            ref = reset_sparsity_counters(ref)

    fused, fused_m = sae_sweep_train_multistep(
        init_sweep_state(cfg, L, key=jax.random.PRNGKey(0)), batches, cfg)
    _tree_allclose(ref, fused)
    assert np.asarray(fused_m.loss).shape == (K, L)


class _RowStore:
    """Deterministic store stub: an endless stream of fixed token rows."""

    def __init__(self, cfg, n_layers=None):
        self.cfg = cfg
        shape = (4 * BS, D_IN) if n_layers is None \
            else (4 * BS, n_layers, D_IN)
        self.rows = np.asarray(
            jax.random.normal(jax.random.PRNGKey(9), shape))
        self.ptr = 0

    def _take(self, n):
        idx = (self.ptr + np.arange(n)) % self.rows.shape[0]
        self.ptr += n
        return jnp.asarray(self.rows[idx])

    def next_batch(self):
        return self._take(self.cfg.train_batch_size)

    def next_batches(self, k):
        out = self._take(k * self.cfg.train_batch_size)
        return out.reshape((k, self.cfg.train_batch_size) + out.shape[1:])


@pytest.mark.parametrize("sweep", [False, True])
def test_trainer_run_steps_per_dispatch(sweep):
    """run() with steps_per_dispatch=3 lands on the same final state as the
    single-dispatch loop over the same token stream."""
    kw = dict(total_training_images=100_000,  # max_steps drives the loop
              wandb_log_frequency=2, n_checkpoints=0)
    L = 2
    if sweep:
        kw["sweep_layers"] = tuple(range(L))

    def final_state(steps_per_dispatch):
        cfg = _cfg(steps_per_dispatch=steps_per_dispatch, **kw)
        if sweep:
            tr = SAESweepTrainer(cfg, store=_RowStore(cfg, L),
                                 key=jax.random.PRNGKey(0))
        else:
            tr = VisionSAETrainer(cfg, store=_RowStore(cfg),
                                  key=jax.random.PRNGKey(0))
        tr.run(max_steps=6)
        return tr.state

    _tree_allclose(final_state(1), final_state(3))


def test_next_batches_matches_next_batch():
    """VisionActivationsStore.next_batches == k stacked next_batch calls
    (same rows, same refill cadence) when k divides the half-buffer."""
    from vit_prisma_tpu.configs.vit_config import ViTConfig
    from vit_prisma_tpu.models.vit import HookedViT
    from vit_prisma_tpu.sae.store import VisionActivationsStore

    vcfg = ViTConfig(n_layers=2, d_model=D_IN, d_head=4, n_heads=4,
                     d_mlp=32, patch_size=8, image_size=16, n_classes=8,
                     return_type="class_logits")
    model = HookedViT(vcfg, key=jax.random.PRNGKey(0))
    cfg = _cfg(hook_point_layer=1, context_size=vcfg.n_tokens,
               store_batch_size=8, n_batches_in_buffer=2,
               buffer_tokens_override=4 * BS, train_batch_size=BS)
    imgs = np.asarray(jax.random.normal(jax.random.PRNGKey(7),
                                        (16, 3, 16, 16)), np.float32)

    a = VisionActivationsStore(cfg, model, imgs)
    b = VisionActivationsStore(cfg, model, imgs)
    for _ in range(3):  # crosses a refill (half-buffer = 2 batches)
        fused = a.next_batches(2)
        ref = jnp.stack([b.next_batch(), b.next_batch()])
        np.testing.assert_allclose(np.asarray(fused), np.asarray(ref))


def test_load_state_resyncs_host_cadence():
    """Resuming through load_state keeps the sparsity-window reset at the
    state's own step count, not a fresh-zero counter."""
    cfg = _cfg(feature_sampling_window=4, total_training_images=100_000)
    tr = VisionSAETrainer(cfg, store=_RowStore(cfg),
                          key=jax.random.PRNGKey(0))
    tr.run(max_steps=3)
    resumed = VisionSAETrainer(cfg, store=_RowStore(cfg),
                               key=jax.random.PRNGKey(0))
    resumed.load_state(tr.state)
    assert resumed._host_step == 3
    # one more step -> step 4 -> window fires exactly now
    resumed.train_step(resumed.store.next_batch())
    assert float(jnp.sum(resumed.state.act_freq_scores)) == 0.0
