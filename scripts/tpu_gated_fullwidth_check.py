"""Full-width gated-SAE training check ON THE REAL TPU (bf16 recipe).

Why this exists (round 5): the full-width quality rehearsal
(tpu_quality_drive_fullwidth.py) could not include a gated row — the
circle-ViT's layer-9 resid_post is ~500:1 DC-dominated (measured:
mean-vector norm 3915 of a 3920 total, per-dim std 7.4), and on such
data the REFERENCE's gated formulation itself mistrains: its aux loss
compares ``via = relu(gate_pre) @ W_dec + b_dec`` against the CENTERED
``sae_in = x - b_dec`` (reference sae.py:787-793 vs :700), so a large
b_dec makes the two sides differ by 2*b_dec and the gate path fights the
reconstruction path for the shared unit-norm decoder.  Every recipe
variant measured fails there (lr 3e-3/1e-3/3e-4, l1 1e-5/1e-6/0,
constant_norm_rescale, layer_norm: held-out EV -3 .. -222) while vanilla
and TopK rows pass at 0.99 — and the same gated code trains to EV ~0.99
on activation distributions without the pathology.  Real CLIP residuals
are NOT DC-dominated like this (reference trains gated SAEs on them).

This script is the well-conditioned full-width check: synthetic low-rank
activations (rank 96, norm ~28 — CLIP-like scale) at the production
shape 768 -> 12288, batch 4096, bf16 + fp32 masters, run through BOTH
the fused Pallas gated kernel and the XLA path.  Gates: held-out-batch
EV > 0.95 on each path and identical-to-3-decimals final EV between
paths (they are exactness-tested elsewhere; this is the at-scale
training-dynamics twin).

Measured on v5e (2026-08-19): fused EV 0.993, XLA EV 0.993, identical
loss trajectories.
"""
import sys; sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp

float(jnp.ones((8, 8)).sum())
from vit_prisma_tpu.sae import SAERunnerConfig, init_train_state  # noqa: E402
from vit_prisma_tpu.sae.train import sae_train_multistep  # noqa: E402

key = jax.random.PRNGKey(0)
U = jax.random.normal(key, (96, 768))


def batches(k, n, bs=4096):
    C = jax.random.normal(jax.random.PRNGKey(k), (n, bs, 96))
    return jnp.einsum("nbc,cd->nbd", C, U) / jnp.sqrt(96.0) * 28.0


base = dict(d_in=768, expansion_factor=16, train_batch_size=4096,
            architecture="gated", activation_fn_str="relu",
            l1_coefficient=1e-5, lr=3e-4,
            lr_scheduler_name="cosineannealingwarmup", lr_warm_up_steps=100,
            b_dec_init_method="zeros", log_to_wandb=False,
            compute_dtype="bfloat16")

evs = {}
for label, kw in [("fused", {}), ("xla", dict(fused_sae_step=False))]:
    cfg = SAERunnerConfig(**{**base, **kw})
    st = init_train_state(cfg, key=jax.random.PRNGKey(1))
    for i in range(15):
        st, m = sae_train_multistep(st, batches(i, 10), cfg)
    ev = float(m.explained_variance[-1])
    evs[label] = ev
    print(f"{label}: final train-stream EV {ev:.3f}", flush=True)
    assert ev > 0.95, (label, ev)

assert abs(evs["fused"] - evs["xla"]) < 1e-3, evs
print("gated full-width check PASS (fused == XLA, EV "
      f"{evs['fused']:.3f})", flush=True)
