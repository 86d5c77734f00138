"""A/B the fused optimizer on the single-SAE (L=1) train step, real chip.

Round-3 turned `cfg.fused_optimizer` on by default; this measures whether
the fused pass (Pallas kernel and XLA twin) actually beats letting optax's
XLA fusion handle the L=1 optimizer side, the way `ops/sae_step.py` was
gated to n_layers >= 2 after the same comparison.
"""
import sys
import pathlib
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp

from vit_prisma_tpu.sae import SAERunnerConfig, init_train_state
from vit_prisma_tpu.sae.train import sae_train_multistep

float(jnp.ones((8, 8)).sum())  # warm the tunnel

base = dict(d_in=768, expansion_factor=16, train_batch_size=4096,
            lr=1e-3, lr_scheduler_name="cosineannealingwarmup",
            b_dec_init_method="zeros", log_to_wandb=False)
K = 10


def bench(tag, **kw):
    cfg = SAERunnerConfig(**base, **kw)
    state = init_train_state(cfg, key=jax.random.PRNGKey(0))
    batches = jax.random.normal(jax.random.PRNGKey(1), (K, 4096, 768))
    state, m = sae_train_multistep(state, batches, cfg)
    float(m.loss[-1])
    n = 8
    t0 = time.time()
    for _ in range(n):
        state, m = sae_train_multistep(state, batches, cfg)
    float(m.loss[-1])
    dt = time.time() - t0
    print(f"{tag:44s} {4096 * n * K / dt / 1e3:8.1f}k tok/s  "
          f"({dt / (n * K) * 1e3:.2f} ms/step)")


for dtype in (None, "bfloat16"):
    ck = {} if dtype is None else dict(compute_dtype=dtype)
    lbl = dtype or "f32"
    bench(f"{lbl} fused_optimizer=True kernel=True", **ck)
    bench(f"{lbl} fused_optimizer=True kernel=False",
          fused_opt_kernel=False, **ck)
    bench(f"{lbl} fused_optimizer=False", fused_optimizer=False, **ck)
