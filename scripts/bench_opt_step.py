"""Set the fused-optimizer defaults from measurement (real chip).

Compares the three optimizer paths inside the production bf16 train step —
optax (pre-round-3), the fused XLA twin, and the fused Pallas kernel — on
both headline workloads:
  * the single-SAE step (d_in 1024, x8, B 4096)
  * the 24-layer ViT-L/14 sweep step (d_in 1024, x8, B 2048)
and the bf16-Adam-moment variant of whichever fused path wins.
"""
import time

import jax
import jax.numpy as jnp

float(jnp.ones((8, 8)).sum())  # tunnel warmup

from vit_prisma_tpu.sae import SAERunnerConfig
from vit_prisma_tpu.sae.train import (init_sweep_state, init_train_state,
                                      sae_sweep_train_step, sae_train_step)

D_IN, EXP, L = 1024, 8, 24


def time_step(step_fn, state, batch, iters=30):
    c = jax.jit(step_fn, donate_argnums=(0,)).lower(state, batch).compile()
    state, m = c(state, batch)
    jax.block_until_ready(m)
    # steady state: run pairs so the donated buffer ping-pongs
    t0 = time.time()
    for _ in range(iters):
        state, m = c(state, batch)
    jax.block_until_ready(m)
    return (time.time() - t0) / iters


def cfg_with(B, **kw):
    base = dict(d_in=D_IN, expansion_factor=EXP, train_batch_size=B,
                lr=1e-3, lr_scheduler_name="constant",
                b_dec_init_method="zeros", log_to_wandb=False,
                compute_dtype="bfloat16", context_size=1)
    base.update(kw)
    return SAERunnerConfig(**base)


VARIANTS = [
    ("optax", dict(fused_optimizer=False)),
    ("fused-xla", dict(fused_optimizer=True, fused_opt_kernel=False)),
    ("fused-kernel", dict(fused_optimizer=True, fused_opt_kernel=True)),
    ("fused-xla bf16-adam", dict(fused_optimizer=True,
                                 fused_opt_kernel=False,
                                 adam_dtype="bfloat16")),
    ("fused-kernel bf16-adam", dict(fused_optimizer=True,
                                    fused_opt_kernel=True,
                                    adam_dtype="bfloat16")),
]

# -- single-SAE step ------------------------------------------------------
B = 4096
batch = jax.random.normal(jax.random.PRNGKey(1), (B, D_IN))
print(f"single-SAE step (B={B}, d_in={D_IN}, x{EXP}, bf16 compute):")
for name, kw in VARIANTS:
    cfg = cfg_with(B, **kw)
    state = init_train_state(cfg, key=jax.random.PRNGKey(0))
    s = time_step(lambda st, b: sae_train_step(st, b, cfg), state, batch)
    print(f"  {name:24s} {s*1e3:7.2f} ms  {B/s/1e6:6.3f}M tok/s")

# -- 24-SAE sweep step ----------------------------------------------------
B = 2048
batch = jax.random.normal(jax.random.PRNGKey(2), (B, L, D_IN))
print(f"sweep step (L={L}, B={B}, d_in={D_IN}, x{EXP}, bf16 compute):")
for name, kw in VARIANTS:
    cfg = cfg_with(B, sweep_layers=tuple(range(L)), **kw)
    state = init_sweep_state(cfg, L, key=jax.random.PRNGKey(0))
    s = time_step(lambda st, b: sae_sweep_train_step(st, b, cfg),
                  state, batch, iters=20)
    print(f"  {name:24s} {s*1e3:7.2f} ms  {B*L/s/1e6:6.3f}M tok/s")
