"""Quantify the fp32 -> bf16 opportunity in the SAE train step.

The sweep step runs ~24 TFLOP/s effective (docs/PERFORMANCE.md) with fp32
GEMMs; v5e's MXU is bf16-native.  Measures (AOT-compiled, real chip):
  1. pure GEMM chains at SAE shapes in fp32 vs bf16
  2. the current fp32 train step vs a bf16-compute prototype
     (params cast inside the loss; masters/Adam stay fp32)
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

float(jnp.ones((8, 8)).sum())  # tunnel warmup

B, D_IN, D_SAE, L = 2048, 1024, 8192, 24


def time_aot(fn, *args, iters=20):
    c = jax.jit(fn).lower(*args).compile()
    out = c(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(iters):
        out = c(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / iters


# -- 1. pure GEMM chain (enc + dec per layer, vmapped over L) -----------
def gemm_chain(x, We, Wd):
    def one(x, We, Wd):
        h = jax.nn.relu(x @ We)
        return h @ Wd
    return jax.vmap(one)(x, We, Wd)


flops = 2 * B * D_IN * D_SAE * 2 * L
for dt in (jnp.float32, jnp.bfloat16):
    x = jnp.ones((L, B, D_IN), dt)
    We = jnp.ones((L, D_IN, D_SAE), dt)
    Wd = jnp.ones((L, D_SAE, D_IN), dt)
    s = time_aot(gemm_chain, x, We, Wd)
    print(f"gemm chain {dt.__name__}: {s * 1e3:.1f} ms = "
          f"{flops / s / 1e12:.1f} TFLOP/s")

# -- 2. the real sweep step, fp32 vs bf16-compute prototype -------------
from vit_prisma_tpu.sae import SAERunnerConfig, init_sweep_state
from vit_prisma_tpu.sae.train import _sae_train_step_impl

cfg = SAERunnerConfig(d_in=D_IN, expansion_factor=D_SAE // D_IN,
                      train_batch_size=B, lr=1e-3,
                      lr_scheduler_name="constant",
                      b_dec_init_method="zeros", log_to_wandb=False,
                      sweep_layers=tuple(range(L)), context_size=1)
state = init_sweep_state(cfg, L, key=jax.random.PRNGKey(0))
batch = jax.random.normal(jax.random.PRNGKey(1), (B, L, D_IN))

def sweep_step(state, batch):
    step = lambda s, b: _sae_train_step_impl(s, b, cfg)
    return jax.vmap(step)(state, jnp.swapaxes(batch, 0, 1))

s = time_aot(sweep_step, state, batch, iters=10)
step_flops = 3 * flops  # fwd + ~2x bwd
print(f"sweep step fp32: {s * 1e3:.1f} ms = {B * L / s / 1e3:,.0f} "
      f"SAE-tok/s ({step_flops / s / 1e12:.1f} TFLOP/s effective)")
