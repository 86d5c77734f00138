"""Per-op device-time breakdown of the bare all-layer sweep train step
(ViT-L/14 geometry: 24 SAEs, 1024->8192, batch 2048)."""
import shutil
import time

import jax
import jax.numpy as jnp
import numpy as np

from scripts.trace_forward import parse_trace
from vit_prisma_tpu.sae import SAERunnerConfig
from vit_prisma_tpu.sae.train import init_sweep_state, sae_sweep_train_step

TRACE_DIR = "/tmp/jax_trace_sweep_step"
B, D_IN, L = 2048, 1024, 24

float(jnp.ones((8, 8)).sum())

cfg = SAERunnerConfig(
    d_in=D_IN, expansion_factor=8, context_size=257,
    sweep_layers=tuple(range(L)), train_batch_size=B, lr=1e-3,
    lr_scheduler_name="constant", b_dec_init_method="zeros",
    log_to_wandb=False, buffer_tokens_override=24_576)

state = init_sweep_state(cfg, L, key=jax.random.PRNGKey(1))
batch = jax.random.normal(jax.random.PRNGKey(2), (B, L, D_IN))
state, m = sae_sweep_train_step(state, batch, cfg)
float(np.asarray(m.loss).sum())

t0 = time.time()
for _ in range(10):
    state, m = sae_sweep_train_step(state, batch, cfg)
float(np.asarray(m.loss).sum())
dt = (time.time() - t0) / 10
print(f"bare sweep step: {dt * 1e3:.1f} ms ({B * L / dt:,.0f} SAE-tok/s)")

shutil.rmtree(TRACE_DIR, ignore_errors=True)
jax.profiler.start_trace(TRACE_DIR)
for _ in range(3):
    state, m = sae_sweep_train_step(state, batch, cfg)
float(np.asarray(m.loss).sum())
jax.profiler.stop_trace()

agg, cnt = parse_trace(TRACE_DIR)
total = sum(agg.values())
print(f"device total/step: {total * 1e3:.1f} ms")
for name, t in agg.most_common(25):
    print(f"  {t * 1e3:7.2f} ms  x{cnt[name] // 3:<4} {name}")
