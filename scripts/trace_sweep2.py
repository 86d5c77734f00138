"""Decompose today's sweep step cost: bare step vs harvest vs mix vs slice."""
import time

import numpy as np

import jax
import jax.numpy as jnp

from vit_prisma_tpu import HookedViT, ViTConfig
from vit_prisma_tpu.sae import (SAERunnerConfig, SAESweepTrainer,
                                VisionActivationsStore)
from vit_prisma_tpu.sae.train import init_sweep_state, sae_sweep_train_step

float(jnp.ones((8, 8)).sum())

lcfg = ViTConfig(n_layers=24, d_model=1024, d_head=64, n_heads=16,
                 d_mlp=4096, patch_size=14, image_size=224,
                 n_classes=768, activation_name="quick_gelu",
                 layer_norm_pre=True, return_type="class_logits",
                 dtype="bfloat16")
model = HookedViT(lcfg, key=jax.random.PRNGKey(0))
model.params = jax.tree.map(lambda a: a.astype(jnp.bfloat16), model.params)
scfg = SAERunnerConfig(
    d_in=1024, expansion_factor=8, context_size=lcfg.n_tokens,
    sweep_layers=tuple(range(24)), layer_subtype="hook_resid_post",
    store_batch_size=32, n_batches_in_buffer=2, train_batch_size=2048,
    lr=1e-3, lr_scheduler_name="constant", b_dec_init_method="zeros",
    log_to_wandb=False, buffer_tokens_override=24_576)

# -- 1. bare sweep step, fixed batch, no store ---------------------------
state = init_sweep_state(scfg, 24, key=jax.random.PRNGKey(1))
batch = jax.random.normal(jax.random.PRNGKey(2), (2048, 24, 1024))
state, m = sae_sweep_train_step(state, batch, scfg)
float(np.asarray(m.loss).sum())
t0 = time.time()
for _ in range(10):
    state, m = sae_sweep_train_step(state, batch, scfg)
float(np.asarray(m.loss).sum())
dt = (time.time() - t0) / 10
print(f"bare sweep step: {dt*1e3:.1f} ms  ({2048*24/dt:,.0f} SAE-tok/s)")
del state, m, batch

# -- 2. store pieces ------------------------------------------------------
store = VisionActivationsStore(scfg, model, np.random.default_rng(0).normal(
    size=(64, 3, 224, 224)).astype(np.float32))

imgs = jax.device_put(next(store.image_iter))
acts = store.get_activations(imgs)  # warm harvest
float(jnp.sum(acts[..., 0].astype(jnp.float32)))
t0 = time.time()
for _ in range(5):
    acts = store.get_activations(imgs)
float(jnp.sum(acts[..., 0].astype(jnp.float32)))
dt = (time.time() - t0) / 5
print(f"harvest 32 imgs: {dt*1e3:.1f} ms  ({32/dt:,.0f} img/s, "
      f"{32*257/dt:,.0f} rows/s/layer)")

key = jax.random.PRNGKey(3)
fresh = store._fill(store.buffer.shape[0] - store.buffer.shape[0] // 2)
t0 = time.time()
buf = store._mix(store.buffer, fresh, key)
float(jnp.sum(buf[0, 0].astype(jnp.float32)))
print(f"mix (half refill permute): {(time.time()-t0)*1e3:.1f} ms")
store.buffer = buf
store.ptr = 0

t0 = time.time()
for _ in range(6):
    b = store.next_batch()
float(jnp.sum(b[0].astype(jnp.float32)))
print(f"next_batch slice x6: {(time.time()-t0)*1e3:.1f} ms")

t0 = time.time()
store._refill_half()
float(jnp.sum(store.buffer[0, 0].astype(jnp.float32)))
print(f"full _refill_half: {(time.time()-t0)*1e3:.1f} ms")
