"""Measure the fused multi-step dispatch win on the real chip:
single-step dispatch loop vs sae_train_multistep / sweep trainer loop.
"""
import time

import numpy as np

import jax
import jax.numpy as jnp

from vit_prisma_tpu import HookedViT, ViTConfig
from vit_prisma_tpu.sae import (SAERunnerConfig, SAESweepTrainer,
                                VisionActivationsStore, init_train_state,
                                sae_train_multistep)
from vit_prisma_tpu.sae.train import sae_train_step

float(jnp.ones((8, 8)).sum())  # tunnel warmup

base = dict(d_in=768, expansion_factor=16, train_batch_size=4096,
            lr=1e-3, lr_scheduler_name="cosineannealingwarmup",
            b_dec_init_method="zeros", log_to_wandb=False)
scfg = SAERunnerConfig(**base)

# single-step
state = init_train_state(scfg, key=jax.random.PRNGKey(0))
batch = jax.random.normal(jax.random.PRNGKey(1), (4096, 768))
state, m = sae_train_step(state, batch, scfg)
float(m.loss)
t0 = time.time()
for _ in range(60):
    state, m = sae_train_step(state, batch, scfg)
float(m.loss)
dt = time.time() - t0
print(f"single-step: {4096*60/dt:,.0f} tok/s ({dt/60*1e3:.2f} ms/step)")

# fused k=10
for k in (5, 10, 20):
    state = init_train_state(scfg, key=jax.random.PRNGKey(0))
    batches = jax.random.normal(jax.random.PRNGKey(1), (k, 4096, 768))
    state, m = sae_train_multistep(state, batches, scfg)
    float(m.loss[-1])
    n = max(1, 60 // k)
    t0 = time.time()
    for _ in range(n):
        state, m = sae_train_multistep(state, batches, scfg)
    float(m.loss[-1])
    dt = time.time() - t0
    print(f"fused k={k}: {4096*n*k/dt:,.0f} tok/s ({dt/(n*k)*1e3:.2f} ms/step)")

# ---- sweep: ViT-L/14 24 SAEs (bench.py config), single vs fused ----------
lcfg = ViTConfig(n_layers=24, d_model=1024, d_head=64, n_heads=16,
                 d_mlp=4096, patch_size=14, image_size=224,
                 n_classes=768, activation_name="quick_gelu",
                 layer_norm_pre=True, return_type="class_logits",
                 dtype="bfloat16")
lmodel = HookedViT(lcfg, key=jax.random.PRNGKey(0))
lmodel.params = jax.tree.map(lambda a: a.astype(jnp.bfloat16), lmodel.params)
K = 6
swcfg = SAERunnerConfig(
    d_in=1024, expansion_factor=8, context_size=lcfg.n_tokens,
    sweep_layers=tuple(range(24)), layer_subtype="hook_resid_post",
    store_batch_size=32, n_batches_in_buffer=2, train_batch_size=2048,
    steps_per_dispatch=K, lr=1e-3, lr_scheduler_name="constant",
    b_dec_init_method="zeros", log_to_wandb=False,
    buffer_tokens_override=24_576)
imgs = np.random.default_rng(0).normal(
    size=(64, 3, 224, 224)).astype(np.float32)
store = VisionActivationsStore(swcfg, lmodel, imgs)
sweep = SAESweepTrainer(swcfg, model=lmodel, store=store)

# old path timing (single dispatch per step)
sweep.train_step(store.next_batch())
store._refill_half()
sweep.train_step(store.next_batch())
float(jnp.sum(sweep.state.params["b_enc"]))
t0 = time.time()
for _ in range(12):
    sweep.train_step(store.next_batch())
float(jnp.sum(sweep.state.params["b_enc"]))
dt = time.time() - t0
print(f"sweep single: {12*2048*24/dt:,.0f} SAE-tok/s")

# fused path
sweep.train_steps(store.next_batches(K))
sweep.train_steps(store.next_batches(K))
float(jnp.sum(sweep.state.params["b_enc"]))
t0 = time.time()
chunks = 3
for _ in range(chunks):
    sweep.train_steps(store.next_batches(K))
float(jnp.sum(sweep.state.params["b_enc"]))
dt = time.time() - t0
print(f"sweep fused k={K}: {chunks*K*2048*24/dt:,.0f} SAE-tok/s")
