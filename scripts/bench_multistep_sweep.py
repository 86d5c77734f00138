"""Sweep-only multistep comparison in a clean process (no leftover HBM)."""
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

from vit_prisma_tpu import HookedViT, ViTConfig
from vit_prisma_tpu.sae import (SAERunnerConfig, SAESweepTrainer,
                                VisionActivationsStore)

MODE = sys.argv[1] if len(sys.argv) > 1 else "both"

float(jnp.ones((8, 8)).sum())

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


def sync():
    float(jnp.sum(sweep.state.params["b_enc"]))


if MODE in ("both", "single"):
    # warm: one full cycle (6 steps) + refill
    for _ in range(7):
        sweep.train_step(store.next_batch())
    sync()
    t0 = time.time()
    for _ in range(24):
        sweep.train_step(store.next_batch())
    sync()
    dt = time.time() - t0
    print(f"sweep single: {24*2048*24/dt:,.0f} SAE-tok/s "
          f"({dt/24*1e3:.0f} ms/step)")

if MODE in ("both", "fused"):
    sweep.train_steps(store.next_batches(K))
    sweep.train_steps(store.next_batches(K))  # warms refill too
    sync()
    t0 = time.time()
    chunks = 4
    for _ in range(chunks):
        sweep.train_steps(store.next_batches(K))
    sync()
    dt = time.time() - t0
    print(f"sweep fused k={K}: {chunks*K*2048*24/dt:,.0f} SAE-tok/s "
          f"({dt/(chunks*K)*1e3:.0f} ms/step)")
