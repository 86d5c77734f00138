"""Demo 3: all-layer SAE sweep — one cached forward feeds an SAE per layer,
all trained simultaneously via vmap.

Run: python demos/03_all_layer_sweep.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import numpy as np

from vit_prisma_tpu import HookedViT, ViTConfig
from vit_prisma_tpu.sae import (
    SAERunnerConfig,
    SAESweepTrainer,
    VisionActivationsStore,
)

vcfg = ViTConfig(n_layers=6, d_model=128, d_head=32, n_heads=4, d_mlp=512,
                 patch_size=16, image_size=64, n_classes=64,
                 return_type="class_logits")
model = HookedViT(vcfg, key=jax.random.PRNGKey(0))

cfg = SAERunnerConfig(
    d_in=vcfg.d_model, expansion_factor=8, context_size=vcfg.n_tokens,
    sweep_layers=tuple(range(vcfg.n_layers)),
    layer_subtype="hook_resid_post",
    store_batch_size=32, buffer_tokens_override=8192,
    train_batch_size=1024, total_training_images=2048,
    lr=1e-3, lr_scheduler_name="constant",
    b_dec_init_method="mean", log_to_wandb=False)

images = np.random.default_rng(0).normal(
    size=(256, 3, 64, 64)).astype(np.float32)
store = VisionActivationsStore(cfg, model, images)
print("sweep buffer:", store.buffer.shape)   # [rows, n_layers, d_in]
trainer = SAESweepTrainer(cfg, model=model, store=store)
saes = trainer.run(max_steps=50)
for i, sae in enumerate(saes):
    print(f"layer {i}: SAE at {sae.cfg.hook_point}")
