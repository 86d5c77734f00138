"""Demo 2: train a TopK SAE on streamed ViT activations.

Run: python demos/02_train_sae.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import numpy as np

from vit_prisma_tpu import HookedViT, ViTConfig
from vit_prisma_tpu.sae import (
    SAERunnerConfig,
    VisionActivationsStore,
    VisionSAETrainer,
)

vcfg = ViTConfig(n_layers=4, d_model=128, d_head=32, n_heads=4, d_mlp=512,
                 patch_size=16, image_size=64, n_classes=64,
                 return_type="class_logits")
model = HookedViT(vcfg, key=jax.random.PRNGKey(0))

cfg = SAERunnerConfig(
    d_in=vcfg.d_model, expansion_factor=8,
    hook_point_layer=2, layer_subtype="hook_resid_post",
    context_size=vcfg.n_tokens,
    activation_fn_str="topk", activation_fn_kwargs={"k": 16},
    store_batch_size=32, n_batches_in_buffer=4, train_batch_size=1024,
    total_training_images=4096, lr=1e-3, lr_warm_up_steps=20,
    b_dec_init_method="geometric_median", verbose=True,
    wandb_log_frequency=20, log_to_wandb=False)

images = np.random.default_rng(0).normal(
    size=(512, 3, 64, 64)).astype(np.float32)
store = VisionActivationsStore(cfg, model, images)
trainer = VisionSAETrainer(cfg, model=model, store=store)
sae = trainer.run()
print("trained SAE:", sae.get_name())
print("final tokens:", int(trainer.state.n_training_tokens))
