"""Demo 4: multi-chip SAE training through the public API.

Runs on any machine: with real TPUs the mesh spans the chips; without,
XLA's virtual host devices stand in (set below) so the exact same code
path — sharded harvest forward, row-sharded activation buffer, dp x tp
train step — compiles and executes.

    python demos/04_sharded_training.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

if "xla_force_host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") +
                               " --xla_force_host_platform_device_count=8").strip()

import jax

if jax.default_backend() not in ("tpu",):
    try:
        jax.config.update("jax_platforms", "cpu")
    except RuntimeError:
        pass

import numpy as np

from vit_prisma_tpu import HookedViT, ViTConfig
from vit_prisma_tpu.parallel import make_mesh
from vit_prisma_tpu.sae import (SAERunnerConfig, SAESweepTrainer,
                                VisionActivationsStore, VisionSAETrainer)


def main():
    n_dev = len(jax.devices())
    data_par = 2 if n_dev >= 8 else 1
    model_par = n_dev // data_par
    mesh = make_mesh(data=data_par, model=model_par)
    print(f"mesh: data={data_par} x model={model_par} on {jax.devices()[0].platform}")

    vcfg = ViTConfig(n_layers=4, d_model=64, d_head=16, n_heads=4, d_mlp=256,
                     patch_size=8, image_size=32, n_classes=16,
                     activation_name="quick_gelu", layer_norm_pre=True,
                     return_type="class_logits")
    model = HookedViT(vcfg, key=jax.random.PRNGKey(0))
    images = np.random.default_rng(0).normal(
        size=(64, 3, 32, 32)).astype(np.float32)

    # --- single SAE, dp(batch) x tp(d_sae) -------------------------------
    cfg = SAERunnerConfig(
        d_in=64, expansion_factor=8, context_size=vcfg.n_tokens,
        hook_point_layer=2, layer_subtype="hook_resid_post",
        store_batch_size=8, n_batches_in_buffer=2, train_batch_size=64,
        total_training_images=100_000, lr=1e-3,
        lr_scheduler_name="constant", b_dec_init_method="zeros",
        log_to_wandb=False, verbose=True, wandb_log_frequency=10)
    store = VisionActivationsStore(cfg, model, images, mesh=mesh)
    trainer = VisionSAETrainer(cfg, model=model, store=store)
    trainer.run(max_steps=30)
    print(f"single-SAE: step={int(trainer.state.step)} "
          f"W_enc sharding={trainer.state.params['W_enc'].sharding}")

    # --- all-layer sweep, dp(batch) x layer-parallel ----------------------
    sweep_cfg = cfg.replace(sweep_layers=tuple(range(vcfg.n_layers)),
                            expansion_factor=4)
    sweep_store = VisionActivationsStore(sweep_cfg, model, images, mesh=mesh)
    sweep = SAESweepTrainer(sweep_cfg, model=model, store=sweep_store)
    saes = sweep.run(max_steps=20)
    print(f"sweep: {len(saes)} SAEs trained, "
          f"losses finite={np.isfinite(np.asarray(sweep.state.step)).all()}")


if __name__ == "__main__":
    main()
