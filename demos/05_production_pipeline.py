"""Demo 5: the production training + serving pipeline.

End-to-end on one chip: JPEG folder -> C++ async batch loader (uint8
wire) -> activation store with on-device normalization -> bf16
mixed-precision SAE training on the fused Pallas step -> AOT serving
export of the hooked forward.

Run: python demos/05_production_pipeline.py
(synthesizes a small JPEG folder; swap in a real ImageNet path +
HookedViT.from_pretrained for real runs)
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from vit_prisma_tpu import (
    CompiledForward,
    HookedViT,
    ViTConfig,
    export_forward,
    load_forward,
)
from vit_prisma_tpu.dataloaders.native import NativeBatchLoader, native_available
from vit_prisma_tpu.sae import SAERunnerConfig, VisionActivationsStore, VisionSAETrainer


def main():
    # -- a tiny JPEG "dataset" ------------------------------------------
    from PIL import Image
    root = tempfile.mkdtemp(prefix="demo_jpegs_")
    rng = np.random.default_rng(0)
    paths = []
    for i in range(32):
        arr = rng.integers(0, 256, size=(64, 64, 3), dtype=np.uint8)
        p = os.path.join(root, f"{i}.jpg")
        Image.fromarray(arr).save(p, quality=92)
        paths.append(p)
    print(f"dataset: {len(paths)} JPEGs, native pipeline: "
          f"{native_available()}")

    # -- model (random weights at demo scale) ---------------------------
    vcfg = ViTConfig(n_layers=4, d_model=128, d_head=32, n_heads=4,
                     d_mlp=512, patch_size=8, image_size=32, n_classes=64,
                     activation_name="quick_gelu", layer_norm_pre=True,
                     return_type="class_logits", dtype="bfloat16")
    model = HookedViT(vcfg, key=jax.random.PRNGKey(0))
    model.params = jax.tree.map(lambda a: a.astype(jnp.bfloat16),
                                model.params)

    # -- C++ loader feeds the store over the uint8 wire -----------------
    scfg = SAERunnerConfig(
        d_in=128, expansion_factor=4, hook_point_layer=2,
        layer_subtype="hook_resid_post", context_size=vcfg.n_tokens,
        store_batch_size=8, n_batches_in_buffer=4,
        buffer_tokens_override=1024, train_batch_size=256,
        store_wire_dtype="uint8",          # raw pixels over H2D
        compute_dtype="bfloat16",          # bf16 GEMMs, fp32 masters
        steps_per_dispatch=2,              # fused multi-step dispatch
        lr=1e-3, lr_scheduler_name="cosineannealingwarmup",
        lr_warm_up_steps=10, b_dec_init_method="zeros",
        total_training_images=5_000, log_to_wandb=False, verbose=True,
        wandb_log_frequency=4)
    loader = NativeBatchLoader(paths, batch_size=scfg.store_batch_size,
                               out_size=vcfg.image_size, seed=0,
                               uint8_wire=True)
    store = VisionActivationsStore(scfg, model, loader)
    print(f"store: wire dtype {store._wire_dtype.__name__}, device_norm "
          f"auto-resolved: {store.device_norm is not None}")

    trainer = VisionSAETrainer(scfg, model=model, store=store)
    sae = trainer.run(max_steps=12)
    print(f"trained {int(trainer.state.step)} steps; "
          f"final b_enc norm {float(jnp.linalg.norm(sae.params['b_enc'])):.4f}")
    loader.close()

    # -- serving: AOT executable + portable artifact --------------------
    cf = CompiledForward(model, batch_size=8)
    imgs = rng.normal(size=(20, 3, 32, 32)).astype(np.float32)
    logits = cf(imgs)  # 2 full chunks + 1 padded, f32 request vs bf16 model
    print(f"CompiledForward: {imgs.shape[0]} images -> logits "
          f"{tuple(logits.shape)}")

    artifact = export_forward(model, batch_size=None,
                              names_filter=f"blocks.2.hook_resid_post")
    fn = load_forward(artifact)   # no model code needed from here
    out, cache = fn(jnp.asarray(imgs[:5], jnp.bfloat16))
    print(f"exported artifact: {len(artifact):,} bytes, batch-polymorphic; "
          f"served batch 5 -> logits {tuple(out.shape)}, cached "
          f"{list(cache)[0]} {tuple(cache['blocks.2.hook_resid_post'].shape)}")


if __name__ == "__main__":
    main()
