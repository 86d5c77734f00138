"""Measure the reference's eager hooked forward and our JAX forward on the
SAME host CPU — a measured (not estimated) normalization for bench.py.

CLIP ViT-B/32 geometry, random weights, batch 16, cached resid_post hooks.
"""
import time
import sys

sys.path.insert(0, "/root/repo/tests")


def bench_reference():
    import torch
    from reference_oracle import load_reference
    load_reference()
    from vit_prisma.models.base_vit import HookedViT
    from vit_prisma.configs.HookedViTConfig import HookedViTConfig

    cfg = HookedViTConfig(
        n_layers=12, d_model=768, d_head=64, n_heads=12, d_mlp=3072,
        patch_size=32, image_size=224, n_classes=512,
        activation_name="quick_gelu", layer_norm_pre=True,
        return_type="class_logits")
    model = HookedViT(cfg)
    model.eval()
    x = torch.randn(16, 3, 224, 224)
    with torch.no_grad():
        model.run_with_cache(x, names_filter=lambda n: "resid_post" in n)
        t0 = time.time()
        iters = 5
        for _ in range(iters):
            out, cache = model.run_with_cache(
                x, names_filter=lambda n: "resid_post" in n)
        dt = (time.time() - t0) / iters
    return 16 / dt


def bench_ours_cpu():
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from vit_prisma_tpu import HookedViT, ViTConfig
    cfg = ViTConfig(n_layers=12, d_model=768, d_head=64, n_heads=12,
                    d_mlp=3072, patch_size=32, image_size=224, n_classes=512,
                    activation_name="quick_gelu", layer_norm_pre=True,
                    return_type="class_logits", use_fused_attention=False)
    model = HookedViT(cfg, key=jax.random.PRNGKey(0))
    x = jnp.zeros((16, 3, 224, 224), jnp.float32)
    out, cache = model.run_with_cache(
        x, names_filter=lambda n: "resid_post" in n,
        return_cache_object=False)
    t0 = time.time()
    iters = 5
    for _ in range(iters):
        out, cache = model.run_with_cache(
            x, names_filter=lambda n: "resid_post" in n,
            return_cache_object=False)
    float(jnp.sum(out.astype(jnp.float32)))
    return 16 / ((time.time() - t0) / iters)


if __name__ == "__main__":
    import multiprocessing as mp
    ref = bench_reference()
    print(f"reference eager hooked forward (CPU): {ref:8.1f} img/s")
    ours = bench_ours_cpu()
    print(f"ours XLA-CPU hooked forward        : {ours:8.1f} img/s")
    print(f"same-host ratio: {ours / ref:.2f}x")
