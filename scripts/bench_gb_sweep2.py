"""gb sweep at B/16 (T=197) and L/14 (T=257) geometries."""
import time
import jax
import jax.numpy as jnp
from vit_prisma_tpu import HookedViT, ViTConfig
from vit_prisma_tpu.models.vit import vit_forward
from vit_prisma_tpu.prisma.hooks import NULL_HOOKS
from vit_prisma_tpu.ops import attention as A


def bench(fn, *args, iters=15):
    comp = jax.jit(fn).lower(*args).compile()
    out = comp(*args)
    float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))
    t0 = time.time()
    for _ in range(iters):
        out = comp(*args)
    float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))
    return (time.time() - t0) / iters


float(jnp.ones((8, 8)).sum())
orig = A._pick_batch_block_tnh
for name, B, kw in [
    ("B/16", 128, dict(n_layers=12, d_model=768, d_head=64, n_heads=12,
                       d_mlp=3072, patch_size=16, image_size=224,
                       n_classes=512)),
    ("L/14", 64, dict(n_layers=24, d_model=1024, d_head=64, n_heads=16,
                      d_mlp=4096, patch_size=14, image_size=224,
                      n_classes=768)),
]:
    cfg = ViTConfig(activation_name="quick_gelu", layer_norm_pre=True,
                    return_type="class_logits", dtype="bfloat16", **kw)
    model = HookedViT(cfg, key=jax.random.PRNGKey(0))
    params = jax.tree.map(lambda a: a.astype(jnp.bfloat16), model.params)
    x = jax.random.uniform(jax.random.PRNGKey(1), (B, 3, 224, 224),
                           dtype=jnp.bfloat16)
    auto = orig(B, cfg.n_tokens, cfg.n_heads * cfg.d_head, 2)
    for gb in sorted({auto, 2, 4, 8, 16}):
        if B % gb:
            continue
        A._pick_batch_block_tnh = lambda *a, g=gb: g
        try:
            dt = bench(lambda p, xx: vit_forward(p, cfg, xx, NULL_HOOKS),
                       params, x)
            star = "*" if gb == auto else " "
            print(f"{name} gb={gb:3d}{star}: {dt*1e3:8.2f} ms  {B/dt:7.0f} img/s",
                  flush=True)
        except Exception as e:
            print(f"{name} gb={gb:3d}: FAILED {type(e).__name__}", flush=True)
    A._pick_batch_block_tnh = orig
print("done", flush=True)
