"""Throughput across geometries for docs/PERFORMANCE.md."""
import time
import jax
import jax.numpy as jnp
from vit_prisma_tpu import HookedViT, ViTConfig
from vit_prisma_tpu.configs.vit_config import TextTransformerConfig
from vit_prisma_tpu.models.text import init_text_params, text_forward
from vit_prisma_tpu.models.vit import vit_forward
from vit_prisma_tpu.prisma.hooks import NULL_HOOKS, HookRuntime


def bench(fn, *args, iters=20):
    comp = jax.jit(fn).lower(*args).compile()
    out = comp(*args)
    float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))
    t0 = time.time()
    for _ in range(iters):
        out = comp(*args)
    float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))
    return (time.time() - t0) / iters


def vit(name, B, **kw):
    cfg = ViTConfig(activation_name="quick_gelu", layer_norm_pre=True,
                    return_type="class_logits", **kw)
    model = HookedViT(cfg, key=jax.random.PRNGKey(0))
    params = jax.tree.map(lambda a: a.astype(cfg.jax_dtype), model.params)
    x = jax.random.uniform(jax.random.PRNGKey(1), (B, 3, cfg.image_size,
                                                   cfg.image_size),
                           dtype=cfg.jax_dtype)
    def cached(p, im):
        rt = HookRuntime(names_filter=lambda n: n.endswith("hook_resid_post"))
        out = vit_forward(p, cfg, im, rt)
        return out, rt.cache[f"blocks.{cfg.n_layers-1}.hook_resid_post"]
    dt = bench(cached, params, x)
    print(f"{name}: {dt*1e3:8.2f} ms  {B/dt:8.0f} img/s (cached fwd, batch {B})",
          flush=True)


float(jnp.ones((8, 8)).sum())
vit("B/32 bf16", 256, n_layers=12, d_model=768, d_head=64, n_heads=12,
    d_mlp=3072, patch_size=32, image_size=224, n_classes=512,
    dtype="bfloat16")
vit("B/32 f32 ", 256, n_layers=12, d_model=768, d_head=64, n_heads=12,
    d_mlp=3072, patch_size=32, image_size=224, n_classes=512,
    dtype="float32")
vit("B/16 bf16", 128, n_layers=12, d_model=768, d_head=64, n_heads=12,
    d_mlp=3072, patch_size=16, image_size=224, n_classes=512,
    dtype="bfloat16")
vit("L/14 bf16", 64, n_layers=24, d_model=1024, d_head=64, n_heads=16,
    d_mlp=4096, patch_size=14, image_size=224, n_classes=768,
    dtype="bfloat16")

# CLIP text tower (B/32 text: 63M params, causal fused kernel)
tcfg = TextTransformerConfig(n_layers=12, d_model=512, d_head=64, n_heads=8,
                             d_mlp=2048, n_classes=512, vocab_size=49408,
                             context_length=77, causal_attention=True,
                             normalization_type="LN",
                             return_type="class_logits", dtype="bfloat16")
tparams = init_text_params(tcfg, jax.random.PRNGKey(0))
tparams = jax.tree.map(lambda a: a.astype(jnp.bfloat16), tparams)
tokens = jax.random.randint(jax.random.PRNGKey(1), (512, 77), 1, 49408)
dt = bench(lambda p, t: text_forward(p, tcfg, t), tparams, tokens)
print(f"text B/32 bf16: {dt*1e3:8.2f} ms  {512/dt:8.0f} prompts/s (batch 512)",
      flush=True)
print("done", flush=True)
