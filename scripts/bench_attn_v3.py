"""In-model bench of the zero-copy TNH kernel variant."""
import math
import time
import jax
import jax.numpy as jnp
from vit_prisma_tpu import HookedViT, ViTConfig
from vit_prisma_tpu.models import layers as L
from vit_prisma_tpu.models.vit import vit_forward
from vit_prisma_tpu.prisma.hooks import NULL_HOOKS
from vit_prisma_tpu.ops.attention import attention_mix_tnh

B = 256


def bench(fn, *args, iters=30):
    comp = jax.jit(fn).lower(*args).compile()
    out = comp(*args)
    float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))
    t0 = time.time()
    for _ in range(iters):
        out = comp(*args)
    float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))
    return (time.time() - t0) / iters


def make_attn_tnh(head_group=None):
    def attn(prm, cfg, q_in, k_in, v_in, hooks=NULL_HOOKS, prefix="attn",
             attention_mask=None):
        scale = math.sqrt(cfg.d_head)
        x = q_in
        Bb, T, D = x.shape
        N, H = cfg.n_heads, cfg.d_head
        xf = x.reshape(Bb * T, D)
        Wq = jnp.transpose(prm["W_Q"], (1, 0, 2)).reshape(D, N * H)
        Wk = jnp.transpose(prm["W_K"], (1, 0, 2)).reshape(D, N * H)
        Wv = jnp.transpose(prm["W_V"], (1, 0, 2)).reshape(D, N * H)
        Wo = prm["W_O"].reshape(N * H, D)
        q = (xf @ Wq / scale + prm["b_Q"].reshape(-1) / scale).reshape(Bb, T, N * H)
        k = (xf @ Wk + prm["b_K"].reshape(-1)).reshape(Bb, T, N * H)
        v = (xf @ Wv + prm["b_V"].reshape(-1)).reshape(Bb, T, N * H)
        z = attention_mix_tnh(q, k, v, N, head_group=head_group)
        return (z.reshape(Bb * T, N * H) @ Wo).reshape(Bb, T, D) + prm["b_O"]
    return attn


def main():
    float(jnp.ones((8, 8)).sum())
    cfg = ViTConfig(n_layers=12, d_model=768, d_head=64, n_heads=12,
                    d_mlp=3072, patch_size=32, image_size=224, n_classes=512,
                    activation_name="quick_gelu", layer_norm_pre=True,
                    return_type="class_logits", dtype="bfloat16")
    model = HookedViT(cfg, key=jax.random.PRNGKey(0))
    params = jax.tree.map(lambda a: a.astype(jnp.bfloat16), model.params)
    x = jax.random.uniform(jax.random.PRNGKey(1), (B, 3, 224, 224),
                           dtype=jnp.bfloat16)

    dt0 = bench(lambda p, xx: vit_forward(p, cfg, xx, NULL_HOOKS), params, x)
    print(f"baseline    : {dt0*1e3:8.2f} ms  {B/dt0:8.0f} img/s", flush=True)
    orig = L.attention
    for g in (1, 2, 4, 6):
        L.attention = make_attn_tnh(head_group=g)
        dt = bench(lambda p, xx: vit_forward(p, cfg, xx, NULL_HOOKS), params, x)
        print(f"tnh G={g}     : {dt*1e3:8.2f} ms  {B/dt:8.0f} img/s", flush=True)
    L.attention = orig
    print("done", flush=True)


if __name__ == "__main__":
    main()
