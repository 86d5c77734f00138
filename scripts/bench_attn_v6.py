"""Lane-blocked grid variant: heads split across grid dim for deeper
DMA/compute pipelining."""
import functools, time
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from vit_prisma_tpu import HookedViT, ViTConfig
from vit_prisma_tpu.models import layers as L
from vit_prisma_tpu.models.vit import vit_forward
from vit_prisma_tpu.prisma.hooks import NULL_HOOKS

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


def _kernel(q_ref, k_ref, v_ref, z_ref, *, heads_per_block):
    gb, t, hb = q_ref.shape
    h = hb // heads_per_block
    for i in range(heads_per_block):
        sl = slice(i * h, (i + 1) * h)
        s = jax.lax.dot_general(q_ref[:, :, sl], k_ref[:, :, sl],
                                (((2,), (2,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32)
        s = s - jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s)
        p = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(q_ref.dtype)
        z_ref[:, :, sl] = jax.lax.dot_general(
            p, v_ref[:, :, sl], (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32).astype(z_ref.dtype)


def mix(q, k, v, n_heads, gb, head_blocks):
    Bb, T, NH = q.shape
    hb = NH // head_blocks
    spec = pl.BlockSpec((gb, T, hb), lambda i, j: (i, 0, j),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_kernel, heads_per_block=n_heads // head_blocks),
        grid=(Bb // gb, head_blocks),
        in_specs=[spec, spec, spec], out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((Bb, T, NH), q.dtype),
    )(q, k, v)


def make_attn(gb, head_blocks):
    import math
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
        q = ((xf @ Wq) / scale + prm["b_Q"].reshape(-1) / scale).reshape(Bb, T, N * H)
        k = (xf @ Wk + prm["b_K"].reshape(-1)).reshape(Bb, T, N * H)
        v = (xf @ Wv + prm["b_V"].reshape(-1)).reshape(Bb, T, N * H)
        z = mix(q, k, v, N, gb, head_blocks)
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
    dt = bench(lambda p, xx: vit_forward(p, cfg, xx, NULL_HOOKS), params, x)
    print(f"current      : {dt*1e3:8.2f} ms  {B/dt:8.0f} img/s", flush=True)
    orig = L.attention
    for gb, hb in [(16, 2), (32, 2), (32, 4), (64, 4), (16, 4)]:
        L.attention = make_attn(gb, hb)
        try:
            dt = bench(lambda p, xx: vit_forward(p, cfg, xx, NULL_HOOKS),
                       params, x)
            print(f"gb={gb:3d} hb={hb}: {dt*1e3:8.2f} ms  {B/dt:8.0f} img/s",
                  flush=True)
        except Exception as e:
            print(f"gb={gb:3d} hb={hb}: FAILED {type(e).__name__}", flush=True)
    L.attention = orig
    print("done", flush=True)


if __name__ == "__main__":
    main()
