"""Variants: 3D projections (no reshapes) and in-kernel head pairing."""
import functools
import math
import time
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from vit_prisma_tpu import HookedViT, ViTConfig
from vit_prisma_tpu.models import layers as L
from vit_prisma_tpu.models.vit import vit_forward
from vit_prisma_tpu.prisma.hooks import NULL_HOOKS
from vit_prisma_tpu.ops.attention import (_pick_batch_block_tnh,
                                          attention_mix_tnh)

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


def _pair_kernel(q_ref, k_ref, v_ref, z_ref, *, n, t, g):
    gb, tt, nh = q_ref.shape
    h = nh // n
    rows = g * t
    for i in range(0, n, g):
        def grab(ref):
            if g == 1:
                return ref[:, :, i * h:(i + 1) * h]
            return jnp.concatenate(
                [ref[:, :, (i + j) * h:(i + j + 1) * h] for j in range(g)],
                axis=1)
        q = grab(q_ref); k = grab(k_ref); v = grab(v_ref)
        s = jax.lax.dot_general(q, k, (((2,), (2,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32)
        if g > 1:
            rb = jax.lax.broadcasted_iota(jnp.int32, (rows, rows), 0) // t
            cb = jax.lax.broadcasted_iota(jnp.int32, (rows, rows), 1) // t
            s = jnp.where((rb == cb)[None], s, -jnp.inf)
        s = s - jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s)
        p = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(v.dtype)
        z = jax.lax.dot_general(p, v, (((2,), (1,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32
                                ).astype(z_ref.dtype)
        for j in range(g):
            z_ref[:, :, (i + j) * h:(i + j + 1) * h] = \
                z[:, j * t:(j + 1) * t, :]


def pair_mix(q, k, v, n_heads, g):
    Bb, T, NH = q.shape
    gb = _pick_batch_block_tnh(Bb, T * g, NH, q.dtype.itemsize)
    gb = max(1, gb)
    spec = pl.BlockSpec((gb, T, NH), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_pair_kernel, n=n_heads, t=T, g=g),
        grid=(Bb // gb,),
        in_specs=[spec, spec, spec], out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((Bb, T, NH), q.dtype),
    )(q, k, v)


def make_attn(proj3d, g):
    def attn(prm, cfg, q_in, k_in, v_in, hooks=NULL_HOOKS, prefix="attn",
             attention_mask=None):
        scale = math.sqrt(cfg.d_head)
        x = q_in
        Bb, T, D = x.shape
        N, H = cfg.n_heads, cfg.d_head
        Wq = jnp.transpose(prm["W_Q"], (1, 0, 2)).reshape(D, N * H)
        Wk = jnp.transpose(prm["W_K"], (1, 0, 2)).reshape(D, N * H)
        Wv = jnp.transpose(prm["W_V"], (1, 0, 2)).reshape(D, N * H)
        Wo = prm["W_O"].reshape(N * H, D)
        if proj3d:
            q = (jnp.einsum("btd,dn->btn", x, Wq) / scale
                 + prm["b_Q"].reshape(-1) / scale)
            k = jnp.einsum("btd,dn->btn", x, Wk) + prm["b_K"].reshape(-1)
            v = jnp.einsum("btd,dn->btn", x, Wv) + prm["b_V"].reshape(-1)
        else:
            xf = x.reshape(Bb * T, D)
            q = ((xf @ Wq) / scale + prm["b_Q"].reshape(-1) / scale).reshape(Bb, T, N * H)
            k = (xf @ Wk + prm["b_K"].reshape(-1)).reshape(Bb, T, N * H)
            v = (xf @ Wv + prm["b_V"].reshape(-1)).reshape(Bb, T, N * H)
        if g == 0:
            z = attention_mix_tnh(q, k, v, N)
        else:
            z = pair_mix(q, k, v, N, g)
        if proj3d:
            return jnp.einsum("btn,nd->btd", z, Wo) + prm["b_O"]
        return (z.reshape(Bb * T, N * H) @ Wo).reshape(Bb, T, D) + prm["b_O"]
    return attn


def main():
    float(jnp.ones((8, 8)).sum())
    cfg = ViTConfig(n_layers=12, d_model=768, d_head=64, n_heads=12,
                    d_mlp=3072, patch_size=32, image_size=224, n_classes=512,
                    activation_name="quick_gelu", layer_norm_pre=True,
                    return_type="class_logits", dtype="bfloat16",
                    use_fused_attention=False)
    model = HookedViT(cfg, key=jax.random.PRNGKey(0))
    params = jax.tree.map(lambda a: a.astype(jnp.bfloat16), model.params)
    x = jax.random.uniform(jax.random.PRNGKey(1), (B, 3, 224, 224),
                           dtype=jnp.bfloat16)
    orig = L.attention
    for label, (p3, g) in [("flat+perhead", (False, 0)),
                           ("3d+perhead", (True, 0)),
                           ("flat+pair2", (False, 2)),
                           ("3d+pair2", (True, 2)),
                           ("3d+pair4", (True, 4))]:
        L.attention = make_attn(p3, g)
        try:
            dt = bench(lambda p, xx: vit_forward(p, cfg, xx, NULL_HOOKS),
                       params, x)
            print(f"{label:13s}: {dt*1e3:8.2f} ms  {B/dt:8.0f} img/s",
                  flush=True)
        except Exception as e:
            print(f"{label:13s}: FAILED {type(e).__name__}: {str(e)[:120]}",
                  flush=True)
    L.attention = orig
    print("done", flush=True)


if __name__ == "__main__":
    main()
