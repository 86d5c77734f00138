"""Drive the backward Pallas attention kernel on the real TPU chip.

Checks (single process, AOT executables only — see .claude/skills/verify):
  1. correctness: jax.grad through attention_mix_tnh (Pallas fwd + Pallas
     bwd, NOT interpret mode) vs the pure-XLA einsum VJP oracle, f32 and
     bf16, ViT-B/32 geometry (T=50) and text geometry (causal, T=77);
  2. end-to-end: ViT-B/32 param grads fused vs unfused at bf16;
  3. timing: AOT grad-step of a 12-layer ViT-B/32, fused (Pallas fwd+bwd)
     vs unfused einsum attention, batch 256 bf16.
"""
import dataclasses
import time

import jax
import jax.numpy as jnp
import numpy as np

from vit_prisma_tpu.ops.attention import (attention_mix_tnh,
                                          _mix_tnh_bwd_reference)

print("devices:", jax.devices())
float(jnp.ones((8, 8)).sum())  # tunnel warm-up
print("warm")


def loss_of(fn):
    return lambda q, k, v: jnp.sum(jnp.sin(fn(q, k, v).astype(jnp.float32)))


def check(B, T, N, H, dtype, causal, atol):
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q, k, v = (jax.random.normal(kk, (B, T, N * H), dtype) for kk in ks)
    fused = jax.jit(jax.grad(loss_of(
        lambda a, b, c: attention_mix_tnh(a, b, c, N, causal)),
        argnums=(0, 1, 2)))

    # oracle: einsum attention built inline (fp32 throughout)
    def ein(a, b, c):
        qf = a.astype(jnp.float32).reshape(B, T, N, H)
        kf = b.astype(jnp.float32).reshape(B, T, N, H)
        vf = c.astype(jnp.float32).reshape(B, T, N, H)
        s = jnp.einsum("bqnh,bknh->bnqk", qf, kf)
        if causal:
            row = jax.lax.broadcasted_iota(jnp.int32, (T, T), 0)
            col = jax.lax.broadcasted_iota(jnp.int32, (T, T), 1)
            s = jnp.where((col <= row)[None, None], s, -jnp.inf)
        p = jax.nn.softmax(s, axis=-1)
        return jnp.einsum("bnqk,bknh->bqnh", p, vf).reshape(B, T, N * H)

    g1 = fused(q, k, v)
    g2 = jax.jit(jax.grad(loss_of(ein), argnums=(0, 1, 2)))(q, k, v)
    worst = max(float(jnp.max(jnp.abs(a.astype(jnp.float32) -
                                      b.astype(jnp.float32))))
                for a, b in zip(g1, g2))
    tag = f"B={B} T={T} N={N} H={H} {dtype.__name__} causal={causal}"
    assert worst < atol, f"{tag}: worst={worst} >= {atol}"
    print(f"  grad ok  {tag}  worst_abs_diff={worst:.2e}")


print("correctness:")
check(8, 50, 12, 64, jnp.float32, False, 1e-4)
check(8, 50, 12, 64, jnp.bfloat16, False, 6e-2)
check(8, 77, 8, 64, jnp.float32, True, 1e-4)
check(8, 77, 8, 64, jnp.bfloat16, True, 6e-2)

# --- end-to-end ViT grads fused vs unfused -------------------------------
from vit_prisma_tpu import HookedViT, ViTConfig
from vit_prisma_tpu.models.vit import vit_forward

kw = dict(n_layers=12, d_model=768, d_head=64, n_heads=12, d_mlp=3072,
          patch_size=32, image_size=224, n_classes=1000,
          activation_name="quick_gelu", layer_norm_pre=True,
          return_type="logits", dtype="bfloat16")
cfg_f = ViTConfig(use_fused_attention=True, **kw)
cfg_u = ViTConfig(use_fused_attention=False, **kw)
model = HookedViT(cfg_f, key=jax.random.PRNGKey(0))
x8 = jax.random.uniform(jax.random.PRNGKey(1), (8, 3, 224, 224))


def vit_loss(cfg):
    return lambda p, xx: jnp.sum(
        jnp.sin(vit_forward(p, cfg, xx).astype(jnp.float32)))


gf = jax.jit(jax.grad(vit_loss(cfg_f)))(model.params, x8)
gu = jax.jit(jax.grad(vit_loss(cfg_u)))(model.params, x8)
fl_f, _ = jax.tree.flatten(gf)
fl_u, _ = jax.tree.flatten(gu)
worst = max(float(jnp.max(jnp.abs(a.astype(jnp.float32) -
                                  b.astype(jnp.float32))))
            for a, b in zip(fl_f, fl_u))
scale = max(float(jnp.max(jnp.abs(a.astype(jnp.float32)))) for a in fl_u)
print(f"e2e ViT-B/32 bf16 param grads fused-vs-einsum: worst={worst:.3e} "
      f"(grad scale {scale:.1f})")
assert worst < 0.05 * max(scale, 1.0), "e2e grads diverge"

# --- timing: AOT grad step, batch 256 ------------------------------------
xb = jax.random.uniform(jax.random.PRNGKey(2), (256, 3, 224, 224),
                        jnp.bfloat16)


def bench(cfg, label):
    f = jax.jit(jax.grad(vit_loss(cfg)))
    exe = f.lower(model.params, xb).compile()
    g = exe(model.params, xb)
    float(jnp.sum(g["blocks.0.attn.W_Q"].astype(jnp.float32)))  # sync
    n = 10
    t0 = time.perf_counter()
    for _ in range(n):
        g = exe(model.params, xb)
    float(jnp.sum(g["blocks.0.attn.W_Q"].astype(jnp.float32)))
    dt = (time.perf_counter() - t0) / n
    print(f"{label}: {dt*1e3:.2f} ms/step  {256/dt:,.0f} img/s (fwd+bwd)")
    return dt


t_f = bench(cfg_f, "fused  (Pallas fwd+bwd)")
t_u = bench(cfg_u, "einsum (XLA fwd+bwd)   ")
print(f"speedup: {t_u/t_f:.3f}x")

# --- video-scale flash path (real kernel only runs on the chip) ----------
from vit_prisma_tpu.ops.attention import flash_attention_padded

print("flash (video-scale) path:")
B, N, T, H = 2, 12, 523, 64   # odd T exercises pad+segment masking
Tp = -(-T // 128) * 128
ks = jax.random.split(jax.random.PRNGKey(5), 3)
q, k, v = (jax.random.normal(kk, (B, N, T, H), jnp.float32) for kk in ks)
pad = ((0, 0), (0, 0), (0, Tp - T), (0, 0))
seg = jnp.broadcast_to(
    jnp.where(jnp.arange(Tp) < T, 1, 2)[None].astype(jnp.int32), (B, Tp))


def fl(a, b, c, causal):
    ap, bp, cp = (jnp.pad(t, pad) for t in (a, b, c))
    return flash_attention_padded(ap, bp, cp, seg, causal)[:, :, :T]


def ein(a, b, c, causal):
    s = jnp.einsum("bnqh,bnkh->bnqk", a, b)
    if causal:
        tri = jnp.tril(jnp.ones((T, T), bool))
        s = jnp.where(tri[None, None], s, -jnp.inf)
    return jnp.einsum("bnqk,bnkh->bnqh", jax.nn.softmax(s, -1), c)


for causal in (False, True):
    z = jax.jit(lambda a, b, c: fl(a, b, c, causal))(q, k, v)
    r = ein(q, k, v, causal)
    d = float(jnp.max(jnp.abs(z - r)))
    print(f"  fwd causal={causal}: max diff {d:.2e}")
    assert d < 1e-4
    lf = lambda f: lambda a, b, c: jnp.sum(jnp.sin(f(a, b, c, causal)))
    g1 = jax.jit(jax.grad(lf(fl), argnums=(0, 1, 2)))(q, k, v)
    g2 = jax.grad(lf(ein), argnums=(0, 1, 2))(q, k, v)
    d = max(float(jnp.max(jnp.abs(a - b))) for a, b in zip(g1, g2))
    print(f"  bwd causal={causal}: max diff {d:.2e}")
    assert d < 1e-3

# timing at ViViT scale: the flash path vs what einsum attention costs
import functools
cfg_v = ViTConfig(n_layers=2, d_model=768, d_head=64, n_heads=12,
                  d_mlp=3072, patch_size=16, image_size=224, n_classes=512,
                  video_num_frames=16, video_tubelet_depth=2,
                  activation_name="gelu", layer_norm_pre=True,
                  return_type="class_logits", dtype="bfloat16")
try:
    vmodel = HookedViT(cfg_v, key=jax.random.PRNGKey(0))
    xv = jax.random.uniform(jax.random.PRNGKey(2),
                            (2, 3, 16, 224, 224), jnp.bfloat16)
    for label, cfgx in (("flash ", cfg_v),
                        ("einsum",
                         dataclasses.replace(cfg_v,
                                             use_fused_attention=False))):
        exe = jax.jit(functools.partial(
            lambda c, p, im: vit_forward(p, c, im), cfgx)).lower(
            vmodel.params, xv).compile()
        o = exe(vmodel.params, xv)
        float(jnp.sum(o.astype(jnp.float32)))
        t0 = time.perf_counter()
        for _ in range(5):
            o = exe(vmodel.params, xv)
        float(jnp.sum(o.astype(jnp.float32)))
        dt = (time.perf_counter() - t0) / 5
        print(f"  video fwd 2-layer T~1569 {label}: {dt*1e3:.2f} ms")
except Exception as e:
    print("  video timing skipped:", type(e).__name__, str(e)[:200])

print("VERIFY OK")
