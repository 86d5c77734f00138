"""Dispatch-overhead-immune profile: wrap K steps in one jitted scan so a
single dispatch covers many iterations; also probe raw dispatch cost."""
import time
import jax
import jax.numpy as jnp
from functools import partial

from vit_prisma_tpu import HookedViT, ViTConfig
from vit_prisma_tpu.models.vit import vit_forward
from vit_prisma_tpu.prisma.hooks import NULL_HOOKS

B = 256
K = 20  # steps fused per dispatch


def make_cfg(**kw):
    base = dict(n_layers=12, d_model=768, d_head=64, n_heads=12, d_mlp=3072,
                patch_size=32, image_size=224, n_classes=1000,
                activation_name="quick_gelu", layer_norm_pre=True,
                return_type="logits", dtype="bfloat16")
    base.update(kw)
    return ViTConfig(**base)


def bench_scan(step_fn, *args, reps=3):
    """step_fn(args) -> scalar; runs K steps inside one jitted fori_loop."""
    @jax.jit
    def many(*a):
        def body(i, acc):
            return acc + step_fn(*a)
        return jax.lax.fori_loop(0, K, body, jnp.zeros((), jnp.float32))
    float(many(*args))  # compile + run once
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        float(many(*args))
        best = min(best, (time.perf_counter() - t0) / K)
    return best


def main():
    print("warming device...", flush=True)
    float(jnp.ones((8, 8)).sum())

    # raw dispatch probe: tiny op, 30 dispatches
    tiny = jax.jit(lambda x: x + 1.0)
    v = jnp.zeros((8, 128))
    float(tiny(v).sum())
    t0 = time.perf_counter()
    for _ in range(30):
        v = tiny(v)
    float(v.sum())
    print(f"dispatch overhead: {(time.perf_counter()-t0)/30*1e3:.2f} ms/call",
          flush=True)

    cfg = make_cfg()
    model = HookedViT(cfg, key=jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(1), (B, 3, 224, 224),
                           dtype=jnp.bfloat16)

    def fwd_scalar(params, xx):
        return vit_forward(params, cfg, xx, NULL_HOOKS).astype(jnp.float32).sum()
    dt = bench_scan(fwd_scalar, model.params, x)
    print(f"full        : {dt*1e3:8.2f} ms  {B/dt:8.0f} img/s", flush=True)

    # attention mix alone at model shapes
    T, D, M, H, Dh = cfg.n_tokens, cfg.d_model, cfg.d_mlp, cfg.n_heads, cfg.d_head
    q = jax.random.normal(jax.random.PRNGKey(2), (B, T, H, Dh), jnp.bfloat16)
    def mix_scalar(q):
        s = jnp.einsum("bqnh,bknh->bnqk", q, q) / 8.0
        pat = jax.nn.softmax(s, axis=-1)
        pat = jnp.where(jnp.isnan(pat), jnp.zeros_like(pat), pat).astype(jnp.bfloat16)
        z = jnp.einsum("bknh,bnqk->bqnh", q, pat)
        return z.astype(jnp.float32).sum()
    dt6 = bench_scan(mix_scalar, q)
    print(f"attn_mix x1 : {dt6*1e3:8.2f} ms ({12*dt6*1e3:6.2f} ms x12)", flush=True)

    # GEMM chain
    kk = jax.random.PRNGKey(3)
    Ws = {
        "wq": jax.random.normal(kk, (D, D), jnp.bfloat16) * 0.01,
        "wk": jax.random.normal(kk, (D, D), jnp.bfloat16) * 0.01,
        "wv": jax.random.normal(kk, (D, D), jnp.bfloat16) * 0.01,
        "wo": jax.random.normal(kk, (D, D), jnp.bfloat16) * 0.01,
        "wi": jax.random.normal(kk, (D, M), jnp.bfloat16) * 0.01,
        "wout": jax.random.normal(kk, (M, D), jnp.bfloat16) * 0.01,
    }
    hflat = jax.random.normal(kk, (B * T, D), jnp.bfloat16)
    def gemm_scalar(ws, h):
        for _ in range(12):
            qq = h @ ws["wq"]; kq = h @ ws["wk"]; vq = h @ ws["wv"]
            h = (qq + kq + vq) @ ws["wo"]
            h = (h @ ws["wi"]) @ ws["wout"]
        return h.astype(jnp.float32).sum()
    dt5 = bench_scan(gemm_scalar, Ws, hflat)
    flops = B * T * 12 * (4 * 2 * D * D + 2 * 2 * D * M)
    print(f"gemm_chain  : {dt5*1e3:8.2f} ms  {flops/dt5/1e12:6.1f} TFLOP/s", flush=True)

    # LN cost probe at model shapes
    resid = jax.random.normal(kk, (B, T, D), jnp.bfloat16)
    w = jnp.ones((D,), jnp.bfloat16); b = jnp.zeros((D,), jnp.bfloat16)
    def ln_scalar(xx, w, b):
        y = xx.astype(jnp.float32)
        y = y - y.mean(-1, keepdims=True)
        sc = jnp.sqrt((y * y).mean(-1, keepdims=True) + 1e-5)
        out = ((y / sc) * w + b).astype(jnp.bfloat16)
        return out.astype(jnp.float32).sum()
    dtln = bench_scan(ln_scalar, resid, w, b)
    print(f"ln x1       : {dtln*1e3:8.3f} ms ({25*dtln*1e3:6.2f} ms x25)", flush=True)

    print("done", flush=True)


if __name__ == "__main__":
    main()
