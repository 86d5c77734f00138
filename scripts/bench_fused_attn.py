"""Measure the fused attention kernel vs the einsum path on the real TPU."""
import time
import jax
import jax.numpy as jnp

from vit_prisma_tpu import HookedViT, ViTConfig
from vit_prisma_tpu.models.vit import vit_forward
from vit_prisma_tpu.prisma.hooks import NULL_HOOKS, HookRuntime
from vit_prisma_tpu.ops.attention import attention_mix, attention_mix_reference

B = 256
ITERS = 30


def bench(fn, *args, iters=ITERS):
    comp = jax.jit(fn).lower(*args).compile()
    out = comp(*args)
    leaf = jax.tree.leaves(out)[0]
    float(jnp.sum(leaf.astype(jnp.float32)))
    t0 = time.time()
    for _ in range(iters):
        out = comp(*args)
    leaf = jax.tree.leaves(out)[0]
    float(jnp.sum(leaf.astype(jnp.float32)))
    return (time.time() - t0) / iters


def make_cfg(**kw):
    base = dict(n_layers=12, d_model=768, d_head=64, n_heads=12, d_mlp=3072,
                patch_size=32, image_size=224, n_classes=512,
                activation_name="quick_gelu", layer_norm_pre=True,
                return_type="class_logits", dtype="bfloat16")
    base.update(kw)
    return ViTConfig(**base)


def main():
    print("warming device...", flush=True)
    float(jnp.ones((8, 8)).sum())

    # numerics check first: kernel vs reference mix at model shapes
    kk = jax.random.PRNGKey(0)
    q = jax.random.normal(kk, (8, 12, 50, 64), jnp.float32)
    k = jax.random.normal(jax.random.PRNGKey(1), (8, 12, 50, 64), jnp.float32)
    v = jax.random.normal(jax.random.PRNGKey(2), (8, 12, 50, 64), jnp.float32)
    z1 = jax.jit(attention_mix)(q, k, v)
    z2 = jax.jit(attention_mix_reference)(q, k, v)
    err = float(jnp.max(jnp.abs(z1 - z2)))
    print(f"kernel vs reference max|err| (f32): {err:.2e}", flush=True)
    assert err < 1e-5

    # kernel microbench at bench shapes, sweeping the head-group packing
    from vit_prisma_tpu.ops.attention import _mix_forward
    qb = jax.random.normal(kk, (B, 12, 50, 64), jnp.bfloat16)
    for g in (1, 2, 3, 4, 6, 12):
        try:
            dt_g = bench(lambda q, k, v: _mix_forward(q, k, v, head_group=g),
                         qb, qb, qb)
            print(f"mix kernel G={g:2d}: {dt_g*1e3:8.3f} ms", flush=True)
        except Exception as e:
            print(f"mix kernel G={g:2d}: FAILED {type(e).__name__}", flush=True)
    dt_k = bench(attention_mix, qb, qb, qb)
    dt_r = bench(attention_mix_reference, qb, qb, qb)
    print(f"mix kernel   : {dt_k*1e3:8.3f} ms   (einsum path: {dt_r*1e3:.3f} ms)",
          flush=True)

    # full forward with/without the fused path
    cfg_f = make_cfg(use_fused_attention=True)
    cfg_u = make_cfg(use_fused_attention=False)
    model = HookedViT(cfg_f, key=jax.random.PRNGKey(0))
    params = jax.tree.map(lambda a: a.astype(jnp.bfloat16), model.params)
    x = jax.random.uniform(jax.random.PRNGKey(1), (B, 3, 224, 224),
                           dtype=jnp.bfloat16)

    dt_u = bench(lambda p, xx: vit_forward(p, cfg_u, xx, NULL_HOOKS), params, x)
    print(f"fwd unfused  : {dt_u*1e3:8.2f} ms  {B/dt_u:8.0f} img/s", flush=True)
    dt_f = bench(lambda p, xx: vit_forward(p, cfg_f, xx, NULL_HOOKS), params, x)
    print(f"fwd fused    : {dt_f*1e3:8.2f} ms  {B/dt_f:8.0f} img/s", flush=True)

    # cached forward (resid_post hooks) — the bench headline
    def cached(p, im):
        rt = HookRuntime(names_filter=lambda n: n.endswith("hook_resid_post"))
        out = vit_forward(p, cfg_f, im, rt)
        return out, rt.cache["blocks.11.hook_resid_post"]
    dt_c = bench(cached, params, x)
    print(f"cached fused : {dt_c*1e3:8.2f} ms  {B/dt_c:8.0f} img/s", flush=True)

    # forward output parity fused vs unfused (bf16 tolerance)
    of = jax.jit(lambda p, xx: vit_forward(p, cfg_f, xx, NULL_HOOKS))(params, x)
    ou = jax.jit(lambda p, xx: vit_forward(p, cfg_u, xx, NULL_HOOKS))(params, x)
    d = float(jnp.max(jnp.abs(of.astype(jnp.float32) - ou.astype(jnp.float32))))
    print(f"fused-vs-unfused forward max|err| (bf16): {d:.3e}", flush=True)

    # MFU
    cfgT = cfg_f
    Tk = cfgT.n_tokens
    flops_img = Tk * 12 * (4 * 2 * 768 * 768 + 2 * 2 * 768 * 3072) + \
        2 * Tk * 12 * (2 * Tk * 768)
    print(f"fused fwd effective TFLOP/s: {flops_img*B/dt_f/1e12:.1f} "
          f"(GEMM ceiling ~174.8)", flush=True)
    print("done", flush=True)


if __name__ == "__main__":
    main()
