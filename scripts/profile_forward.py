"""Ablation profile of the bf16 forward on the real TPU chip.

Uses AOT-compiled executables (.lower().compile()) and the loop+scalar-fetch
pattern — the same methodology as bench.py, which reproduces round-1 numbers
exactly.  Run in ONE process (first op pays tunnel init).
"""
import time
import jax
import jax.numpy as jnp

from vit_prisma_tpu import HookedViT, ViTConfig
from vit_prisma_tpu.models import layers as L
from vit_prisma_tpu.models.vit import vit_forward
from vit_prisma_tpu.prisma.hooks import NULL_HOOKS

B = 256
ITERS = 30


def make_cfg(**kw):
    base = dict(n_layers=12, d_model=768, d_head=64, n_heads=12, d_mlp=3072,
                patch_size=32, image_size=224, n_classes=512,
                activation_name="quick_gelu", layer_norm_pre=True,
                return_type="class_logits", dtype="bfloat16")
    base.update(kw)
    return ViTConfig(**base)


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


def main():
    print("warming device...", flush=True)
    float(jnp.ones((8, 8)).sum())

    cfg = make_cfg()
    model = HookedViT(cfg, key=jax.random.PRNGKey(0))
    params = jax.tree.map(lambda a: a.astype(jnp.bfloat16), model.params)
    x = jax.random.uniform(jax.random.PRNGKey(1), (B, 3, 224, 224),
                           dtype=jnp.bfloat16)

    dt = bench(lambda p, xx: vit_forward(p, cfg, xx, NULL_HOOKS), params, x)
    print(f"full         : {dt*1e3:8.2f} ms  {B/dt:8.0f} img/s", flush=True)

    # bf16 LayerNorm (no fp32 islands)
    ViTConfig.compute_in_fp32 = property(lambda self: False)
    dt2 = bench(lambda p, xx: vit_forward(p, cfg, xx, NULL_HOOKS), params, x)
    print(f"no_fp32_ln   : {dt2*1e3:8.2f} ms  {B/dt2:8.0f} img/s", flush=True)
    ViTConfig.compute_in_fp32 = property(
        lambda self: self.jax_dtype not in (jnp.float32, jnp.float64))

    # ablate the attention mixing path: z = v (+0*q+0*k to keep projections)
    orig_attention = L.attention
    def attn_no_mix(prm, c, q_in, k_in, v_in, hooks=NULL_HOOKS,
                    prefix="attn", attention_mask=None):
        p = L.prec(c)
        q = jnp.einsum("bpd,ndh->bpnh", q_in, prm["W_Q"], precision=p) + prm["b_Q"]
        k = jnp.einsum("bpd,ndh->bpnh", k_in, prm["W_K"], precision=p) + prm["b_K"]
        v = jnp.einsum("bpd,ndh->bpnh", v_in, prm["W_V"], precision=p) + prm["b_V"]
        z = v + 0.0 * q + 0.0 * k
        return jnp.einsum("bqnh,nhd->bqd", z, prm["W_O"], precision=p) + prm["b_O"]
    L.attention = attn_no_mix
    dt3 = bench(lambda p, xx: vit_forward(p, cfg, xx, NULL_HOOKS), params, x)
    print(f"no_attn_mix  : {dt3*1e3:8.2f} ms  {B/dt3:8.0f} img/s", flush=True)
    L.attention = orig_attention

    # no LN at all
    cfg_noln = make_cfg(normalization_type=None, layer_norm_pre=False)
    params_noln = {k: v for k, v in params.items()
                   if k not in ("ln_pre", "ln_final")}
    params_noln["blocks"] = {k: v for k, v in params["blocks"].items()
                             if k not in ("ln1", "ln2")}
    dt4 = bench(lambda p, xx: vit_forward(p, cfg_noln, xx, NULL_HOOKS),
                params_noln, x)
    print(f"no_ln        : {dt4*1e3:8.2f} ms  {B/dt4:8.0f} img/s", flush=True)

    # pure GEMM chain at the same shapes
    T, D, M = cfg.n_tokens, cfg.d_model, cfg.d_mlp
    kk = jax.random.PRNGKey(3)
    Ws = {n: jax.random.normal(kk, s, jnp.bfloat16) * 0.02
          for n, s in [("wq", (D, D)), ("wk", (D, D)), ("wv", (D, D)),
                       ("wo", (D, D)), ("wi", (D, M)), ("wout", (M, D))]}
    hflat = jax.random.normal(kk, (B * T, D), jnp.bfloat16)
    def gemm_chain(ws, h):
        for _ in range(12):
            q = h @ ws["wq"]; k = h @ ws["wk"]; v = h @ ws["wv"]
            h = (q + k + v) @ ws["wo"]
            h = (h @ ws["wi"]) @ ws["wout"]
        return h
    dt5 = bench(gemm_chain, Ws, hflat)
    flops = B * T * 12 * (4 * 2 * D * D + 2 * 2 * D * M)
    print(f"gemm_chain   : {dt5*1e3:8.2f} ms  {flops/dt5/1e12:6.1f} TFLOP/s",
          flush=True)

    # attention-mix microbench at model shapes
    H, Dh = cfg.n_heads, cfg.d_head
    q = jax.random.normal(jax.random.PRNGKey(2), (B, T, H, Dh), jnp.bfloat16)
    def mix(q):
        s = jnp.einsum("bqnh,bknh->bnqk", q, q) / 8.0
        pat = jax.nn.softmax(s, axis=-1)
        pat = jnp.where(jnp.isnan(pat), jnp.zeros_like(pat), pat).astype(jnp.bfloat16)
        return jnp.einsum("bknh,bnqk->bqnh", q, pat)
    dt6 = bench(mix, q)
    print(f"attn_mix x1  : {dt6*1e3:8.2f} ms ({12*dt6*1e3:6.2f} ms x12)",
          flush=True)

    # LN microbench at model shapes
    resid = jax.random.normal(kk, (B, T, D), jnp.bfloat16)
    w = jnp.ones((D,), jnp.bfloat16); b = jnp.zeros((D,), jnp.bfloat16)
    def ln(xx, w, b):
        y = xx.astype(jnp.float32)
        y = y - y.mean(-1, keepdims=True)
        sc = jnp.sqrt((y * y).mean(-1, keepdims=True) + 1e-5)
        return ((y / sc) * w + b).astype(jnp.bfloat16)
    dtln = bench(ln, resid, w, b)
    print(f"ln x1        : {dtln*1e3:8.3f} ms ({25*dtln*1e3:6.2f} ms x25)",
          flush=True)

    print("done", flush=True)


if __name__ == "__main__":
    main()
