"""TopK threshold approaches at SAE shapes on the real chip."""
import time
import jax
import jax.numpy as jnp
from vit_prisma_tpu.ops.topk import kth_value

B, D, K = 4096, 12288, 64


def bench(fn, *args, iters=30):
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
    float(jnp.ones((8, 8)).sum())
    x = jax.random.normal(jax.random.PRNGKey(0), (B, D), jnp.float32)

    dt = bench(lambda x: kth_value(x, K), x)
    print(f"pallas kth_value       : {dt*1e3:8.3f} ms", flush=True)

    dt = bench(lambda x: jax.lax.top_k(x, K)[0][:, -1], x)
    print(f"lax.top_k              : {dt*1e3:8.3f} ms", flush=True)

    for rt in (None, 0.99, 1.0):
        kw = {} if rt is None else {"recall_target": rt}
        try:
            dt = bench(lambda x: jax.lax.approx_max_k(x, K, **kw)[0][:, -1], x)
            print(f"approx_max_k rt={rt}    : {dt*1e3:8.3f} ms", flush=True)
        except Exception as e:
            print(f"approx_max_k rt={rt}  FAILED {e}", flush=True)

    # exactness of approx_max_k rt=1.0 vs top_k
    v1 = jax.lax.top_k(x, K)[0][:, -1]
    v2 = jnp.min(jax.lax.approx_max_k(x, K, recall_target=1.0)[0], axis=-1)
    print("rt=1.0 exact:", bool(jnp.all(v1 == v2)), flush=True)
    v3 = kth_value(x, K)[:, 0]
    print("pallas exact:", bool(jnp.all(v1 == v3)), flush=True)
    print("done", flush=True)


if __name__ == "__main__":
    main()
