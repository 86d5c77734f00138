"""Correctness + speed of the Pallas row-gather vs XLA gather on TPU."""
import time
import numpy as np
import jax
import jax.numpy as jnp
from vit_prisma_tpu.ops.shuffle import take_rows, permute_rows

float(jnp.ones((8, 8)).sum())

# correctness at sweep-store shape (small)
x = jax.random.normal(jax.random.PRNGKey(0), (512, 24, 128), jnp.float32)
idx = jax.random.permutation(jax.random.PRNGKey(1), 512)
a = jax.jit(take_rows)(x, idx)
b = jnp.take(x, idx, axis=0)
print("exact:", bool(jnp.all(a == b)), flush=True)

# speed at the real sweep-store shape
x = jax.random.normal(jax.random.PRNGKey(0), (24576, 24, 1024), jnp.float32)
idx = jax.random.permutation(jax.random.PRNGKey(1), 24576)
f_pallas = jax.jit(take_rows).lower(x, idx).compile()
f_xla = jax.jit(lambda x, i: jnp.take(x, i, axis=0)).lower(x, idx).compile()
o = f_pallas(x, idx); float(jnp.sum(o[:2, 0]))
t0 = time.time()
for _ in range(3):
    o = f_pallas(x, idx)
float(jnp.sum(o[:2, 0]))
print(f"pallas gather: {(time.time()-t0)/3*1e3:8.1f} ms", flush=True)
o = f_xla(x, idx); float(jnp.sum(o[:2, 0]))
t0 = time.time()
o = f_xla(x, idx)
float(jnp.sum(o[:2, 0]))
print(f"xla gather   : {(time.time()-t0)*1e3:8.1f} ms", flush=True)
# verify equality at full shape too
print("equal:", bool(jnp.all(f_pallas(x, idx) == f_xla(x, idx))), flush=True)
