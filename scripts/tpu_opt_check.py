"""TPU lowering check for the fused Adam kernel at L>1.

The sweep's [L, R, C] stacked-parameter shapes (L=24) tripped Mosaic's
SMEM block rule before the fix in ops/opt_step.py (`(1, 4)` block over a
`(24, 4)` scalar table); CPU interpret-mode tests cannot see that.  This
script lowers + runs the kernel on the real chip and diffs it against the
pure-XLA twin, including per-layer-varying scalars.
"""
import sys
import pathlib

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np
import jax
import jax.numpy as jnp

from vit_prisma_tpu.ops.opt_step import _adam_update_kernel, _adam_update_ref

print("backend:", jax.default_backend())

L, R, C = 24, 64, 256
rng = np.random.default_rng(0)
mk = lambda: jnp.asarray(rng.normal(size=(L, R, C)).astype(np.float32))
p, g, mu, nu = mk(), mk(), jnp.abs(mk()), jnp.abs(mk())
scal = jnp.asarray(np.stack([np.full(L, 0.5), np.full(L, 1e-3),
                             np.full(L, 1.0), np.full(L, 1.0)], 1,
                            dtype=np.float32))
kw = dict(b1=0.9, b2=0.999, eps=1e-8, project=True)
outs = jax.jit(lambda *a: _adam_update_kernel(*a, **kw))(p, g, mu, nu, scal)
refs = jax.jit(lambda *a: _adam_update_ref(*a, **kw))(p, g, mu, nu, scal)
for o, r, name in zip(outs, refs, ("p", "mu", "nu")):
    d = float(jnp.max(jnp.abs(o.astype(jnp.float32) - r.astype(jnp.float32))))
    print(name, "maxdiff", d)
    assert d < 1e-5, (name, d)

# per-layer scalars must actually differ per layer: vary lr by layer
scal2 = scal.at[:, 1].set(jnp.arange(L, dtype=jnp.float32) * 1e-4)
o2 = jax.jit(lambda *a: _adam_update_kernel(*a, **kw))(p, g, mu, nu, scal2)
r2 = jax.jit(lambda *a: _adam_update_ref(*a, **kw))(p, g, mu, nu, scal2)
d = float(jnp.max(jnp.abs(o2[0] - r2[0])))
print("per-layer lr maxdiff", d)
assert d < 1e-5

# bf16 moment storage path too
mub, nub = mu.astype(jnp.bfloat16), nu.astype(jnp.bfloat16)
ob = jax.jit(lambda *a: _adam_update_kernel(*a, **kw))(p, g, mub, nub, scal)
rb = jax.jit(lambda *a: _adam_update_ref(*a, **kw))(p, g, mub, nub, scal)
d = float(jnp.max(jnp.abs(ob[0] - rb[0])))
print("bf16-moments maxdiff", d)
assert d < 1e-5
print("TPU OPT KERNEL OK")
