"""Demo 6: attribution patching with backward hooks.

Run: python demos/06_attribution_patching.py
(randomly-initialized CLIP-B/32-shaped model; swap in real weights via
HookedViT.from_pretrained for real analyses)

Attribution patching (Nanda 2023) approximates the effect of activation
patching at every site with ONE clean forward+backward plus one corrupted
forward: effect(name) ~ grad_clean(name) . (act_corrupted(name) -
act_clean(name)).  The reference does this with torch backward hooks
(prisma_tools/hook_point.py dir="bwd"); here the whole thing is three
jitted calls — run_with_cache(incl_bwd=True) returns {name}_grad entries
computed in the same XLA program as the forward (attention gradients ride
the Pallas backward kernel, ops/attention.py).
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from vit_prisma_tpu import HookedViT, ViTConfig

cfg = ViTConfig(n_layers=12, d_model=768, d_head=64, n_heads=12, d_mlp=3072,
                patch_size=32, image_size=224, n_classes=512,
                activation_name="quick_gelu", layer_norm_pre=True,
                return_type="class_logits")
model = HookedViT(cfg, key=jax.random.PRNGKey(0))
rng = np.random.default_rng(0)
clean = jnp.asarray(rng.normal(size=(2, 3, 224, 224)).astype(np.float32))
corrupted = jnp.asarray(rng.normal(size=(2, 3, 224, 224)).astype(np.float32))

# metric: logit difference between two classes (a standard patching metric)
metric = lambda out: (out[:, 17] - out[:, 42]).sum()
flt = lambda n: n.endswith("hook_resid_post") or n.endswith("hook_mlp_out")

# 1. clean forward + backward in ONE program: activations AND d metric/d act
out_clean, cache_clean = model.run_with_cache(
    clean, names_filter=flt, incl_bwd=True, loss_fn=metric,
    return_cache_object=False)
# 2. corrupted forward (activations only)
out_corr, cache_corr = model.run_with_cache(
    corrupted, names_filter=flt, return_cache_object=False)
print(f"clean metric {float(metric(out_clean)):+.4f}   "
      f"corrupted metric {float(metric(out_corr)):+.4f}")

# 3. attribution = grad . delta, per hook point
scores = {}
for name in cache_corr:
    g = cache_clean[name + "_grad"]
    delta = cache_corr[name] - cache_clean[name]
    scores[name] = float(jnp.sum(g * delta))
print("\ntop attribution-patching sites (|approx. metric change|):")
for name in sorted(scores, key=lambda n: -abs(scores[n]))[:8]:
    print(f"  {name:34s} {scores[name]:+.5f}")

# 4. sanity-check the approximation against REAL activation patching at the
# top site: patch the corrupted activation into the clean run via a forward
# hook and compare metric deltas
top = max(scores, key=lambda n: abs(scores[n]))
patched = model.run_with_hooks(
    clean, fwd_hooks=[(top, lambda v, hook: cache_corr[top])])
real = float(metric(patched) - metric(out_clean))
print(f"\n{top}: attribution approx {scores[top]:+.5f} "
      f"vs real patch {real:+.5f}")

# 5. backward INTERVENTION: zero the gradient at layer 6's resid_post and
# watch upstream gradients vanish (gradient flows only through the residual
# stream, so killing it at layer 6 kills everything below)
_, cache_cut = model.run_with_cache(
    clean, names_filter=flt, incl_bwd=True, loss_fn=metric,
    bwd_hooks=[("blocks.6.hook_resid_post", lambda g, hook: g * 0.0)],
    return_cache_object=False)
up = float(jnp.abs(cache_cut["blocks.2.hook_resid_post_grad"]).max())
down = float(jnp.abs(cache_cut["blocks.9.hook_resid_post_grad"]).max())
print(f"\nafter zeroing grad at blocks.6.hook_resid_post: "
      f"max |grad| upstream (layer 2) = {up:.2e}, "
      f"downstream (layer 9) = {down:.2e}")
assert up == 0.0 and down > 0.0
print("\nattribution patching demo OK")
