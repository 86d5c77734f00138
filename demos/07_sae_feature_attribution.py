"""Demo 7: SAE-feature attribution through a spliced SAE.

Run: python demos/07_sae_feature_attribution.py
(randomly-initialized model + SAE; swap in HookedViT.from_pretrained and
SparseAutoencoder.load_from_pretrained for real analyses)

The SAELens attribution workflow: attach an SAE with ``use_error_term=True``
so the forward pass is the CLEAN model (reconstruction + stop-gradient
error), but gradients route through the SAE's feature basis.  One
``run_with_cache(incl_bwd=True)`` call then yields, in a single XLA
program, both the feature activations and d metric / d feature — their
product is the linear attribution of each SAE feature to the metric.

Reference counterpart: HookedSAEViT.add_sae + torch backward hooks
(/root/reference/src/vit_prisma/models/base_vit.py:850-1086,
prisma_tools/hooked_root_module.py:255-287).
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

# The error-term identity (recon + sg(value - recon) == value) holds to
# rounding; keep matmuls at f32 so the clean-forward check stays tight on
# TPU too (default TPU precision re-rounds each GEMM to bf16-ish and the
# residual drifts to ~1e-2 at logit scale by the last layer).
jax.config.update("jax_default_matmul_precision", "highest")

from vit_prisma_tpu import HookedViT, ViTConfig
from vit_prisma_tpu.models.sae_vit import HookedSAEViT
from vit_prisma_tpu.sae import SAERunnerConfig, SparseAutoencoder

cfg = ViTConfig(n_layers=4, d_model=128, d_head=32, n_heads=4, d_mlp=512,
                patch_size=16, image_size=64, n_classes=64,
                activation_name="quick_gelu", layer_norm_pre=True,
                return_type="class_logits")
model = HookedSAEViT(cfg, key=jax.random.PRNGKey(0))

HOOK_LAYER = 2
scfg = SAERunnerConfig(d_in=cfg.d_model, expansion_factor=8,
                       hook_point_layer=HOOK_LAYER,
                       layer_subtype="hook_resid_post",
                       b_dec_init_method="zeros", log_to_wandb=False)
sae = SparseAutoencoder(scfg, key=jax.random.PRNGKey(1))
HP = scfg.hook_point

rng = np.random.default_rng(0)
x = jnp.asarray(rng.normal(size=(4, 3, 64, 64)).astype(np.float32))

# the metric to attribute: a class-logit difference
metric = lambda out: (out[:, 3] - out[:, 9]).sum()

# 1. clean reference point (no SAE)
clean_out = model(x)

# 2. error-term splice: clean forward, gradients through the SAE features
with model.saes([sae], use_error_term=True):
    out, cache = model.run_with_cache(
        x, names_filter=lambda n: n.startswith(HP),
        incl_bwd=True, loss_fn=metric, return_cache_object=False)

np.testing.assert_allclose(np.asarray(out), np.asarray(clean_out), atol=1e-4)
feats = cache[f"{HP}.hook_hidden_post"]            # [B, T, d_sae]
grads = cache[f"{HP}.hook_hidden_post_grad"]       # d metric / d feature
attribution = feats * grads                        # linear attribution

per_feature = np.asarray(jnp.abs(attribution).sum(axis=(0, 1)))
top = np.argsort(-per_feature)[:10]
print(f"metric {float(metric(out)):+.4f} (clean forward preserved)")
print("top-10 attributed SAE features:")
for f in top:
    print(f"  feature {f:5d}  |attribution| {per_feature[f]:.4f}")

# 3. sanity: ablating the top feature through the splice moves the metric
top_feat = int(top[0])
ablate = lambda v, hook: v.at[..., top_feat].set(0.0)
with model.saes([sae]):  # substitution splice for the causal check
    base = metric(model.run_with_hooks(x))
    abl = metric(model.run_with_hooks(
        x, fwd_hooks=[(f"{HP}.hook_hidden_post", ablate)]))
print(f"substituted metric {float(base):+.4f} -> ablated {float(abl):+.4f}")
assert abs(float(base) - float(abl)) > 0, "top feature had no causal effect"
print("OK")
