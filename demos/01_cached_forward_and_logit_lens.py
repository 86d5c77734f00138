"""Demo 1: hooked forward, activation cache, interventions, logit lens.

Run: python demos/01_cached_forward_and_logit_lens.py
(uses a randomly-initialized CLIP-B/32-shaped model; swap in
HookedViT.from_pretrained(..., state_dict=...) for real weights)
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from vit_prisma_tpu import HookedViT, ViTConfig, get_act_name
from vit_prisma_tpu.prisma.logit_lens import (
    get_patch_logit_dictionary,
    get_patch_logit_directions,
)

cfg = ViTConfig(n_layers=12, d_model=768, d_head=64, n_heads=12, d_mlp=3072,
                patch_size=32, image_size=224, n_classes=512,
                activation_name="quick_gelu", layer_norm_pre=True,
                return_type="class_logits")
model = HookedViT(cfg, key=jax.random.PRNGKey(0))
images = jnp.asarray(np.random.default_rng(0).normal(
    size=(4, 3, 224, 224)).astype(np.float32))

# 1. cached forward — one XLA program, cache stays in HBM
out, cache = model.run_with_cache(images)
print(f"output {out.shape}; cache has {len(cache)} activations")
print("resid_post[5]:", cache[("resid_post", 5)].shape)
print("attn pattern[3]:", cache[("pattern", 3)].shape)

# 2. intervention: ablate head 7 of layer 5
out_abl = model.run_with_hooks(images, fwd_hooks=[
    (get_act_name("pattern", 5), lambda v, hook: v.at[:, 7].set(0.0))])
print("head-ablation logit delta:",
      float(jnp.abs(out_abl - out).max()))

# 3. residual-stream analyses
accum, labels = cache.accumulated_resid(apply_ln=True, return_labels=True)
print(f"accumulated resid {accum.shape} ({labels[0]}..{labels[-1]})")
heads, hlabels = cache.stack_head_results(return_labels=True,
                                          incl_remainder=True)
print(f"head decomposition {heads.shape} ({len(hlabels)} components)")

# 4. patch-level logit lens against the projection directions
directions, layer_labels = get_patch_logit_directions(cache, model.W_H.T)
lens = get_patch_logit_dictionary(directions, batch_idx=0)
print(f"logit lens: {len(lens)} patches x {len(lens[0])} layers; "
      f"patch 1 final prediction idx={lens[1][-1][2]}")
