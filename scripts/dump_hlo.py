"""Dump the optimized HLO of the forward and summarize the big fusions."""
import re
import sys
import jax
import jax.numpy as jnp
from vit_prisma_tpu import HookedViT, ViTConfig
from vit_prisma_tpu.models.vit import vit_forward
from vit_prisma_tpu.prisma.hooks import NULL_HOOKS

B = 256
fused = len(sys.argv) > 1 and sys.argv[1] == "fused"
cfg = ViTConfig(n_layers=12, d_model=768, d_head=64, n_heads=12, d_mlp=3072,
                patch_size=32, image_size=224, n_classes=512,
                activation_name="quick_gelu", layer_norm_pre=True,
                return_type="class_logits", dtype="bfloat16",
                use_fused_attention=fused)
model = HookedViT(cfg, key=jax.random.PRNGKey(0))
params = jax.tree.map(lambda a: a.astype(jnp.bfloat16), model.params)
x = jnp.zeros((B, 3, 224, 224), jnp.bfloat16)
comp = jax.jit(lambda p, xx: vit_forward(p, cfg, xx, NULL_HOOKS)).lower(params, x).compile()
txt = comp.as_text()
with open(f"/tmp/hlo_{'fused' if fused else 'unfused'}.txt", "w") as f:
    f.write(txt)
# print each convert_reduce fusion's root + operand shapes (first lines)
for m in re.finditer(r"^%?(convert_reduce_fusion[.\d]*) = ([^\n]+)", txt, re.M):
    print(m.group(1), "::", m.group(2)[:160])
print("---- copies ----")
for m in re.finditer(r"^\s*%?(copy[.\d]*) = ([^\n]+)", txt, re.M):
    line = m.group(2)
    if "bf16[" in line or "f32[" in line:
        print(m.group(1), "::", line[:140])
