"""Drive round-2 changes through the public API on the real TPU chip."""
import io
import contextlib
import jax
import jax.numpy as jnp
import numpy as np

from vit_prisma_tpu import HookedViT, ViTConfig
from vit_prisma_tpu import test_prompt
from vit_prisma_tpu.dataloaders import load_imagenet_dict, load_imagenet_emoji

print("warming device...", flush=True)
float(jnp.ones((8, 8)).sum())
print("device:", jax.devices(), flush=True)

cfg = ViTConfig(n_layers=12, d_model=768, d_head=64, n_heads=12, d_mlp=3072,
                patch_size=32, image_size=224, n_classes=1000,
                activation_name="quick_gelu", layer_norm_pre=True,
                return_type="logits",
                attn_dropout_rate=0.1, mlp_dropout_rate=0.1)
model = HookedViT(cfg, key=jax.random.PRNGKey(0))
x = jax.random.uniform(jax.random.PRNGKey(1), (8, 3, 224, 224))

# eval forward (no key): deterministic
a = np.asarray(model(x))
b = np.asarray(model(x))
assert np.array_equal(a, b), "eval forward must be deterministic"

# train forward (key): dropout applied, differs per key
t1 = np.asarray(model(x, dropout_key=jax.random.PRNGKey(5)))
t2 = np.asarray(model(x, dropout_key=jax.random.PRNGKey(6)))
assert not np.allclose(t1, t2), "dropout keys must change the output"
assert not np.allclose(t1, a), "train-mode must differ from eval"
print("dropout on TPU: eval deterministic, train stochastic  OK", flush=True)

# test_prompt end-to-end with vendored names
buf = io.StringIO()
with contextlib.redirect_stdout(buf):
    test_prompt(x[0], model, example_answer="goldfish", top_k=5)
out = buf.getvalue()
assert out.count("Top ") == 5 and "ImageNet Index: 1" in out
print("test_prompt on TPU (vendored ImageNet names)  OK", flush=True)
print(out.splitlines()[0], flush=True)

d = load_imagenet_dict(); e = load_imagenet_emoji()
assert d[281].startswith("tabby") and len(e) == 1000
print("vendored tables  OK", flush=True)
print("ALL VERIFY CHECKS PASSED", flush=True)
