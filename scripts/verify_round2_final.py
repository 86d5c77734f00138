"""Final round-2 verify drive: every new surface, one warmed process."""
import numpy as np
import jax
import jax.numpy as jnp

float(jnp.ones((8, 8)).sum())
print("device:", jax.devices(), flush=True)

# 1. fused forward + hooks contract
from vit_prisma_tpu import HookedViT, ViTConfig, get_act_name
cfg = ViTConfig(n_layers=12, d_model=768, d_head=64, n_heads=12, d_mlp=3072,
                patch_size=32, image_size=224, n_classes=512,
                activation_name="quick_gelu", layer_norm_pre=True,
                return_type="class_logits", dtype="bfloat16")
m = HookedViT(cfg, key=jax.random.PRNGKey(0))
m.params = jax.tree.map(lambda a: a.astype(jnp.bfloat16), m.params)
x = jax.random.uniform(jax.random.PRNGKey(1), (8, 3, 224, 224), jnp.bfloat16)
out, cache = m.run_with_cache(x, names_filter=lambda n: "resid_post" in n)
assert len(cache.cache_dict) == 12 and out.shape == (8, 512)
out2 = m.run_with_hooks(x, fwd_hooks=[(get_act_name("pattern", 5),
                                       lambda v, h: v * 0.0)])
assert not np.allclose(np.asarray(out.astype(jnp.float32)),
                       np.asarray(out2.astype(jnp.float32)))
print("1. fused forward + cache + intervention  OK", flush=True)

# 2. scan path on a deep model
import dataclasses
dcfg = dataclasses.replace(cfg, n_layers=24, scan_blocks="always")
dm = HookedViT(dcfg, key=jax.random.PRNGKey(0))
dout = dm(x.astype(jnp.float32))
assert np.isfinite(np.asarray(dout.astype(jnp.float32))).all()
print("2. 24-layer scan forward  OK", flush=True)

# 3. SAE train + validate + orbax roundtrip
from vit_prisma_tpu.sae import (SAERunnerConfig, VisionActivationsStore,
                                VisionSAETrainer)
from vit_prisma_tpu.sae.train import (load_train_state_sharded,
                                      save_train_state_sharded)
scfg = SAERunnerConfig(d_in=768, expansion_factor=4, context_size=cfg.n_tokens,
                       hook_point_layer=9, store_batch_size=8,
                       n_batches_in_buffer=2, train_batch_size=256,
                       total_training_images=10_000, lr=1e-3,
                       b_dec_init_method="zeros", log_to_wandb=False)
imgs = np.random.default_rng(0).normal(size=(32, 3, 224, 224)).astype(np.float32)
store = VisionActivationsStore(scfg, m, imgs)
labels = np.zeros(32, np.int64)
trainer = VisionSAETrainer(scfg, model=m, store=store,
                           eval_dataset=[(imgs[i], 0) for i in range(8)],
                           class_embeddings=np.eye(512, dtype=np.float32))
trainer.run(max_steps=12)
vv = trainer.validate()
assert vv is not None and np.isfinite(vv["validation_metrics/model_loss"])
p = save_train_state_sharded("/tmp/vr2_ckpt", trainer.state, scfg)
st, _ = load_train_state_sharded(p)
assert int(st.step) == int(trainer.state.step)
print("3. SAE trainer (store refills, validation, orbax)  OK", flush=True)

# 4. shuffle kernel exactness on-chip
from vit_prisma_tpu.ops.shuffle import take_rows
xx = jax.random.normal(jax.random.PRNGKey(3), (1024, 768))
idx = jax.random.permutation(jax.random.PRNGKey(4), 1024)
assert bool(jnp.all(take_rows(xx, idx) == jnp.take(xx, idx, axis=0)))
print("4. shuffle kernel exact on-chip  OK", flush=True)

print("ALL FINAL VERIFY CHECKS PASSED", flush=True)
