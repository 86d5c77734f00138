"""Trace the L/14 sweep train step to find where time goes."""
import glob, os, shutil, time
import numpy as np
import jax
import jax.numpy as jnp
from vit_prisma_tpu import HookedViT, ViTConfig
from vit_prisma_tpu.sae import SAERunnerConfig, SAESweepTrainer, VisionActivationsStore

float(jnp.ones((8, 8)).sum())

vcfg = ViTConfig(n_layers=24, d_model=1024, d_head=64, n_heads=16,
                 d_mlp=4096, patch_size=14, image_size=224, n_classes=768,
                 activation_name="quick_gelu", layer_norm_pre=True,
                 return_type="class_logits", dtype="bfloat16")
model = HookedViT(vcfg, key=jax.random.PRNGKey(0))
model.params = jax.tree.map(lambda a: a.astype(jnp.bfloat16), model.params)
scfg = SAERunnerConfig(
    d_in=1024, expansion_factor=8, context_size=vcfg.n_tokens,
    sweep_layers=tuple(range(24)), layer_subtype="hook_resid_post",
    store_batch_size=32, n_batches_in_buffer=2, train_batch_size=2048,
    lr=1e-3, lr_scheduler_name="constant", b_dec_init_method="zeros",
    log_to_wandb=False, dtype="float32", buffer_tokens_override=24_576)
images = np.random.default_rng(0).normal(size=(64, 3, 224, 224)).astype(np.float32)
store = VisionActivationsStore(scfg, model, images)
trainer = SAESweepTrainer(scfg, model=model, store=store)
trainer.train_step(store.next_batch())
float(jnp.sum(trainer.state.params["b_enc"]))

# time the pure train step (no refill) and the harvest separately
b = store.next_batch()
t0 = time.time()
for _ in range(5):
    trainer.train_step(b)
float(jnp.sum(trainer.state.params["b_enc"]))
print(f"pure sweep step: {(time.time()-t0)/5*1e3:.1f} ms", flush=True)

imgs = jnp.asarray(images[:32])
store.get_activations(imgs)
t0 = time.time()
for _ in range(5):
    a = store.get_activations(imgs)
float(jnp.sum(a[:8, 0].astype(jnp.float32)))
print(f"harvest batch-32: {(time.time()-t0)/5*1e3:.1f} ms", flush=True)

t0 = time.time()
store._refill_half()
print(f"one refill_half: {(time.time()-t0)*1e3:.1f} ms", flush=True)
