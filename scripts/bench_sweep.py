"""All-layer sweep throughput (BASELINE config 5): ViT-L/14, 24 SAEs x8."""
import time
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
    log_to_wandb=False, dtype="float32",
    buffer_tokens_override=24_576)
images = np.random.default_rng(0).normal(
    size=(64, 3, 224, 224)).astype(np.float32)
store = VisionActivationsStore(scfg, model, images)
trainer = SAESweepTrainer(scfg, model=model, store=store)

# warm one step
trainer.train_step(store.next_batch())
float(jnp.sum(trainer.state.params["b_enc"]))
t0 = time.time()
steps = 20
for _ in range(steps):
    m = trainer.train_step(store.next_batch())
float(jnp.sum(trainer.state.params["b_enc"]))
dt = time.time() - t0
toks = steps * scfg.train_batch_size * 24
print(f"sweep: {toks/dt:,.0f} SAE-tokens/s ({dt/steps*1e3:.1f} ms/step incl. refills)")
