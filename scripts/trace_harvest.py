"""Trace the L/14 sweep harvest + the refill mix."""
import glob, os, shutil, sys, time
sys.path.insert(0, "/root/repo/scripts")
import numpy as np
import jax
import jax.numpy as jnp
from vit_prisma_tpu import HookedViT, ViTConfig
from vit_prisma_tpu.sae import SAERunnerConfig, VisionActivationsStore
from trace_forward import parse_trace

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
imgs = jnp.asarray(images[:32])
store.get_activations(imgs)

TD = "/tmp/jax_trace_harvest"
shutil.rmtree(TD, ignore_errors=True)
jax.profiler.start_trace(TD)
for _ in range(3):
    a = store.get_activations(imgs)
float(jnp.sum(a[:8, 0].astype(jnp.float32)))
jax.profiler.stop_trace()
agg, cnt = parse_trace(TD)
print("== harvest per step ==", flush=True)
for name, dur in agg.most_common(12):
    print(f"{dur*1e3:9.3f} ms x{cnt[name]//3:4d} {name[:80]}", flush=True)

# and the mix alone
fresh = store._fill(store.buffer.shape[0] - store.buffer.shape[0] // 2)
key = jax.random.PRNGKey(0)
store._mix(store.buffer, fresh, key)  # compile (donates buffer!)
store.buffer = store._fill(scfg.tokens_per_buffer if False else 24_576)
fresh = store._fill(12_288)
t0 = time.time()
out = store._mix(store.buffer, fresh, key)
float(jnp.sum(out[:4, 0].astype(jnp.float32)))
print(f"mix alone: {(time.time()-t0)*1e3:.1f} ms", flush=True)
