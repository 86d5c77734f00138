"""A/B the sweep refill strategies on chip: incremental harvest pacing
(current) vs burst-at-refill (pre-39d5b6a behavior, approximated by
disabling _pace_harvest so _finish_harvest dispatches every chunk at the
refill point and chunk buffers die immediately after the concat)."""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

float(jnp.ones((8, 8)).sum())
sys.path.insert(0, '/root/repo')
from vit_prisma_tpu import HookedViT, ViTConfig  # noqa: E402
from vit_prisma_tpu.sae import (SAERunnerConfig, SAESweepTrainer,  # noqa: E402
                                VisionActivationsStore)
from vit_prisma_tpu.dataloaders.transforms import CLIP_MEAN, CLIP_STD  # noqa: E402

K = 12
lcfg = ViTConfig(n_layers=24, d_model=1024, d_head=64, n_heads=16,
                 d_mlp=4096, patch_size=14, image_size=224,
                 n_classes=768, activation_name="quick_gelu",
                 layer_norm_pre=True, return_type="class_logits",
                 dtype="bfloat16")
lmodel = HookedViT(lcfg, key=jax.random.PRNGKey(0))
lmodel.params = jax.tree.map(lambda a: a.astype(jnp.bfloat16), lmodel.params)
scfg = SAERunnerConfig(
    d_in=1024, expansion_factor=8, context_size=lcfg.n_tokens,
    sweep_layers=tuple(range(24)), layer_subtype="hook_resid_post",
    store_batch_size=48, n_batches_in_buffer=2, train_batch_size=2048,
    steps_per_dispatch=K, compute_dtype="bfloat16", lr=1e-3,
    lr_scheduler_name="constant", b_dec_init_method="zeros",
    log_to_wandb=False, buffer_tokens_override=49_152)
clip_norm = (np.asarray(CLIP_MEAN, np.float32),
             np.asarray(CLIP_STD, np.float32))
imgs = np.random.default_rng(0).integers(0, 256, size=(96, 3, 224, 224),
                                         dtype=np.uint8)


def run(paced: bool, cycles: int = 4) -> float:
    store = VisionActivationsStore(scfg, lmodel, imgs, device_norm=clip_norm)
    if not paced:
        store._pace_harvest = lambda rows_after: None
    sweep = SAESweepTrainer(scfg, model=lmodel, store=store)
    sweep.train_steps(store.next_batches(K))
    sweep.train_steps(store.next_batches(K))
    float(jnp.sum(sweep.state.params["b_enc"]))
    t0 = time.time()
    per_fetch, per_train = [], []
    for _ in range(cycles):
        f0 = time.time()
        b = store.next_batches(K)
        f1 = time.time()
        sweep.train_steps(b)
        # host-side dispatch times only (no device sync mid-loop — the
        # bench pipeline stays intact; the final fetch syncs everything)
        per_fetch.append(f1 - f0)
        per_train.append(time.time() - f1)
    float(jnp.sum(sweep.state.params["b_enc"]))
    dt = time.time() - t0
    tok_s = cycles * K * scfg.train_batch_size * 24 / dt
    print(f"paced={paced}: {tok_s:,.0f} tok/s  "
          f"fetch={np.mean(per_fetch)*1e3:.0f}ms "
          f"train={np.mean(per_train)*1e3:.0f}ms", flush=True)
    del store, sweep
    import gc
    gc.collect()
    return tok_s


for mode in (True, False, True, False):
    run(mode)
