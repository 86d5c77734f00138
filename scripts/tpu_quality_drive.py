"""Config-3 quality recipe ON THE REAL TPU chip (bf16 production path).

The CPU test platform gates this recipe in tests/test_config3_rehearsal.py;
this script repeats it on hardware (default matmul precision, the axon
chip) to show the quality holds outside the fp32-highest test platform.
Measured 2026-08-17: EV=0.964, L0=503, alive=1.00 — gates PASS.
"""
import numpy as np
import jax, jax.numpy as jnp
float(jnp.ones((8,8)).sum())
import sys; sys.path.insert(0, '/root/repo')
from vit_prisma_tpu import HookedViT, ViTConfig
from vit_prisma_tpu.sae import SAERunnerConfig, VisionActivationsStore, VisionSAETrainer
from vit_prisma_tpu.training import TrainerConfig, train
from vit_prisma_tpu.dataloaders import CircleDataset, train_test_dataset

ds = CircleDataset(p=13, im_size=16, radius=6, n_channels=1)
splits = train_test_dataset(ds, test_split=0.2, seed=0)
vcfg = ViTConfig(n_layers=12, d_model=64, d_head=16, n_heads=4, d_mlp=256,
                 patch_size=4, image_size=16, n_channels=1, n_classes=13,
                 activation_name="quick_gelu", layer_norm_pre=True, return_type="logits")
tcfg = TrainerConfig(lr=2e-3, batch_size=16, num_epochs=40, warmup_steps=10,
                     scheduler_type="CosineAnnealing", log_frequency=10_000, max_steps=250)
print("training circle ViT...", flush=True)
model = train(lambda c: HookedViT(c, key=jax.random.PRNGKey(0)), vcfg,
              splits["train"], splits["test"], tcfg=tcfg)
print("ViT trained", flush=True)
scfg = SAERunnerConfig(
    compute_dtype="bfloat16", d_in=64, expansion_factor=16,
    hook_point_layer=9, layer_subtype="hook_resid_post",
    context_size=vcfg.n_tokens, activation_fn_str="relu", l1_coefficient=1e-5,
    b_dec_init_method="geometric_median", lr=3e-3,
    lr_scheduler_name="cosineannealingwarmup", lr_warm_up_steps=50,
    store_batch_size=16, n_batches_in_buffer=8, train_batch_size=512,
    steps_per_dispatch=4,
    total_training_images=40_000, feature_sampling_window=100_000,
    dead_feature_window=100_000, log_to_wandb=False)
images = np.stack([np.asarray(splits["train"][i][0]) for i in range(len(splits["train"]))])
store = VisionActivationsStore(scfg, model, images)
trainer = VisionSAETrainer(scfg, model=model, store=store)
print("training SAE on TPU...", flush=True)
sae = trainer.run()
from vit_prisma_tpu.models.vit import vit_forward
from vit_prisma_tpu.prisma.hooks import HookRuntime
from vit_prisma_tpu.sae.sae import sae_forward
n = len(splits["test"])
test_imgs = np.stack([np.asarray(splits["test"][i][0]) for i in range(n)])
rt = HookRuntime(names_filter=scfg.hook_point)
vit_forward(model.params, vcfg, jnp.asarray(test_imgs), rt)
acts = rt.cache[scfg.hook_point].reshape(-1, 64)
out = sae_forward(sae.params, scfg, acts, training=False)
resid = jnp.square(acts - out.sae_out).sum(-1)
total = jnp.square(acts - acts.mean(0)).sum(-1)
ev = float((1 - resid / total).mean())
l0 = float((out.feature_acts > 0).sum(-1).mean())
alive = float((np.asarray(trainer.state.act_freq_scores) > 0).mean())
print(f"REAL-TPU config-3 (bf16): EV={ev:.3f} L0={l0:.0f} alive={alive:.2f}", flush=True)
assert ev > 0.90 and alive > 0.5
print("quality gates PASS on TPU hardware", flush=True)
