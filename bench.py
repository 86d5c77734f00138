"""Benchmark: cached-forward images/sec/chip on CLIP ViT-B/32 geometry plus
SAE-training tokens/sec/chip, on the real TPU.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, "extras": {...}}

The headline metric is the hooked cached forward (all 12 resid_post hook
points captured) in bf16 — hot path #1 of the framework (BASELINE.json).
The reference publishes no throughput numbers (BASELINE.md), so
``vs_baseline`` is MEASURED on the only hardware both frameworks share:
the reference's eager-PyTorch hooked forward runs at 10.3 img/s on this
host's CPU (scripts/bench_reference_cpu.py — torch 2.x, batch 16, same
geometry/hook filter).  The extras also report MFU against the measured
bf16 GEMM ceiling of this chip (174.8 TFLOP/s, scripts/profile_forward.py)
— the hardware-grounded view of the same result.

Measurement notes (see .claude/skills/verify/SKILL.md): the first device op
pays ~40-110s of tunnel init, so we warm up first; timings loop a compiled
fn and force completion with a scalar fetch.
"""

from __future__ import annotations

import json
import time

import numpy as np

import jax
import jax.numpy as jnp

# Measured on this host (scripts/bench_reference_cpu.py): the reference's
# eager hooked cached forward, CLIP-B/32 geometry, resid_post filter.
REFERENCE_CPU_IMG_S = 10.3

BATCH = 256
ITERS = 30

# Model FLOPs per image at this geometry (QKV/O + MLP GEMMs + attention
# mix), for the MFU extra.
def _flops_per_image(T=50, D=768, M=3072, L=12):
    gemms = L * (4 * 2 * D * D + 2 * 2 * D * M) * T
    mix = L * 2 * 2 * T * T * D
    return gemms + mix


def main():
    from vit_prisma_tpu import HookedViT, ViTConfig
    from vit_prisma_tpu.models.vit import vit_forward
    from vit_prisma_tpu.prisma.hooks import HookRuntime
    from vit_prisma_tpu.sae import SAERunnerConfig, init_train_state
    from vit_prisma_tpu.sae.train import sae_train_multistep

    # warm up the device/tunnel
    float(jnp.ones((8, 8)).sum())

    # -- cached forward: CLIP ViT-B/32, bf16 speed path -------------------
    cfg = ViTConfig(n_layers=12, d_model=768, d_head=64, n_heads=12,
                    d_mlp=3072, patch_size=32, image_size=224, n_classes=512,
                    activation_name="quick_gelu", layer_norm_pre=True,
                    return_type="class_logits", dtype="bfloat16")
    model = HookedViT(cfg, key=jax.random.PRNGKey(0))
    params = jax.device_put(
        jax.tree.map(lambda a: a.astype(jnp.bfloat16), model.params))
    x = jax.device_put(np.random.default_rng(0).normal(
        size=(BATCH, 3, 224, 224)).astype(np.float32)).astype(jnp.bfloat16)

    def cached_fwd(p, im):
        # The FULL requested cache pytree is a jit output (like
        # __graft_entry__.entry()) — all 12 resid_post tensors materialize
        # in HBM, so the metric matches its label.
        rt = HookRuntime(names_filter=lambda n: n.endswith("hook_resid_post"))
        out = vit_forward(p, cfg, im, rt)
        return out, dict(rt.cache)

    def time_capture(fn):
        comp = jax.jit(fn).lower(params, x).compile()
        out, cache = comp(params, x)
        assert len(cache) >= 12, f"cache dropped entries: {len(cache)}"
        float(jnp.sum(cache["blocks.11.hook_resid_post"].astype(jnp.float32)))
        t0 = time.time()
        for _ in range(ITERS):
            out, cache = comp(params, x)
        float(jnp.sum(cache["blocks.11.hook_resid_post"].astype(jnp.float32)))
        return BATCH * ITERS / (time.time() - t0)

    cached_img_s = time_capture(cached_fwd)

    # -- second headline: the FULL hook-set capture (every §2.13 hook
    # name that fires at this config — ~100 tensors incl. attn patterns)
    def full_cached_fwd(p, im):
        rt = HookRuntime(names_filter=None)
        out = vit_forward(p, cfg, im, rt)
        return out, dict(rt.cache)

    full_hookset_img_s = time_capture(full_cached_fwd)

    # -- gradient paths (both ride the Pallas backward attention kernel,
    # ops/attention.py): supervised train step + incl_bwd attribution ----
    from vit_prisma_tpu.models.vit import hook_names
    from vit_prisma_tpu.prisma.hooks import grad_cached_traced
    rnames = tuple(n for n in hook_names(cfg)
                   if n.endswith("hook_resid_post"))
    attrib = jax.jit(grad_cached_traced(
        lambda p, im, rt: vit_forward(p, cfg, im, rt), rnames,
        incl_bwd=True)).lower(params, x).compile()
    out, cache = attrib(params, x)
    assert sum(k.endswith("_grad") for k in cache) >= 12, sorted(cache)
    float(jnp.sum(cache["blocks.0.hook_resid_post_grad"]
                  .astype(jnp.float32)))
    t0 = time.time()
    for _ in range(ITERS):
        out, cache = attrib(params, x)
    float(jnp.sum(cache["blocks.0.hook_resid_post_grad"]
                  .astype(jnp.float32)))
    attrib_img_s = BATCH * ITERS / (time.time() - t0)

    # train step LAST among the B/32 sections: it donates its state, which
    # holds the very `params` buffers the sections above still read.
    import optax
    from vit_prisma_tpu.training.trainer import TrainState, make_train_step
    opt = optax.adamw(1e-4)
    tstate = TrainState(params, opt.init(params), jnp.zeros((), jnp.int32))
    labels = jnp.asarray(
        np.random.default_rng(1).integers(0, 512, BATCH), jnp.int32)
    step = make_train_step(cfg, opt, "CrossEntropy")
    tstate, loss = step(tstate, x, labels)
    float(loss)
    t0 = time.time()
    for _ in range(ITERS):
        tstate, loss = step(tstate, x, labels)
    float(loss)
    train_img_s = BATCH * ITERS / (time.time() - t0)
    del tstate, opt

    # -- SAE train steps: 768 -> 12288 (x16), batch 4096 ------------------
    # the trainer's production path: steps_per_dispatch fused steps per
    # host dispatch (sae_train_multistep; numerics == single steps,
    # tests/test_multistep.py).  iters sized so the timing window is
    # ~1s of device time: this host's tunnel adds tens of ms of jitter
    # per dispatch batch, which read short windows up to 10% slow
    # (fp32/bf16 rows at iters=100 measured 815k/791k in one run vs a
    # tight 841/930k at iters=200 x3 reps)
    def bench_sae(scfg, iters=200, k=10):
        state = init_train_state(scfg, key=jax.random.PRNGKey(0))
        batches = jax.random.normal(jax.random.PRNGKey(1), (k, 4096, 768))
        state, m = sae_train_multistep(state, batches, scfg)
        float(m.loss[-1])
        n = max(1, iters // k)
        t0 = time.time()
        for _ in range(n):
            state, m = sae_train_multistep(state, batches, scfg)
        float(m.loss[-1])
        return 4096 * n * k / (time.time() - t0)

    base = dict(d_in=768, expansion_factor=16, train_batch_size=4096,
                lr=1e-3, lr_scheduler_name="cosineannealingwarmup",
                b_dec_init_method="zeros", log_to_wandb=False)
    sae_tok_s = bench_sae(SAERunnerConfig(**base))
    # bf16 mixed-precision recipe (fp32 masters; quality-gated by the
    # config-3 rehearsal, tests/test_config3_rehearsal.py)
    sae_bf16_tok_s = bench_sae(SAERunnerConfig(**base,
                                               compute_dtype="bfloat16"))
    sae_topk_tok_s = bench_sae(SAERunnerConfig(
        **base, activation_fn_str="topk", activation_fn_kwargs=(("k", 64),)),
        iters=160)
    # exact TopK on the bf16 compute path: the threshold kernel's
    # 16-position search (bf16 values are mask-exact at half the passes)
    sae_topk_exact_bf16_tok_s = bench_sae(SAERunnerConfig(
        **base, activation_fn_str="topk", activation_fn_kwargs=(("k", 64),),
        compute_dtype="bfloat16"), iters=160)
    # the TopK production recipe: approx_max_k threshold (~95% recall) +
    # bf16 compute
    sae_topk_fast_tok_s = bench_sae(SAERunnerConfig(
        **base, activation_fn_str="topk", activation_fn_kwargs=(("k", 64),),
        topk_use_approx=True, compute_dtype="bfloat16"), iters=160)
    # gated SAE on the fused kernel (one-GEMM encoder + dual-decoder
    # sweep + rematerializing VJP; ops/sae_step.py gated section)
    sae_gated_tok_s = bench_sae(SAERunnerConfig(
        **base, architecture="gated", compute_dtype="bfloat16"), iters=160)

    # -- all-layer sweep: ViT-L/14, 24 SAEs x8 (BASELINE config 5) ---------
    # free the B/32 buffers first — leftover HBM pressure slows the
    # sweep's harvest measurably
    import gc
    del model, params, x
    gc.collect()
    from vit_prisma_tpu.sae import SAESweepTrainer, VisionActivationsStore
    lcfg = ViTConfig(n_layers=24, d_model=1024, d_head=64, n_heads=16,
                     d_mlp=4096, patch_size=14, image_size=224,
                     n_classes=768, activation_name="quick_gelu",
                     layer_norm_pre=True, return_type="class_logits",
                     dtype="bfloat16")
    lmodel = HookedViT(lcfg, key=jax.random.PRNGKey(0))
    lmodel.params = jax.tree.map(lambda a: a.astype(jnp.bfloat16),
                                 lmodel.params)
    K = 6  # steps per dispatch = batches per half-buffer
    # production sweep recipe: bf16 compute (fp32 masters) + the fused
    # Pallas step kernel (ops/sae_step.py) + fused multi-step dispatch +
    # uint8 image wire with on-device normalization (the H2D link here is
    # ~33MiB/s + ~270ms fixed; the buffer size amortizes the fixed cost).
    # batch 4096 (the reference's default train_batch_size and the
    # single-SAE bench shape): vs the r04 recipe's 2048x12 it halves the
    # per-cycle optimizer/unit-norm traffic over the 402M fp32 sweep
    # masters and runs the GEMMs at better MXU utilization — with the
    # stored-acts backward, measured 594k -> 790k tok/s at identical
    # tokens/cycle (docs/PERFORMANCE.md)
    scfg = SAERunnerConfig(
        d_in=1024, expansion_factor=8, context_size=lcfg.n_tokens,
        sweep_layers=tuple(range(24)), layer_subtype="hook_resid_post",
        store_batch_size=48, n_batches_in_buffer=2, train_batch_size=4096,
        steps_per_dispatch=K, compute_dtype="bfloat16", lr=1e-3,
        lr_scheduler_name="constant", b_dec_init_method="zeros",
        log_to_wandb=False, buffer_tokens_override=49_152)
    from vit_prisma_tpu.dataloaders.transforms import CLIP_MEAN, CLIP_STD
    clip_norm = (np.asarray(CLIP_MEAN, np.float32),
                 np.asarray(CLIP_STD, np.float32))
    imgs = np.random.default_rng(0).integers(
        0, 256, size=(96, 3, 224, 224), dtype=np.uint8)
    # production recipe: device-resident dataset + the fused steady-state
    # cycle (harvest + mix + 6 train steps = ONE dispatch per cycle,
    # train.py make_fused_cycle) — refills included by construction
    store = VisionActivationsStore(scfg, lmodel, imgs,
                                   device_norm=clip_norm,
                                   device_dataset=True, prefetch=False)
    sweep = SAESweepTrainer(scfg, model=lmodel, store=store)
    sweep.train_steps(store.next_batches(K))  # serve the initial buffer
    sweep.train_cycles(1)                     # compile the cycle program
    float(jnp.sum(sweep.state.params["b_enc"]))
    t0 = time.time()
    sweep_cycles = 5
    sweep.train_cycles(sweep_cycles)
    float(jnp.sum(sweep.state.params["b_enc"]))
    sweep_tok_s = (sweep_cycles * K * scfg.train_batch_size * 24 /
                   (time.time() - t0))
    del store, sweep
    gc.collect()
    # drop the fused-cycle section's compiled programs AND their held
    # temp allocations — at the batch-4096 recipe the streaming section
    # below OOMs HBM otherwise (its harvest peaks alongside the 2.4GB
    # buffer + 4.8GB optimizer state + 1.6GB stored acts)
    jax.clear_caches()
    gc.collect()

    # the same sweep through the streaming store (host images crossing
    # the wire every refill) — the H2D-bound number for thin links.
    # stored acts OFF: the streaming store interleaves harvest-chunk
    # dispatches with train dispatches, so the 1.6GB act tensor would
    # coexist with the harvest buffers and OOM; the path is H2D-bound
    # anyway, so remat costs nothing here
    import dataclasses as _dc
    scfg_s = _dc.replace(scfg, fused_store_acts=False)
    store_s = VisionActivationsStore(scfg_s, lmodel, imgs,
                                     device_norm=clip_norm,
                                     device_dataset=False)
    sweep_s = SAESweepTrainer(scfg_s, model=lmodel, store=store_s)
    sweep_s.train_steps(store_s.next_batches(K))
    sweep_s.train_steps(store_s.next_batches(K))  # warms the refill
    float(jnp.sum(sweep_s.state.params["b_enc"]))
    t0 = time.time()
    sweep_chunks = 3
    for _ in range(sweep_chunks):
        sweep_s.train_steps(store_s.next_batches(K))
    float(jnp.sum(sweep_s.state.params["b_enc"]))
    sweep_streaming_tok_s = (sweep_chunks * K * scfg.train_batch_size * 24 /
                             (time.time() - t0))

    mfu_pct = 100.0 * _flops_per_image() * cached_img_s / 1e12 / 174.8
    print(json.dumps({
        "metric": "cached-forward images/sec/chip (CLIP ViT-B/32, bf16, "
                  "all resid_post hooks)",
        "value": round(cached_img_s, 1),
        "unit": "images/s",
        "vs_baseline": round(cached_img_s / REFERENCE_CPU_IMG_S, 1),
        "extras": {
            "gemm_ceiling_mfu_pct": round(mfu_pct, 1),
            "full_hookset_img_s": round(full_hookset_img_s, 1),
            "vit_train_img_s": round(train_img_s, 1),
            "attribution_incl_bwd_img_s": round(attrib_img_s, 1),
            "grad_paths_note": "vit_train_img_s = supervised AdamW "
                               "fwd+bwd+update step (bf16, CrossEntropy); "
                               "attribution_incl_bwd_img_s = run_with_cache "
                               "incl_bwd: forward + gradients at all 12 "
                               "resid_post hooks in one XLA program; both "
                               "use the Pallas backward attention kernel",
            "sae_train_tokens_per_s": round(sae_tok_s, 1),
            "sae_train_tokens_per_s_bf16": round(sae_bf16_tok_s, 1),
            "sae_topk_train_tokens_per_s": round(sae_topk_tok_s, 1),
            "sae_topk_exact_bf16_tokens_per_s":
                round(sae_topk_exact_bf16_tok_s, 1),
            "sae_topk_approx_bf16_tokens_per_s":
                round(sae_topk_fast_tok_s, 1),
            "sae_gated_train_tokens_per_s_bf16":
                round(sae_gated_tok_s, 1),
            "l14_24sae_sweep_tokens_per_s": round(sweep_tok_s, 1),
            "l14_24sae_sweep_streaming_tokens_per_s":
                round(sweep_streaming_tok_s, 1),
            "sweep_recipe": "bf16 compute + fp32 masters + fused Pallas "
                            "step kernel + fused steady-state cycle "
                            "(device-resident uint8 dataset; harvest + "
                            "mix + 6 train steps of batch 4096 = one "
                            "dispatch/cycle), "
                            "refills included.  _streaming_ = same sweep "
                            "with images crossing host->device every "
                            "refill (bound by this env's ~33MiB/s H2D "
                            "tunnel; production PCIe would be "
                            "compute-bound)",
            "sae_shape": "768->12288 (x16), batch 4096, adam+unitnorm+ghostmask",
            "batch": BATCH,
            "baseline_note": "vs the reference's eager hooked forward "
                             "MEASURED at 10.3 img/s on this host's CPU "
                             "(scripts/bench_reference_cpu.py; the "
                             "reference publishes no accelerator numbers); "
                             "gemm_ceiling_mfu_pct is vs the measured "
                             "174.8 TFLOP/s bf16 GEMM ceiling of this chip",
        },
    }))


if __name__ == "__main__":
    main()
