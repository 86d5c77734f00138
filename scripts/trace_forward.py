"""Capture a jax.profiler trace of the forward variants and dump per-op
device times (parsed from the xplane proto via xprof)."""
import glob
import os
import shutil
import sys
import time

import jax
import jax.numpy as jnp

from vit_prisma_tpu import HookedViT, ViTConfig
from vit_prisma_tpu.models.vit import vit_forward
from vit_prisma_tpu.prisma.hooks import NULL_HOOKS

B = 256
TRACE_DIR = "/tmp/jax_trace_fwd"


def make_cfg(**kw):
    base = dict(n_layers=12, d_model=768, d_head=64, n_heads=12, d_mlp=3072,
                patch_size=32, image_size=224, n_classes=512,
                activation_name="quick_gelu", layer_norm_pre=True,
                return_type="class_logits", dtype="bfloat16")
    base.update(kw)
    return ViTConfig(**base)


def parse_trace(trace_dir, steps=3):
    """Aggregate device op durations (per step) from the Chrome trace."""
    import collections
    import gzip
    import json
    import re
    paths = glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"),
                      recursive=True)
    agg = collections.Counter()
    cnt = collections.Counter()
    for p in paths:
        with gzip.open(p) as f:
            data = json.load(f)
        events = data["traceEvents"]
        tpu_pids = {e["pid"] for e in events
                    if e.get("ph") == "M" and e.get("name") == "process_name"
                    and "TPU" in e["args"].get("name", "")}
        for e in events:
            if e.get("ph") == "X" and e.get("pid") in tpu_pids:
                name = e["name"]
                if name.startswith("jit_"):
                    continue
                fam = re.sub(r"\.\d+$", "", name)
                agg[fam] += e.get("dur", 0) / 1e6 / steps
                cnt[fam] += 1
    return agg, cnt


def main():
    print("warming device...", flush=True)
    float(jnp.ones((8, 8)).sum())

    cfg = make_cfg(use_fused_attention=(sys.argv[1] == "fused"
                                        if len(sys.argv) > 1 else False))
    model = HookedViT(cfg, key=jax.random.PRNGKey(0))
    params = jax.tree.map(lambda a: a.astype(jnp.bfloat16), model.params)
    x = jax.random.uniform(jax.random.PRNGKey(1), (B, 3, 224, 224),
                           dtype=jnp.bfloat16)
    comp = jax.jit(lambda p, xx: vit_forward(p, cfg, xx, NULL_HOOKS)) \
        .lower(params, x).compile()
    out = comp(params, x)
    float(jnp.sum(out.astype(jnp.float32)))

    shutil.rmtree(TRACE_DIR, ignore_errors=True)
    jax.profiler.start_trace(TRACE_DIR)
    for _ in range(3):
        out = comp(params, x)
    float(jnp.sum(out.astype(jnp.float32)))
    jax.profiler.stop_trace()

    agg, cnt = parse_trace(TRACE_DIR)
    total = sum(agg.values())
    print(f"total device op time: {total*1e3:.2f} ms/step", flush=True)
    for name, dur in agg.most_common(40):
        print(f"{dur*1e3:9.3f} ms/step x{cnt[name]//3:4d} {name[:110]}",
              flush=True)


if __name__ == "__main__":
    main()
