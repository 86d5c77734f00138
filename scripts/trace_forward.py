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


def parse_xplane(trace_dir):
    """Aggregate device op durations from the xplane proto."""
    from xprof.convert import _pywrap_profiler_plugin as pp  # noqa: F401
    # fall back: read via tensorflow profiler proto parsing
    from xprof.protobuf import xplane_pb2
    paths = glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                      recursive=True)
    agg = {}
    for p in paths:
        xs = xplane_pb2.XSpace()
        with open(p, "rb") as f:
            xs.ParseFromString(f.read())
        for plane in xs.planes:
            if "TPU" not in plane.name and "tpu" not in plane.name.lower():
                continue
            ev_names = plane.event_metadata
            for line in plane.lines:
                for ev in line.events:
                    name = ev_names[ev.metadata_id].name
                    dur = ev.duration_ps / 1e12
                    agg[name] = agg.get(name, 0.0) + dur
    return agg


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

    agg = parse_xplane(TRACE_DIR)
    total = sum(agg.values())
    print(f"total device op time: {total*1e3:.2f} ms (3 steps)", flush=True)
    for name, dur in sorted(agg.items(), key=lambda kv: -kv[1])[:40]:
        print(f"{dur*1e3:9.3f} ms  {name[:120]}", flush=True)


if __name__ == "__main__":
    main()
