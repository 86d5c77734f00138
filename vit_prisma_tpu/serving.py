"""Production serving: AOT-compiled forwards and portable export artifacts.

The reference has no deployment story (research checkpoints are loaded
into eager PyTorch); a TPU-native framework serves models as compiled
programs.  Two mechanisms:

- :class:`CompiledForward` — an ahead-of-time compiled executable for a
  fixed batch size (``jit(...).lower().compile()``): no retracing, no
  dispatch-time Python in the hot path, automatic padding of short final
  batches.  This is the low-latency path for an in-process server.
- :func:`export_forward` / :func:`load_forward` — a *portable* serialized
  artifact (``jax.export`` / StableHLO) with the parameters baked in:
  ship one file to a serving fleet and run it without the model code.
  With ``batch_size=None`` the artifact is batch-polymorphic (a symbolic
  batch dimension); symbolic shapes require the einsum attention path
  (the Pallas kernel's grid is shape-specialized), which the exporter
  selects automatically.

The cached forward exports too: ``names_filter`` bakes the requested hook
set into the artifact (the jit-specialization contract of
``run_with_cache`` — prisma/hooks.py), so an interpretability service can
serve activations, not just logits.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax import export as jax_export


def _forward_fn(cfg, names_filter, stop_at_layer):
    from vit_prisma_tpu.models.vit import vit_forward
    from vit_prisma_tpu.prisma.hooks import NULL_HOOKS, HookRuntime

    def fwd(params, images):
        if names_filter is None:
            return vit_forward(params, cfg, images, NULL_HOOKS,
                               stop_at_layer)
        rt = HookRuntime(names_filter=names_filter)
        out = vit_forward(params, cfg, images, rt, stop_at_layer)
        return out, dict(rt.cache)

    return fwd


class CompiledForward:
    """AOT-compiled fixed-batch forward for serving.

    ``model``: a HookedViT (or any object with ``.params`` and ``.cfg``).
    Calls accept any number of images; full batches run through the one
    compiled executable, a short final chunk is zero-padded to the batch
    size and the padding rows are dropped from the result.
    """

    def __init__(self, model, batch_size: int,
                 names_filter=None, stop_at_layer: Optional[int] = None):
        self.cfg = model.cfg
        self.params = model.params
        self.batch_size = batch_size
        self.names_filter = names_filter
        c = self.cfg
        x_spec = jax.ShapeDtypeStruct(
            (batch_size, c.n_channels, c.image_size, c.image_size),
            jax.tree.leaves(model.params)[0].dtype)
        fwd = _forward_fn(c, names_filter, stop_at_layer)
        p_spec = jax.tree.map(
            lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), model.params)
        self._exec = jax.jit(fwd).lower(p_spec, x_spec).compile()
        self._in_dtype = x_spec.dtype

    def __call__(self, images):
        # the AOT executable is dtype-exact: cast requests (e.g. float32
        # numpy images against bf16 weights) to the compiled input dtype
        images = jnp.asarray(images, self._in_dtype)
        n = images.shape[0]
        bs = self.batch_size
        outs = []
        for i in range(0, n, bs):
            chunk = images[i:i + bs]
            pad = bs - chunk.shape[0]
            if pad:
                chunk = jnp.concatenate(
                    [chunk, jnp.zeros((pad,) + chunk.shape[1:],
                                      chunk.dtype)])
            out = self._exec(self.params, chunk)
            if pad:
                out = jax.tree.map(lambda a: a[:bs - pad], out)
            outs.append(out)
        if len(outs) == 1:
            return outs[0]
        return jax.tree.map(lambda *xs: jnp.concatenate(xs, axis=0), *outs)


def export_forward(model, batch_size: Optional[int] = None,
                   names_filter=None, stop_at_layer: Optional[int] = None,
                   path: Optional[str] = None) -> bytes:
    """Serialize the (optionally cached) forward as a portable jax.export
    artifact with the parameters baked in as constants.

    ``batch_size=None`` exports a batch-polymorphic artifact (symbolic
    leading dimension); pallas kernels are shape-specialized, so the
    exporter compiles the einsum attention path in that case (and for
    fixed sizes too — exported artifacts may be loaded on hosts without
    the kernel's tuning assumptions).  Returns the serialized bytes and
    optionally writes them to ``path``.
    """
    cfg = dataclasses.replace(model.cfg, use_fused_attention=False)
    c = cfg
    fwd = _forward_fn(cfg, names_filter, stop_at_layer)
    params = model.params

    def fn(images):
        return fwd(params, images)

    dtype = jax.tree.leaves(params)[0].dtype
    if batch_size is None:
        (b,) = jax_export.symbolic_shape("b")
        x_spec = jax.ShapeDtypeStruct(
            (b, c.n_channels, c.image_size, c.image_size), dtype)
    else:
        x_spec = jax.ShapeDtypeStruct(
            (batch_size, c.n_channels, c.image_size, c.image_size), dtype)
    exported = jax_export.export(jax.jit(fn))(x_spec)
    data = exported.serialize()
    if path is not None:
        with open(path, "wb") as f:
            f.write(bytes(data))
    return bytes(data)


def load_forward(source) -> Callable:
    """Load an :func:`export_forward` artifact (bytes or a path) and return
    the callable ``images -> outputs``.  The first call compiles for the
    local backend; no model code or weights are needed."""
    if isinstance(source, str):
        with open(source, "rb") as f:
            source = f.read()
    exported = jax_export.deserialize(bytearray(source))
    return jax.jit(exported.call)
