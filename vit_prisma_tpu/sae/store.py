"""Activation store: an HBM-resident shuffled token buffer fed by jitted
cached forwards.

Counterpart of
``/root/reference/src/vit_prisma/sae/training/activations_store.py:176``
(``VisionActivationsStore``) and :21 (``CacheVisionActivationStore``).

TPU-native design: the reference keeps a GPU tensor buffer refilled by eager
hooked forwards and reshuffled with a torch DataLoader (:298-362, :445-492).
Here the harvest is one compiled XLA program — ``run_with_cache`` specialized
to exactly the requested hook name(s) with ``stop_at_layer`` dead-code
elimination — whose output is written straight into the on-device ring
buffer; shuffling is an on-device ``jax.random.permutation`` gather.  The
host only supplies image batches.

Mixing strategy parity (:445-492): when half the buffer has been served, the
unserved half is retained, a fresh half is harvested, and the concatenation
is re-permuted.
"""

from __future__ import annotations

import os
from typing import Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np

from vit_prisma_tpu.sae.config import SAERunnerConfig


def _image_iterator(dataset, batch_size: int, seed: int = 0) -> Iterator[np.ndarray]:
    """Infinite shuffled iterator over an indexable dataset of images
    (activations_store.py:226-236).  Accepts numpy arrays [N,C,H,W], lists,
    or torch-style datasets yielding (img, label) tuples."""
    rng = np.random.default_rng(seed)
    n = len(dataset)
    while True:
        order = rng.permutation(n)
        for i in range(0, n - batch_size + 1, batch_size):
            idx = order[i:i + batch_size]
            if isinstance(dataset, np.ndarray):
                yield dataset[idx]
            else:
                items = [dataset[int(j)] for j in idx]
                if isinstance(items[0], (tuple, list)):
                    items = [it[0] for it in items]
                items = [np.asarray(it) for it in items]
                yield np.stack(items)


class VisionActivationsStore:
    """Streaming activation buffer over a HookedViT.

    ``mesh``: an optional ``jax.sharding.Mesh`` (axes 'data'/'model').
    With a mesh, the model parameters are placed tensor-parallel
    (parallel/mesh.py ``vit_param_shardings``), the harvest forward runs
    dp x tp, and the buffer lives row-sharded over the 'data' axis, so a
    user-facing sharded training run needs nothing beyond ``mesh=``."""

    def __init__(self, cfg: SAERunnerConfig, model, dataset,
                 eval_dataset=None, seed: Optional[int] = None,
                 mesh=None):
        self.cfg = cfg
        self.model = model
        self.dataset = dataset
        self.eval_dataset = eval_dataset
        self.mesh = mesh
        self.key = jax.random.PRNGKey(cfg.seed if seed is None else seed)
        self.image_iter = _image_iterator(dataset, cfg.store_batch_size,
                                          seed=cfg.seed)
        if mesh is not None:
            from vit_prisma_tpu.parallel.mesh import vit_param_shardings
            model.params = jax.device_put(
                model.params, vit_param_shardings(mesh, model.params))

        if cfg.sweep_layers:
            hooks = [f"blocks.{l}.{cfg.layer_subtype}"
                     for l in cfg.sweep_layers]
            max_layer = max(cfg.sweep_layers)
        else:
            hooks = [cfg.hook_point]
            max_layer = cfg.hook_point_layer
            if cfg.is_transcoder:
                hooks.append(cfg.out_hook_point)
                max_layer = max(max_layer, cfg.out_hook_point_layer)
        self._hook_names = hooks
        self._stop_at = max_layer + 1

        # token rows per harvested image batch / total buffer size
        # (tokens_per_buffer, reference config.py:444-452)
        self.tokens_per_store_batch = cfg.store_batch_size * cfg.tokens_per_image
        self.buffer_tokens = cfg.tokens_per_buffer

        self._harvest = self._build_harvest()
        # Donated mix: the old buffer is consumed in place (no 2x peak HBM);
        # the retained half and fresh tokens are gathered by an on-device
        # permutation into the donated storage.
        def _mix(buffer, fresh, key):
            half = buffer.shape[0] // 2
            merged = jnp.concatenate([buffer[half:], fresh], axis=0)
            if mesh is None:
                # permute_rows: Pallas row-DMA gather — XLA's serialized
                # row gather is ~2x slower at sweep-store shapes
                from vit_prisma_tpu.ops.shuffle import permute_rows
                return permute_rows(key, merged)
            # the row-DMA kernel is single-device; sharded buffers keep the
            # GSPMD-partitionable gather
            return jax.random.permutation(key, merged, axis=0)
        if mesh is None:
            self._mix = jax.jit(_mix, donate_argnums=(0,))
        else:
            rows = self._row_sharding()
            self._mix = jax.jit(_mix, donate_argnums=(0,),
                                out_shardings=rows)

        self.buffer = self._fill(self.buffer_tokens)
        self.key, sub = jax.random.split(self.key)
        if mesh is None:
            from vit_prisma_tpu.ops.shuffle import permute_rows
            self.buffer = permute_rows(sub, self.buffer)
        else:
            self.buffer = jax.device_put(
                jax.random.permutation(sub, self.buffer, axis=0),
                self._row_sharding())
        self.ptr = 0

    # -- harvesting ------------------------------------------------------
    def _row_sharding(self):
        """Token rows sharded over 'data'; a sweep buffer's layer axis
        additionally shards over 'model' (layer-parallel training)."""
        from jax.sharding import NamedSharding, PartitionSpec as P
        if self.cfg.sweep_layers:
            return NamedSharding(self.mesh, P("data", "model"))
        return NamedSharding(self.mesh, P("data"))

    def _build_harvest(self):
        import dataclasses
        cfg = self.cfg
        model = self.model
        hooks = self._hook_names
        stop_at = self._stop_at
        # the scan block loop trades runtime for compile time; the harvest
        # compiles once and runs thousands of times, so unroll it (measured
        # ~40% faster at ViT-L/14 sweep shapes)
        vcfg = dataclasses.replace(model.cfg, scan_blocks="never")

        def harvest(params, images):
            from vit_prisma_tpu.models.vit import vit_forward
            from vit_prisma_tpu.prisma.hooks import HookRuntime
            rt = HookRuntime(names_filter=hooks)
            vit_forward(params, vcfg, images, rt, stop_at_layer=stop_at)
            outs = []
            for name in hooks:
                act = rt.cache[name]  # [B, ctx, d] (or [B, ctx, heads, d_head])
                if cfg.hook_point_head_index is not None:
                    act = act[:, :, cfg.hook_point_head_index]
                if cfg.cls_token_only:
                    act = act[:, :1]
                elif cfg.use_patches_only:
                    act = act[:, 1:]
                outs.append(act.reshape(-1, act.shape[-1]))
            if len(outs) == 1:
                return outs[0]
            return jnp.stack(outs, axis=1)  # [tokens, 2, d] for transcoders

        if self.mesh is None:
            return jax.jit(harvest)
        from jax.sharding import NamedSharding, PartitionSpec as P
        from vit_prisma_tpu.parallel.mesh import vit_param_shardings
        return jax.jit(
            harvest,
            in_shardings=(vit_param_shardings(self.mesh, model.params),
                          NamedSharding(self.mesh, P("data"))),
            out_shardings=self._row_sharding())

    def get_activations(self, images) -> jax.Array:
        """One harvested batch of token rows (activations_store.py:251-296)."""
        return self._harvest(self.model.params, jnp.asarray(images))

    def _fill(self, n_tokens: int) -> jax.Array:
        """Harvest until ``n_tokens`` rows, pipelining the host->device
        image transfer one batch ahead of the harvest compute
        (``jax.device_put`` is async, so the next batch streams over the
        interconnect while the current cached forward runs)."""
        chunks, have = [], 0
        pending = None
        while have < n_tokens:
            images = pending if pending is not None \
                else jax.device_put(next(self.image_iter))
            pending = None
            if have + images.shape[0] * self.cfg.tokens_per_image < n_tokens:
                pending = jax.device_put(next(self.image_iter))
            chunk = self.get_activations(images)
            chunks.append(chunk)
            have += chunk.shape[0]
        return jnp.concatenate(chunks, axis=0)[:n_tokens]

    # -- buffer protocol -------------------------------------------------
    def next_batch(self) -> jax.Array:
        """[train_batch_size, d_in] token rows (activations_store.py:494-503)."""
        bs = self.cfg.train_batch_size
        if self.ptr + bs > self.buffer.shape[0] // 2:
            self._refill_half()
        out = jax.lax.dynamic_slice_in_dim(self.buffer, self.ptr, bs, axis=0)
        if self.mesh is not None:
            # the slice of the row-sharded buffer comes back unannotated;
            # re-pin rows to the 'data' axis for the dp train step
            out = jax.device_put(out, self._row_sharding())
        self.ptr += bs
        return out

    def _refill_half(self):
        """Keep the unserved half, harvest a fresh half, re-permute
        (mixing semantics of activations_store.py:445-492).  The old buffer
        is donated to the mix so the store never holds two full copies."""
        half = self.buffer.shape[0] - self.buffer.shape[0] // 2
        fresh = self._fill(self.buffer.shape[0] - half)
        self.key, sub = jax.random.split(self.key)
        self.buffer = self._mix(self.buffer, fresh, sub)
        self.ptr = 0

    def peek_tokens(self, n: int, layer_slot: Optional[int] = None) -> jax.Array:
        """First n rows (for geometric-median b_dec init,
        train_sae.py:245-276).  ``layer_slot`` selects a stacked slot for
        transcoder/sweep buffers."""
        rows = self.buffer[:n]
        if rows.ndim == 3:
            rows = rows[:, layer_slot if layer_slot is not None else 0, :]
        return rows

    # -- disk caching ----------------------------------------------------
    def generate_cached_activations(self, path: str, n_tokens: int,
                                    tokens_per_file: int = 1_000_000):
        """Write float16 .npy shards (activations_store.py:505-575)."""
        os.makedirs(path, exist_ok=True)
        written, shard = 0, 0
        while written < n_tokens:
            chunk = self._fill(min(tokens_per_file, n_tokens - written))
            np.save(os.path.join(path, f"{shard}.npy"),
                    np.asarray(chunk, dtype=np.float16))
            written += chunk.shape[0]
            shard += 1
        return shard


class CachedActivationsStore:
    """Shard-backed store (CacheVisionActivationStore,
    activations_store.py:21-152): loads ``{path}/{i}.npy`` shards instead of
    running the model, same buffer/permutation protocol."""

    def __init__(self, cfg: SAERunnerConfig, path: Optional[str] = None,
                 seed: Optional[int] = None):
        self.cfg = cfg
        self.path = path or cfg.cached_activations_path
        self.key = jax.random.PRNGKey(cfg.seed if seed is None else seed)
        self._shards = sorted(
            (f for f in os.listdir(self.path) if f.endswith(".npy")),
            key=lambda f: int(f.split(".")[0]))
        if not self._shards:
            raise FileNotFoundError(f"No .npy shards under {self.path}")
        self._next_shard = 0
        from vit_prisma_tpu.ops.shuffle import permute_rows
        self.buffer = self._load_tokens(cfg.tokens_per_buffer)
        self.key, sub = jax.random.split(self.key)
        self.buffer = permute_rows(sub, self.buffer)
        self.ptr = 0

    def _load_tokens(self, n: int) -> jax.Array:
        chunks, have = [], 0
        while have < n:
            shard = np.load(os.path.join(
                self.path, self._shards[self._next_shard]))
            self._next_shard = (self._next_shard + 1) % len(self._shards)
            chunks.append(jnp.asarray(shard, dtype=self.cfg.jax_dtype))
            have += shard.shape[0]
        return jnp.concatenate(chunks, axis=0)[:n]

    def next_batch(self) -> jax.Array:
        bs = self.cfg.train_batch_size
        if self.ptr + bs > self.buffer.shape[0] // 2:
            half = self.buffer.shape[0] // 2
            retained = self.buffer[half:]
            fresh = self._load_tokens(self.buffer.shape[0] - retained.shape[0])
            from vit_prisma_tpu.ops.shuffle import permute_rows
            self.key, sub = jax.random.split(self.key)
            self.buffer = permute_rows(
                sub, jnp.concatenate([retained, fresh], axis=0))
            self.ptr = 0
        out = jax.lax.dynamic_slice_in_dim(self.buffer, self.ptr, bs, axis=0)
        self.ptr += bs
        return out

    def peek_tokens(self, n: int) -> jax.Array:
        return self.buffer[:n]
