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


def _index_iterator(n: int, batch_size: int, seed: int = 0) -> Iterator[np.ndarray]:
    """Infinite shuffled epoch stream of index batches — the single source
    of the store's image order (both the host and the device-resident
    dataset paths draw from it, so they serve identical streams)."""
    rng = np.random.default_rng(seed)
    if n < batch_size:
        raise ValueError(
            f"dataset has {n} images but store_batch_size={batch_size}; "
            "the store needs at least one full batch")
    while True:
        order = rng.permutation(n)
        for i in range(0, n - batch_size + 1, batch_size):
            yield order[i:i + batch_size]


def _image_iterator(dataset, batch_size: int, seed: int = 0) -> Iterator[np.ndarray]:
    """Infinite shuffled iterator over an indexable dataset of images
    (activations_store.py:226-236).  Accepts numpy arrays [N,C,H,W], lists,
    or torch-style datasets yielding (img, label) tuples."""
    for idx in _index_iterator(len(dataset), batch_size, seed):
        if isinstance(dataset, np.ndarray):
            yield dataset[idx]
        else:
            items = [dataset[int(j)] for j in idx]
            if isinstance(items[0], (tuple, list)):
                items = [it[0] for it in items]
            items = [np.asarray(it) for it in items]
            yield np.stack(items)


class _Resolved:
    """Future-compatible wrapper for an already-on-device image block (the
    device-resident dataset path has no host->device transfer to wait on)."""

    __slots__ = ("_value",)

    def __init__(self, value):
        self._value = value

    def result(self):
        return self._value


class VisionActivationsStore:
    """Streaming activation buffer over a HookedViT.

    ``mesh``: an optional ``jax.sharding.Mesh`` (axes 'data'/'model').
    With a mesh, the model parameters are placed tensor-parallel
    (parallel/mesh.py ``vit_param_shardings``), the harvest forward runs
    dp x tp, and the buffer lives row-sharded over the 'data' axis, so a
    user-facing sharded training run needs nothing beyond ``mesh=``."""

    _DEVICE_DATASET_AUTO_BYTES = 256 * 1024 * 1024

    def __init__(self, cfg: SAERunnerConfig, model, dataset,
                 eval_dataset=None, seed: Optional[int] = None,
                 mesh=None, device_norm=None, prefetch: bool = True,
                 device_dataset: Optional[bool] = None, augment=None):
        self.cfg = cfg
        self.model = model
        self.dataset = dataset
        self.eval_dataset = eval_dataset
        self.mesh = mesh
        self._slicers = {}
        self.key = jax.random.PRNGKey(cfg.seed if seed is None else seed)
        # Device-side data augmentation: ``augment(key, images) -> images``
        # runs INSIDE the jitted harvest, after the wire decode — fresh
        # randomness every store batch with zero extra host->device
        # traffic (the torch reference augments on the host through
        # torchvision transforms; with a device-resident dataset this
        # gives an unbounded augmented stream from a one-time upload).
        # The key stream is its own PRNG chain (one key per store batch,
        # consumed in harvest order), independent of the mix-key chain so
        # enabling augmentation does not shift the mixing permutations.
        self.augment = augment
        self.aug_key = jax.random.fold_in(
            jax.random.PRNGKey(cfg.seed if seed is None else seed), 0xA06)
        self._dev_images = None
        self._idx_iter = None
        self._dev_gather = None
        if hasattr(dataset, "__next__"):
            # a batch iterator (e.g. dataloaders.native.NativeBatchLoader —
            # the C++ prefetching worker pool) is consumed as-is; it must
            # yield [store_batch_size, C, H, W] arrays
            if device_dataset:
                raise ValueError(
                    "device_dataset requires an indexable ndarray dataset, "
                    "not a batch iterator")
            self.image_iter = dataset
        else:
            self.image_iter = _image_iterator(dataset, cfg.store_batch_size,
                                              seed=cfg.seed)
        if mesh is not None:
            from vit_prisma_tpu.parallel.mesh import vit_param_shardings
            model.params = jax.device_put(
                model.params, vit_param_shardings(mesh, model.params))

        # Host->device wire format for images — the store's only H2D
        # traffic, and the refill bottleneck on thin links (this env's
        # tunnel: ~33MiB/s + ~270ms fixed per transfer).  'auto': uint8
        # datasets ship as uint8 (4x less than f32; normalized on-device
        # with ``device_norm=(mean, std)``), bf16 models ship bf16 pixels
        # (2x less; identical activations — the embed GEMM computes in
        # bf16 either way).  ``prefetch``: double-buffered staging with a
        # pipeline depth of two — at each refill the fresh half's harvest
        # has already been dispatched, one chunk at a time BETWEEN the
        # cycle's train dispatches (so harvest compute and its per-dispatch
        # tunnel latency interleave with train compute instead of bursting
        # at the refill point), the NEXT refill's images have already
        # crossed host->device (transferred on a background thread during
        # the previous cycle), and the transfer for the refill after that
        # is kicked off.  Only the buffer mix remains on the refill's
        # critical path.
        self.device_norm = device_norm
        self.prefetch = prefetch
        self._pending_fresh = None   # pre-harvested rows (legacy/test path)
        self._staged = None          # device images for the refill after
        self._h_staged = None        # in-flight incremental harvest: staged
        self._h_images = None        # ... resolved device image block
        self._h_chunks = []          # ... harvest chunks dispatched so far
        self._warned_early_refill = False
        self._xfer_pool = None
        self._wire_dtype = self._pick_wire_dtype(cfg.store_wire_dtype)
        if self._wire_dtype == np.uint8 and self.device_norm is None:
            # uint8 rows are raw pixels: the scale+normalize the f32
            # transform would have applied moves on-device, using the
            # MODEL's preprocessing stats (CLIP/ImageNet/AutoImageProcessor)
            from vit_prisma_tpu.dataloaders.transforms import (
                get_model_transform_params)
            _, mean, std = get_model_transform_params(cfg.model_name)
            self.device_norm = (np.asarray(mean, np.float32),
                                np.asarray(std, np.float32))

        # Device-resident dataset: small ndarray datasets upload ONCE (in
        # the wire dtype) and every refill gathers its image block on
        # device — zero recurring host->device traffic.  On thin links the
        # recurring image transfer is the refill bottleneck (it shares the
        # link with program dispatches, so it can't hide behind compute);
        # production hosts benefit too for epoch-looped datasets.  Auto-on
        # for ndarrays <= 256MB wire bytes; force with device_dataset=.
        # The image stream is identical to the host path by construction
        # (_index_iterator is the shared source of order).
        if device_dataset is None:
            # wire bytes = element count * wire itemsize (no cast -> the
            # dataset's own itemsize, so a float32 ndarray is capped at
            # 256MB of float32, not 256M *elements*)
            wire_item = (dataset.dtype.itemsize if self._wire_dtype is None
                         else np.dtype(self._wire_dtype).itemsize) \
                if isinstance(dataset, np.ndarray) else 0
            device_dataset = (
                isinstance(dataset, np.ndarray)
                and dataset.nbytes * wire_item
                // dataset.dtype.itemsize <= self._DEVICE_DATASET_AUTO_BYTES)
        if device_dataset:
            if not isinstance(dataset, np.ndarray):
                raise ValueError(
                    "device_dataset requires an ndarray dataset "
                    f"(got {type(dataset).__name__})")
            wired = self._wire_cast(dataset)
            if mesh is not None:
                # replicated, so the dp-sharded harvest can gather locally
                from jax.sharding import NamedSharding, PartitionSpec as P
                self._dev_images = jax.device_put(
                    wired, NamedSharding(mesh, P()))
            else:
                self._dev_images = jax.device_put(wired)
            self._idx_iter = _index_iterator(len(dataset),
                                             cfg.store_batch_size,
                                             seed=cfg.seed)
            self._dev_gather = jax.jit(
                lambda im, idx: jnp.take(im, idx, axis=0))

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
        if self.prefetch:
            # the fresh half a refill consumes is the FLOOR half
            # (_refill_half retains ceil, harvests floor) — matching it
            # keeps the buffer shape stable for odd sizes.  Prime the
            # pipeline: refill #1's harvest dispatches incrementally
            # between the coming train dispatches, refill #2's images
            # start transferring in the background.
            n_fresh = self.buffer.shape[0] // 2
            self._begin_incremental_harvest(self._stage_images(n_fresh))
            self._staged = self._stage_images(n_fresh)

    # -- harvesting ------------------------------------------------------
    def _pick_wire_dtype(self, wire: str):
        if wire == "float32":
            return None
        if wire in ("bfloat16", "uint8"):
            if wire != "uint8" and self._dataset_is_uint8():
                # the /255 + normalize harvest branch keys on the uint8
                # wire; shipping raw 0-255 pixels as floats would feed the
                # model unscaled values with no error
                raise ValueError(
                    "uint8 (raw-pixel) datasets must use "
                    "store_wire_dtype='uint8' or 'auto', not float wires")
            import ml_dtypes
            return np.uint8 if wire == "uint8" else ml_dtypes.bfloat16
        # 'auto'
        probe = self.dataset
        if hasattr(probe, "__next__"):
            # batch iterator (NativeBatchLoader): it declares its dtype
            if getattr(probe, "dtype", None) == np.uint8:
                return np.uint8
            probe = None
        elif not isinstance(probe, np.ndarray) and len(probe):
            probe = probe[0]
            if isinstance(probe, (tuple, list)):
                probe = probe[0]
            probe = np.asarray(probe)
        if getattr(probe, "dtype", None) == np.uint8:
            return np.uint8
        leaves = jax.tree.leaves(self.model.params) if self.model is not None \
            else []
        if leaves and leaves[0].dtype == jnp.bfloat16:
            import ml_dtypes
            return ml_dtypes.bfloat16
        return None

    def _dataset_is_uint8(self) -> bool:
        probe = self.dataset
        if hasattr(probe, "__next__"):
            return getattr(probe, "dtype", None) == np.uint8
        if not isinstance(probe, np.ndarray) and len(probe):
            probe = probe[0]
            if isinstance(probe, (tuple, list)):
                probe = probe[0]
            probe = np.asarray(probe)
        return getattr(probe, "dtype", None) == np.uint8

    def _wire_cast(self, batch: np.ndarray) -> np.ndarray:
        if self._wire_dtype is None or batch.dtype == self._wire_dtype:
            return batch
        if self._wire_dtype == np.uint8:
            # float->uint8 would truncate/wrap normalized values into
            # garbage; the uint8 wire is for datasets of raw pixel bytes
            raise ValueError(
                "store_wire_dtype='uint8' requires a uint8 dataset "
                f"(got {batch.dtype}); use 'bfloat16'/'float32' for "
                "preprocessed float images")
        return batch.astype(self._wire_dtype)
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
        # ~40% faster at ViT-L/14 sweep shapes).  The fused attention
        # kernel stays on under a mesh — its custom_partitioning
        # (ops/attention.py) splits the mix over batch/head shards.
        vcfg = dataclasses.replace(model.cfg, scan_blocks="never")

        device_norm = self.device_norm
        augment = self.augment

        def harvest(params, images, aug_key=None):
            from vit_prisma_tpu.models.vit import vit_forward
            from vit_prisma_tpu.prisma.hooks import HookRuntime
            if images.dtype == jnp.uint8:
                # wire-format uint8: scale + normalize on device (the host
                # transform stops at the raw pixels)
                x = images.astype(jnp.float32) / 255.0
                if device_norm is not None:
                    shape = (1, -1) + (1,) * (images.ndim - 2)
                    x = (x - jnp.asarray(device_norm[0]).reshape(shape)) \
                        / jnp.asarray(device_norm[1]).reshape(shape)
                images = x
            if augment is not None:
                images = augment(aug_key, images)
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

        # the raw (unjitted) body is reusable inside larger programs —
        # the fused cycle (train.py make_fused_cycle) inlines it
        self.harvest_body = harvest
        if self.mesh is None:
            return jax.jit(harvest)
        from jax.sharding import NamedSharding, PartitionSpec as P
        from vit_prisma_tpu.parallel.mesh import vit_param_shardings
        in_sh = [vit_param_shardings(self.mesh, model.params),
                 NamedSharding(self.mesh, P("data"))]
        if self.augment is not None:
            in_sh.append(NamedSharding(self.mesh, P()))  # replicated key
        return jax.jit(
            harvest,
            in_shardings=tuple(in_sh),
            out_shardings=self._row_sharding())

    def _next_aug_key(self) -> jax.Array:
        """Consume one key from the augmentation stream (one per store
        batch, in harvest order — the fused cycle consumes the same
        stream via :meth:`advance_aug_keys`)."""
        self.aug_key, sub = jax.random.split(self.aug_key)
        return sub

    def advance_aug_keys(self, n: int) -> jax.Array:
        """``n`` augmentation keys for one fused cycle's harvest batches
        (identical stream to the stepwise path's per-chunk keys)."""
        return jnp.stack([self._next_aug_key() for _ in range(n)])

    def get_activations(self, images) -> jax.Array:
        """One harvested batch of token rows (activations_store.py:251-296)."""
        images = jnp.asarray(images)
        if self.mesh is not None:
            # the sharded harvest declares images dp-sharded; chunks from
            # the (replicated) device-resident dataset must be re-pinned
            from jax.sharding import NamedSharding, PartitionSpec as P
            images = jax.device_put(images,
                                    NamedSharding(self.mesh, P("data")))
        if self.augment is not None:
            return self._harvest(self.model.params, images,
                                 self._next_aug_key())
        return self._harvest(self.model.params, images)

    def _img_slice(self, images: jax.Array, start: int, n: int) -> jax.Array:
        """Device-side image-batch slice with a runtime start (one compiled
        program — see :meth:`_slice_rows` for why)."""
        fn = self._slicers.get(("img", n))
        if fn is None:
            fn = jax.jit(lambda im, p: jax.lax.dynamic_slice_in_dim(
                im, p, n, axis=0))
            self._slicers[("img", n)] = fn
        return fn(images, np.int32(start))

    def _stage_images(self, n_tokens: int):
        """Assemble the host image block for ``n_tokens`` rows and dispatch
        its host->device transfer on a background thread.

        All images cross in ONE ``device_put`` in the wire dtype:
        per-transfer fixed latency dominates thin links (measured here:
        ~270ms fixed + ~15ms/MB), so one large transfer beats
        per-store-batch transfers even before the dtype saving.  The
        transfer thread releases the GIL during the copy, so train-step
        dispatches proceed while the bytes move; the image iterator is
        consumed HERE (main thread) so row order stays deterministic."""
        sb = self.cfg.store_batch_size
        n_batches = -(-n_tokens // self.tokens_per_store_batch)
        if self._dev_images is not None:
            # device-resident path: the "transfer" is an on-device gather
            # of the block's rows (only the tiny index vector crosses).
            # The harvest stays chunked at store_batch_size so it shares
            # the host path's single compiled shape (and bit-exact rows).
            idx = np.concatenate([next(self._idx_iter)
                                  for _ in range(n_batches)])
            block = self._dev_gather(self._dev_images,
                                     jnp.asarray(idx, jnp.int32))
            return (_Resolved(block), n_batches, n_tokens)
        host = [self._wire_cast(next(self.image_iter))
                for _ in range(n_batches)]
        for b in host:
            if b.shape[0] != sb:
                # the on-device slicing assumes exact batch sizes; a
                # clamped dynamic_slice would silently duplicate tail rows
                raise ValueError(
                    f"image iterator yielded a batch of {b.shape[0]} rows; "
                    f"the store requires exactly store_batch_size={sb}")
        arr = host[0] if n_batches == 1 else np.concatenate(host, axis=0)
        if self._xfer_pool is None:
            from concurrent.futures import ThreadPoolExecutor
            self._xfer_pool = ThreadPoolExecutor(
                max_workers=1, thread_name_prefix="store-h2d")
        fut = self._xfer_pool.submit(jax.device_put, arr)
        return (fut, n_batches, n_tokens)

    def _harvest_staged(self, staged) -> jax.Array:
        """Dispatch the harvest forwards over a staged image block (the
        per-harvest slicing happens on device)."""
        fut, n_batches, n_tokens = staged
        images = fut.result()
        chunks = [self.get_activations(self._harvest_chunk(images, i,
                                                           n_batches))
                  for i in range(n_batches)]
        if n_batches == 1:
            return chunks[0][:n_tokens]
        return jnp.concatenate(chunks, axis=0)[:n_tokens]

    def _harvest_chunk(self, images: jax.Array, i: int,
                       n_batches: int) -> jax.Array:
        """Chunk ``i`` of a staged image block (chunk = block/n_batches;
        a single-chunk block is used whole, no slice dispatch)."""
        if n_batches == 1:
            return images
        per = images.shape[0] // n_batches
        return self._img_slice(images, i * per, per)

    def _fill(self, n_tokens: int) -> jax.Array:
        """Harvest until ``n_tokens`` rows (synchronous stage + harvest)."""
        return self._harvest_staged(self._stage_images(n_tokens))

    # -- incremental harvest (interleaved with train dispatches) ---------
    def _begin_incremental_harvest(self, staged):
        """Adopt a staged image block whose harvest will be dispatched one
        chunk at a time by :meth:`_advance_harvest` (called from
        ``next_batch``/``next_batches``), finishing by the next refill."""
        self._h_staged = staged
        self._h_images = None
        self._h_chunks = []

    def _advance_harvest(self, target: int):
        """Dispatch harvest chunks until ``target`` are in flight.  Row
        content is independent of WHEN chunks dispatch — the image block
        was already assembled in iterator order at stage time."""
        if self._h_staged is None:
            return
        fut, n_batches, _ = self._h_staged
        if self._h_images is None:
            self._h_images = fut.result()
        while len(self._h_chunks) < min(target, n_batches):
            i = len(self._h_chunks)
            self._h_chunks.append(self.get_activations(
                self._harvest_chunk(self._h_images, i, n_batches)))

    def _finish_harvest(self) -> Optional[jax.Array]:
        """Dispatch any chunks the train loop didn't pace through (e.g. a
        short cycle) and return the assembled fresh rows."""
        if self._h_staged is None:
            return None
        _, n_batches, n_tokens = self._h_staged
        self._advance_harvest(n_batches)
        chunks = self._h_chunks
        self._h_staged = self._h_images = None
        self._h_chunks = []
        if n_batches == 1:
            return chunks[0][:n_tokens]
        return jnp.concatenate(chunks, axis=0)[:n_tokens]

    def _pace_harvest(self, rows_after: int):
        """Keep the in-flight harvest proportional to buffer consumption:
        after serving ``rows_after`` of the half-buffer, the same fraction
        of harvest chunks must have been dispatched."""
        if self._h_staged is None:
            return
        _, n_batches, _ = self._h_staged
        half = self.buffer.shape[0] // 2
        self._advance_harvest(-(-n_batches * min(rows_after, half) // half))

    # -- buffer protocol -------------------------------------------------
    def _slice_rows(self, n: int) -> jax.Array:
        """``buffer[ptr:ptr+n]`` through ONE jitted program with the pointer
        as a runtime operand.  An eager ``dynamic_slice`` with a Python-int
        start would constant-fold the pointer and compile a fresh program
        per pointer value (~350ms each over the remote-compile tunnel —
        measured to dominate the sweep loop)."""
        fn = self._slicers.get(n)
        if fn is None:
            fn = jax.jit(lambda buf, p: jax.lax.dynamic_slice_in_dim(
                buf, p, n, axis=0))
            self._slicers[n] = fn
        return fn(self.buffer, np.int32(self.ptr))

    def next_batch(self) -> jax.Array:
        """[train_batch_size, d_in] token rows (activations_store.py:494-503)."""
        bs = self.cfg.train_batch_size
        assert bs <= self.buffer.shape[0] // 2, (
            f"train_batch_size({bs}) must fit in half the buffer "
            f"({self.buffer.shape[0] // 2} tokens) — rows past the half "
            "would be re-served after the next mix")
        if self.ptr + bs > self.buffer.shape[0] // 2:
            self._refill_half()
        out = self._slice_rows(bs)
        if self.mesh is not None:
            # the slice of the row-sharded buffer comes back unannotated;
            # re-pin rows to the 'data' axis for the dp train step
            out = jax.device_put(out, self._row_sharding())
        self.ptr += bs
        self._pace_harvest(self.ptr)
        return out

    def next_batches(self, k: int) -> jax.Array:
        """[k, train_batch_size, ...]: k consecutive training batches in ONE
        slice/dispatch — pairs with the fused multi-step train programs
        (``sae_train_multistep``).  Row content is identical to k
        ``next_batch()`` calls when ``k`` divides the number of batches
        served per half-buffer (otherwise the refill points differ)."""
        bs = self.cfg.train_batch_size
        half = self.buffer.shape[0] // 2
        assert k * bs <= half, (
            f"steps_per_dispatch({k}) x train_batch_size({bs}) must fit in "
            f"half the buffer ({half} tokens)")
        if self.ptr + k * bs > half:
            if self.ptr + bs <= half and not self._warned_early_refill:
                # a single-step trainer would have served more rows from
                # this half before refilling — the row stream diverges
                # (still valid mixing semantics, just a different stream)
                import warnings
                warnings.warn(
                    f"next_batches({k}): refilling with "
                    f"{(half - self.ptr) // bs} batch(es) of the half-buffer"
                    " unserved because k doesn't divide the half's batch "
                    "count; the row stream differs from k x next_batch()",
                    stacklevel=2)
                self._warned_early_refill = True
            self._refill_half()
        out = self._slice_rows(k * bs)
        out = out.reshape((k, bs) + self.buffer.shape[1:])
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec
            spec = self._row_sharding().spec
            out = jax.device_put(out, NamedSharding(
                self.mesh, PartitionSpec(None, *spec)))
        self.ptr += k * bs
        self._pace_harvest(self.ptr)
        return out

    def _refill_half(self):
        """Keep the unserved half, harvest a fresh half, re-permute
        (mixing semantics of activations_store.py:445-492).  The old buffer
        is donated to the mix so the store never holds two full copies.

        With ``prefetch`` the fresh half's harvest chunks were already
        dispatched, interleaved between this cycle's train dispatches
        (``_pace_harvest``), from images that crossed host->device a full
        cycle earlier still — only the chunk concat + mix remain on the
        critical path.  Before returning, the next cycle's incremental
        harvest is armed from the block staged last cycle and the transfer
        for the cycle after is kicked off."""
        half = self.buffer.shape[0] - self.buffer.shape[0] // 2
        n_fresh = self.buffer.shape[0] - half
        fresh = self._finish_harvest()
        if fresh is None:
            if self._pending_fresh is not None:
                fresh = self._pending_fresh
                self._pending_fresh = None
            else:
                fresh = self._fill(n_fresh)
        self.key, sub = jax.random.split(self.key)
        self.buffer = self._mix(self.buffer, fresh, sub)
        self.ptr = 0
        if self.prefetch:
            if self._staged is None:      # pipeline not primed (prefetch
                self._staged = self._stage_images(n_fresh)  # toggled on)
            self._begin_incremental_harvest(self._staged)
            self._staged = self._stage_images(n_fresh)

    # -- fused cycle (harvest + mix + K train steps in ONE program) -------
    @property
    def fused_cycle_available(self) -> bool:
        """The fused steady-state cycle needs a device-resident dataset
        (the cycle program gathers its own images), a single-device store
        (the mix kernel is single-device), and ``prefetch=False`` (the
        priming would shift the image stream the cycle expects)."""
        return (self._dev_images is not None and self.mesh is None
                and not self.prefetch)

    def next_cycle_indices(self) -> np.ndarray:
        """Image indices for one fresh half-buffer, drawn from the SAME
        iterator the normal refill path uses (identical image stream)."""
        n_fresh = self.buffer.shape[0] // 2
        n_batches = -(-n_fresh // self.tokens_per_store_batch)
        return np.stack([next(self._idx_iter) for _ in range(n_batches)])

    def advance_key(self) -> jax.Array:
        """Consume one mix key from the store's key stream (the fused
        cycle applies the permutation in-program; the stream must match
        the host refill path's)."""
        self.key, sub = jax.random.split(self.key)
        return sub

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
        self._slicers = {}
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

    def _refill_half(self):
        half = self.buffer.shape[0] // 2
        retained = self.buffer[half:]
        fresh = self._load_tokens(self.buffer.shape[0] - retained.shape[0])
        from vit_prisma_tpu.ops.shuffle import permute_rows
        self.key, sub = jax.random.split(self.key)
        self.buffer = permute_rows(
            sub, jnp.concatenate([retained, fresh], axis=0))
        self.ptr = 0

    _slice_rows = VisionActivationsStore._slice_rows

    def next_batch(self) -> jax.Array:
        bs = self.cfg.train_batch_size
        if self.ptr + bs > self.buffer.shape[0] // 2:
            self._refill_half()
        out = self._slice_rows(bs)
        self.ptr += bs
        return out

    def next_batches(self, k: int) -> jax.Array:
        """[k, train_batch_size, d]: k batches in one slice (see
        ``VisionActivationsStore.next_batches``)."""
        bs = self.cfg.train_batch_size
        half = self.buffer.shape[0] // 2
        assert k * bs <= half
        if self.ptr + k * bs > half:
            self._refill_half()
        out = self._slice_rows(k * bs)
        self.ptr += k * bs
        return out.reshape((k, bs) + self.buffer.shape[1:])

    def peek_tokens(self, n: int) -> jax.Array:
        return self.buffer[:n]
