"""Profiling and device-time measurement utilities.

The reference's only profiling hooks are a ``line_profiler`` decorator and a
store-timing script (SURVEY.md §5.1); on TPU, ``jax.profiler`` traces and
compiled-function device timing are first-class instead.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Optional

import jax
import jax.numpy as jnp


@contextlib.contextmanager
def profile_trace(logdir: str = "/tmp/jax_trace",
                  create_perfetto_link: bool = False):
    """Capture a jax.profiler trace (view in TensorBoard / Perfetto)::

        with profile_trace("/tmp/trace"):
            model(x)
    """
    jax.profiler.start_trace(logdir,
                             create_perfetto_link=create_perfetto_link)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


def device_time(fn: Callable, *args, iters: int = 20, warmup: int = 2,
                **kwargs) -> float:
    """Average wall seconds per call of a (jitted) ``fn``.

    Measurement is robust to unreliable ``block_until_ready`` on tunneled
    backends: the loop is timed as a unit and completion is forced by
    fetching a scalar reduction of the last result.
    """
    def _force(out):
        leaf = jax.tree_util.tree_leaves(out)[0]
        return float(jnp.sum(leaf.astype(jnp.float32)))

    for _ in range(warmup):
        out = fn(*args, **kwargs)
    _force(out)
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args, **kwargs)
    _force(out)
    return (time.time() - t0) / iters


def flops_per_second(fn: Callable, flops_per_call: float, *args,
                     iters: int = 20, **kwargs) -> float:
    return flops_per_call / device_time(fn, *args, iters=iters, **kwargs)


def memory_stats() -> Optional[dict]:
    """Live device memory stats where the backend exposes them."""
    dev = jax.devices()[0]
    stats = getattr(dev, "memory_stats", None)
    return stats() if callable(stats) else None
