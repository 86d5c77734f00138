"""LR schedules as pure step->multiplier functions, matching
``/root/reference/src/vit_prisma/sae/training/get_scheduler.py:17-92``
(constant / constantwithwarmup / linearwarmupdecay / cosineannealing /
cosineannealingwarmup / cosineannealingwarmrestarts).

Returned callables are optax-compatible: ``optax.adam(lambda step: lr *
schedule(step))``.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax.numpy as jnp


def get_schedule(scheduler_name: Optional[str], *, warm_up_steps: int = 0,
                 training_steps: Optional[int] = None, lr_end: float = 0.0,
                 num_cycles: int = 1) -> Callable:
    """Step -> LR multiplier in [0, 1] (traced-value safe)."""
    name = (scheduler_name or "constant").lower()

    if name == "constant":
        return lambda step: jnp.ones_like(step, dtype=jnp.float32)

    if name == "constantwithwarmup":
        w = max(warm_up_steps, 1)
        return lambda step: jnp.minimum(1.0, (step + 1) / w)

    if name == "linearwarmupdecay":
        assert training_steps is not None, "training_steps must be provided"
        w, T = max(warm_up_steps, 1), training_steps
        return lambda step: jnp.where(
            step < w, (step + 1) / w, (T - step) / max(T - w, 1))

    if name == "cosineannealing":
        assert training_steps is not None, "training_steps must be provided"
        T = training_steps
        # torch CosineAnnealingLR: eta_min + (1-eta_min) * (1+cos(pi*t/T))/2
        return lambda step: lr_end + 0.5 * (1 - lr_end) * (
            1 + jnp.cos(jnp.pi * step / T))

    if name == "cosineannealingwarmup":
        assert training_steps is not None, "training_steps must be provided"
        w, T = max(warm_up_steps, 1), training_steps
        def sched(step):
            progress = (step - w) / max(T - w, 1)
            cos_val = lr_end + 0.5 * (1 - lr_end) * (1 + jnp.cos(jnp.pi * progress))
            return jnp.where(step < w, (step + 1) / w, cos_val)
        return sched

    if name == "cosineannealingwarmrestarts":
        assert training_steps is not None, "training_steps must be provided"
        T0 = max(training_steps // max(num_cycles, 1), 1)
        return lambda step: lr_end + 0.5 * (1 - lr_end) * (
            1 + jnp.cos(jnp.pi * (step % T0) / T0))

    raise ValueError(f"Unsupported scheduler: {scheduler_name}")
