"""Geometric median via Weiszfeld iterations, jitted.

Counterpart of
``/root/reference/src/vit_prisma/sae/training/geometric_median.py:23-86``;
fixed iteration count inside ``lax.fori_loop`` (host-side ftol early-exit
trades for a fully-compiled loop — maxiter=100 matches the reference's
b_dec init call, sae.py:196-214)."""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp


class GeometricMedianResult(NamedTuple):
    median: jax.Array
    new_weights: jax.Array


def compute_geometric_median(points: jax.Array,
                             weights: Optional[jax.Array] = None,
                             eps: float = 1e-6, maxiter: int = 100
                             ) -> GeometricMedianResult:
    """points [n, d] -> median [d]."""
    points = points.astype(jnp.float32)
    if weights is None:
        weights = jnp.ones((points.shape[0],), jnp.float32)

    def weighted_average(w):
        return (points * w[:, None]).sum(0) / w.sum()

    def body(_, carry):
        median, _ = carry
        norms = jnp.linalg.norm(points - median[None, :], axis=1)
        new_w = weights / jnp.clip(norms, min=eps)
        return weighted_average(new_w), new_w

    median0 = weighted_average(weights)
    median, new_w = jax.lax.fori_loop(0, maxiter, body, (median0, weights))
    return GeometricMedianResult(median=median, new_weights=new_w)
