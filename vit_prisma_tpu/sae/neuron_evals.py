"""Neuron-basis and feature-list evaluation.

Counterparts of ``/root/reference/src/vit_prisma/sae/evals/``:
``eval_neuron_basis.py:24-307`` (top-image mining for *raw MLP neurons*
instead of SAE features), ``eval_feature_list.py:15-150`` (sample and
report specific feature ids), and ``model_eval.py:32-283``
(``SparsecoderEval`` — class-based eval supporting transcoders and a
linear-probe classification head).
"""

from __future__ import annotations

from typing import Dict, Iterable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from vit_prisma_tpu.models.vit import vit_forward
from vit_prisma_tpu.prisma.hooks import HookRuntime
from vit_prisma_tpu.sae.evals import EvalConfig, process_dataset
from vit_prisma_tpu.sae.sae import SparseAutoencoder


# ---------------------------------------------------------------------------
# Neuron-basis top images (eval_neuron_basis.py)
# ---------------------------------------------------------------------------

def make_neuron_activation_step(model, layer: int, neuron_ids: Sequence[int],
                                sublayer: str = "mlp.hook_post",
                                sampling_type: str = "avg"):
    """fn(params, images) -> [B, n_neurons] per-image scores for raw
    neurons at ``blocks.{layer}.{sublayer}``."""
    vcfg = model.cfg
    hook = f"blocks.{layer}.{sublayer}"
    nid = jnp.asarray(list(neuron_ids))

    def step(params, images):
        rt = HookRuntime(names_filter=hook)
        vit_forward(params, vcfg, images, rt, stop_at_layer=layer + 1)
        acts = rt.cache[hook][..., nid]          # [B, ctx, n]
        if sampling_type == "cls":
            return acts[:, 0, :]
        return acts.mean(1)

    return jax.jit(step)


def find_top_neuron_activations(data_iter: Iterable, model, layer: int,
                                neuron_ids: Sequence[int],
                                sublayer: str = "mlp.hook_post",
                                top_k: int = 16, max_samples: int = 50_000,
                                sampling_type: str = "avg"):
    """Running top-k images per neuron (eval_neuron_basis.py:24-307)."""
    step = make_neuron_activation_step(model, layer, neuron_ids, sublayer,
                                       sampling_type)
    best_vals = best_idx = None
    processed = 0
    for batch in data_iter:
        images, indices = (batch[0], batch[-1]) if len(batch) >= 2 else batch
        images = jnp.asarray(np.asarray(images))
        indices = np.asarray(indices)
        scores = np.asarray(step(model.params, images))
        if best_vals is None:
            best_vals = scores
            best_idx = np.broadcast_to(indices[:, None], scores.shape).copy()
        else:
            best_vals = np.concatenate([best_vals, scores], 0)
            best_idx = np.concatenate(
                [best_idx, np.broadcast_to(indices[:, None], scores.shape)], 0)
        if best_vals.shape[0] > 4 * top_k:
            order = np.argsort(-best_vals, axis=0)[:top_k]
            best_vals = np.take_along_axis(best_vals, order, 0)
            best_idx = np.take_along_axis(best_idx, order, 0)
        processed += images.shape[0]
        if processed >= max_samples:
            break
    order = np.argsort(-best_vals, axis=0)[:top_k]
    best_vals = np.take_along_axis(best_vals, order, 0)
    best_idx = np.take_along_axis(best_idx, order, 0)
    return {int(n): (best_vals[:, i], best_idx[:, i])
            for i, n in enumerate(neuron_ids)}


# ---------------------------------------------------------------------------
# Feature-list eval (eval_feature_list.py)
# ---------------------------------------------------------------------------

def eval_feature_list(data_iter_fn, model, sae: SparseAutoencoder,
                      feature_ids: Sequence[int], top_k: int = 16,
                      max_samples: int = 50_000,
                      sampling_type: str = "avg") -> Dict[int, Dict]:
    """Top images + activation stats for specific feature ids
    (eval_feature_list.py:15-150)."""
    from vit_prisma_tpu.sae.evals import find_top_activations
    tops = find_top_activations(data_iter_fn(), model, sae,
                                list(feature_ids), top_k=top_k,
                                max_samples=max_samples,
                                sampling_type=sampling_type)
    out = {}
    for fid, (vals, idx) in tops.items():
        out[int(fid)] = {
            "top_values": np.asarray(vals).tolist(),
            "top_image_indices": np.asarray(idx).tolist(),
            "max_activation": float(np.max(vals)) if len(vals) else 0.0,
            "mean_top_activation": float(np.mean(vals)) if len(vals) else 0.0,
        }
    return out


# ---------------------------------------------------------------------------
# SparsecoderEval (model_eval.py:32-283)
# ---------------------------------------------------------------------------

def load_dino_linear_classifier(path_or_state, dim: int = 1536,
                                num_labels: int = 1000) -> np.ndarray:
    """Load the FB DINO linear-probe weights (model_eval.py:32-60) into a
    [num_labels, dim] matrix usable as ``SparsecoderEval``'s classifier.

    Accepts a local ``.pth``/``.pt`` path or an already-loaded state dict
    (the reference downloads from dl.fbaipublicfiles.com; offline, point
    at a local copy).  The DINO probe key convention
    (``module.linear.weight``) is normalized away."""
    if isinstance(path_or_state, (str,)):
        import torch
        blob = torch.load(path_or_state, map_location="cpu",
                          weights_only=False)
        state = blob.get("state_dict", blob)
    else:
        state = path_or_state
    norm = {k.replace("module.", "").replace("linear.", ""): v
            for k, v in state.items()}
    W = np.asarray(norm["weight"], np.float32)
    assert W.shape == (num_labels, dim), W.shape
    return W


class SparsecoderEval:
    """Class-based re-run of the eval metrics, supporting transcoders and a
    linear-probe head: ``classifier`` [n_classes, d_emb] plays the role of
    the reference's DINO ``LinearClassifier``
    (:func:`load_dino_linear_classifier` loads the FB probe weights)."""

    def __init__(self, sae: SparseAutoencoder, model, classifier,
                 cfg: Optional[EvalConfig] = None):
        self.sae = sae
        self.model = model
        self.classifier = np.asarray(classifier).T \
            if np.asarray(classifier).shape[0] != model.cfg.n_classes else \
            np.asarray(classifier)
        # classifier rows must be [n_classes, d_emb] for the eval step
        self.cfg = cfg or EvalConfig()

    def explained_variance(self, images) -> float:
        """EV of the SAE reconstruction at its hook point on a batch
        (model_eval.py's per-batch EV, same formula as the trainer's)."""
        from vit_prisma_tpu.sae.sae import sae_forward
        rt = HookRuntime(names_filter=self.sae.cfg.hook_point)
        vit_forward(self.model.params, self.model.cfg,
                    jnp.asarray(np.asarray(images)), rt)
        acts = rt.cache[self.sae.cfg.hook_point]
        if self.sae.cfg.hook_point_head_index is not None:
            acts = acts[:, :, self.sae.cfg.hook_point_head_index]
        acts = acts.reshape(-1, acts.shape[-1])
        out = sae_forward(self.sae.params, self.sae.cfg, acts, training=False)
        resid = jnp.square(acts - out.sae_out).sum(-1)
        total = jnp.square(acts - acts.mean(0)).sum(-1)
        return float((1 - resid / total).mean())

    def run(self, data_iter_fn) -> Dict[str, float]:
        stats = process_dataset(
            self.model, self.sae,
            ((im, lb) for im, lb, *_ in data_iter_fn()),
            self.classifier, self.cfg)
        # explained variance on the first eval batch (the reference reports
        # the training-loop EV; this recomputes it on held-out data)
        first = next(iter(data_iter_fn()))
        ev = self.explained_variance(first[0])
        # report the reference's headline numbers
        return {
            "explained_variance": ev,
            "avg_l0": stats["avg_l0"],
            "avg_l0_cls": stats["avg_l0_cls"],
            "avg_cos_sim": stats["avg_cos_sim"],
            "ce_clean": stats["avg_loss"],
            "ce_recon": stats["avg_reconstruction_loss"],
            "ce_zero_abl": stats["avg_zero_abl_loss"],
            "pct_ce_recovered": 100.0 * stats["ce_recovered"],
            "pct_alive": 100.0 * stats["alive_fraction"],
        }
