"""SAE evaluation suite.

Counterpart of ``/root/reference/src/vit_prisma/sae/evals/evals.py``:
``process_dataset`` (L0 per token/CLS/image, cosine similarity, feature
log-frequencies, substitution losses, :449-549), ``get_substitution_loss``
(clean vs SAE-substituted vs zero-ablated CE -> CE-recovered score,
:320-391), ``zero_ablate_hook`` (:436), sparsity-interval sampling (:552),
``compute_feature_activations``/``find_top_activations`` top-image mining
(:803-917), ``get_heatmap``/``image_patch_heatmap`` (:637-676), and the
``evaluate()`` pipeline (:920-1008).

TPU-native: each dataset batch is processed by ONE jitted program that runs
the clean, SAE-substituted, and zero-ablated forwards together (XLA CSEs
the shared prefix up to the hook layer) and emits every statistic at once;
top-k image mining keeps a running on-device top-k merge.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass
from typing import Any, Dict, Iterable, List, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from vit_prisma_tpu.models.vit import vit_forward
from vit_prisma_tpu.prisma.hooks import HookRuntime
from vit_prisma_tpu.sae.sae import SparseAutoencoder, sae_forward


# ---------------------------------------------------------------------------
# Hooks (evals.py:364-387, 436)
# ---------------------------------------------------------------------------

def zero_ablate_hook(value, hook):
    return jnp.zeros_like(value)


def make_replacement_hook(sae: SparseAutoencoder):
    """Standard/head replacement hook factory (sae.py:245-273).  NOTE: for
    jit-cache friendliness prefer the fused eval step below."""
    scfg = sae.cfg
    params = sae.params
    head = scfg.hook_point_head_index

    def replacement(value, hook):
        if head is None:
            recon = sae_forward(params, scfg, value, training=False).sae_out
            return recon.astype(value.dtype)
        new = sae_forward(params, scfg, value[:, :, head],
                          training=False).sae_out
        return value.at[:, :, head].set(new.astype(value.dtype))

    return replacement


# ---------------------------------------------------------------------------
# Eval config
# ---------------------------------------------------------------------------

@dataclass
class EvalConfig:
    batch_size: int = 32
    eval_max: int = 2048              # max samples for stats
    samples_per_bin: int = 2          # features sampled per sparsity bin
    max_images_per_feature: int = 16  # top-k images per feature
    sampling_type: str = "avg"        # 'avg' | 'cls'
    top_image_max_samples: int = 50_000
    sae_path: str = "."
    verbose: bool = False


class BatchStats(NamedTuple):
    loss: jax.Array
    recons_loss: jax.Array
    zero_abl_loss: jax.Array
    l0_patches: jax.Array          # [B] mean over non-CLS tokens
    l0_cls: jax.Array              # [B]
    l0_image: jax.Array            # [B] sum over all tokens
    cos_sim: jax.Array             # scalar
    act_counts: jax.Array          # [d_sae] (#tokens where feature fired)
    n_tokens: jax.Array            # scalar


def _ce(logits, labels):
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.take_along_axis(logp, labels[:, None], axis=-1).mean()


def make_eval_step(model, sae: SparseAutoencoder):
    """Compile the per-batch eval program.

    fn(vit_params, sae_params, images, labels, class_embeddings) ->
    BatchStats.  ``class_embeddings`` [n_classes, d] are zero-shot text
    embeddings (CLIP) or a linear-probe matrix; logits = emb @ E^T
    (evals.py:396-397)."""
    vcfg = model.cfg
    scfg = sae.cfg
    hook = scfg.hook_point
    head = scfg.hook_point_head_index
    # Token-subset SAEs (cls_token_only / use_patches_only): the SAE only
    # defines a reconstruction for the rows it was trained on
    # (model_eval.py:143-147 slices the same rows for its stats), so the
    # substituted forward writes back ONLY those rows and the zero-ablation
    # counterfactual zeroes the same rows — the CE-recovered denominator
    # then measures exactly the information the SAE is responsible for.
    # (The reference's get_substitution_loss, evals.py:364-377, replaces
    # the full activation even for CLS-only SAEs — running the SAE
    # out-of-distribution on rows it never saw; deliberate deviation.)
    cls_only = bool(getattr(scfg, "cls_token_only", False))
    patches_only = bool(getattr(scfg, "use_patches_only", False))

    def _rows(a):
        if cls_only:
            return a[:, :1]
        if patches_only:
            return a[:, 1:]
        return a

    def _set_rows(value, new):
        new = new.astype(value.dtype)
        if cls_only:
            return value.at[:, :1].set(new)
        if patches_only:
            return value.at[:, 1:].set(new)
        return new

    def step(params, sae_params, images, labels, class_emb):
        # clean forward with cache of the hook
        rt = HookRuntime(names_filter=hook)
        clean_emb = vit_forward(params, vcfg, images, rt)
        act = rt.cache[hook]
        act_for_sae = _rows(act[:, :, head] if head is not None else act)

        out = sae_forward(sae_params, scfg, act_for_sae, training=False)
        feats = out.feature_acts       # [B, rows, d_sae]
        sae_out = out.sae_out

        # substituted + zero-ablated forwards
        def subst(value, h):
            if head is None:
                return _set_rows(value, sae_out)
            return value.at[:, :, head].set(
                _set_rows(value[:, :, head], sae_out))

        def zero(value, h):
            if not (cls_only or patches_only):
                return zero_ablate_hook(value, h)
            return _set_rows(value, jnp.zeros_like(_rows(value)))

        rt_sub = HookRuntime(names_filter=(), fwd_hooks=((hook, subst),),
                             record=False)
        recons_emb = vit_forward(params, vcfg, images, rt_sub)
        rt_zero = HookRuntime(names_filter=(),
                              fwd_hooks=((hook, zero),),
                              record=False)
        zero_emb = vit_forward(params, vcfg, images, rt_zero)

        logits = clean_emb @ class_emb.T
        loss = _ce(logits, labels)
        recons_loss = _ce(recons_emb @ class_emb.T, labels)
        zero_loss = _ce(zero_emb @ class_emb.T, labels)

        fired = feats > 0
        l0_tok = fired.astype(jnp.float32).sum(-1)          # [B, rows]
        # The CLS/patches split only exists for models with a CLS token at
        # position 0; for DINO-style/V-JEPA models (use_cls_token=False)
        # every token is a patch and "l0_cls" degenerates to the patch mean
        # rather than silently mislabeling token 0 as CLS.
        if cls_only:
            l0_cls = l0_tok[:, 0]
            l0_patches = jnp.zeros_like(l0_cls)
        elif patches_only:
            l0_patches = l0_tok.mean(-1)
            l0_cls = jnp.zeros_like(l0_patches)
        elif vcfg.use_cls_token:
            l0_patches = l0_tok[:, 1:].mean(-1)
            l0_cls = l0_tok[:, 0]
        else:
            l0_patches = l0_tok.mean(-1)
            l0_cls = l0_tok.mean(-1)
        stats = BatchStats(
            loss=loss, recons_loss=recons_loss, zero_abl_loss=zero_loss,
            l0_patches=l0_patches,
            l0_cls=l0_cls,
            l0_image=l0_tok.sum(-1),
            cos_sim=_token_cos_sim(act_for_sae, sae_out),
            act_counts=(jnp.abs(feats) > 0).reshape(-1, feats.shape[-1])
                .astype(jnp.float32).sum(0),
            n_tokens=jnp.asarray(feats.shape[0] * feats.shape[1], jnp.float32),
        )
        return stats

    return jax.jit(step)


def make_sweep_eval_step(model, cfg, layers):
    """Compile the all-layer sweep eval program (the sweep-trainer form of
    :func:`make_eval_step`; reference workflow: one ``evaluate()`` per
    trained layer, evals.py:920-1008 × train_sae.py:414-535).

    fn(vit_params, sweep_params, images, labels, class_embeddings) ->
    BatchStats with a leading ``[L]`` layer axis.  ``sweep_params`` are the
    sweep trainer's stacked ``[L, ...]`` SAE params.

    TPU-native cost model: ONE clean forward caches every sweep layer's
    activations, the L SAE forwards run as a single vmapped (batched GEMM)
    program, and for the standard ``hook_resid_post`` sweep each layer's
    substituted + zero-ablated forwards share the clean prefix via
    ``start_at_layer`` (recon and zero ride one 2B-batch suffix).  Total
    block cost ≈ L + Σ(L-l-1)·2 instead of the reference's 2L·L full
    forwards."""
    vcfg = model.cfg
    layers = tuple(int(l) for l in layers)
    scfg = cfg.replace(sweep_layers=None, hook_point_layer=layers[0])
    head = cfg.hook_point_head_index
    hook_names = tuple(f"blocks.{l}.{cfg.layer_subtype}" for l in layers)
    # prefix sharing is exact only where the hook value IS the residual
    # stream entering the next block; other subtypes (or a head slice)
    # fall back to a full 2B forward with an editing hook per layer.
    resid_fast = (cfg.layer_subtype == "hook_resid_post" and head is None)

    def step(params, sweep_params, images, labels, class_emb):
        rt = HookRuntime(names_filter=hook_names)
        clean_emb = vit_forward(params, vcfg, images, rt)
        acts = jnp.stack([rt.cache[h] for h in hook_names])  # [L, B, ...]
        acts_for_sae = acts[:, :, :, head] if head is not None else acts

        out = jax.vmap(
            lambda p, a: sae_forward(p, scfg, a, training=False)
        )(sweep_params, acts_for_sae)
        feats = out.feature_acts          # [L, B, ctx, d_sae]
        sae_out = out.sae_out             # [L, B, ctx, d_in]

        clean_loss = _ce(clean_emb @ class_emb.T, labels)
        B = images.shape[0]
        recons_losses, zero_losses = [], []
        for i, l in enumerate(layers):
            if resid_fast:
                sub = sae_out[i].astype(acts.dtype)
                both = jnp.concatenate([sub, jnp.zeros_like(sub)], axis=0)
                emb = vit_forward(params, vcfg, both, start_at_layer=l + 1)
            else:
                def edit(value, hook, i=i):
                    if head is None:
                        rec = sae_out[i].astype(value.dtype)
                        return jnp.concatenate(
                            [rec, jnp.zeros_like(rec)], axis=0)
                    rec = value[:B].at[:, :, head].set(
                        sae_out[i].astype(value.dtype))
                    # zero_ablate_hook zeros the WHOLE hook value, head
                    # slice or not (evals.py:436) — match make_eval_step
                    zer = jnp.zeros_like(value[B:])
                    return jnp.concatenate([rec, zer], axis=0)

                rt_e = HookRuntime(names_filter=(),
                                   fwd_hooks=((hook_names[i], edit),),
                                   record=False)
                emb = vit_forward(
                    params, vcfg,
                    jnp.concatenate([images, images], axis=0), rt_e)
            logits = emb @ class_emb.T
            recons_losses.append(_ce(logits[:B], labels))
            zero_losses.append(_ce(logits[B:], labels))

        fired = feats > 0
        l0_tok = fired.astype(jnp.float32).sum(-1)          # [L, B, ctx]
        if vcfg.use_cls_token:
            l0_patches = l0_tok[:, :, 1:].mean(-1)
            l0_cls = l0_tok[:, :, 0]
        else:
            l0_patches = l0_tok.mean(-1)
            l0_cls = l0_tok.mean(-1)
        L = len(layers)
        n_tok = feats.shape[1] * feats.shape[2]
        return BatchStats(
            loss=jnp.full((L,), clean_loss),
            recons_loss=jnp.stack(recons_losses),
            zero_abl_loss=jnp.stack(zero_losses),
            l0_patches=l0_patches,
            l0_cls=l0_cls,
            l0_image=l0_tok.sum(-1),
            cos_sim=jax.vmap(_token_cos_sim)(acts_for_sae, sae_out),
            act_counts=(jnp.abs(feats) > 0)
                .reshape(L, -1, feats.shape[-1]).astype(jnp.float32).sum(1),
            n_tokens=jnp.full((L,), n_tok, jnp.float32),
        )

    return jax.jit(step)


def _token_cos_sim(a, b):
    """Cosine similarity as the reference computes it (evals.py:510-513):
    across the flattened token axis, averaged over d."""
    a = a.reshape(-1, a.shape[-1])
    b = b.reshape(-1, b.shape[-1])
    an = a / (jnp.linalg.norm(a, axis=0, keepdims=True) + 1e-8)
    bn = b / (jnp.linalg.norm(b, axis=0, keepdims=True) + 1e-8)
    return (an * bn).sum(0).mean()


def calculate_log_frequencies(total_acts, total_count):
    if total_acts is None:  # zero batches processed
        return np.zeros((0,), np.float32)
    return np.log10(np.asarray(total_acts) / max(total_count, 1) + 1e-12)


_FETCH_EVERY = 8  # eval batches buffered on device between host fetches


def process_dataset(model, sae: SparseAutoencoder, data_iter: Iterable,
                    class_embeddings, cfg: EvalConfig) -> Dict[str, Any]:
    """Aggregate metrics over a labelled dataset (evals.py:449-549).

    ``data_iter`` yields (images, labels) numpy/JAX batches.

    Dispatches stay async: per-batch ``BatchStats`` are buffered on device
    and pulled to host in one transfer every ``_FETCH_EVERY`` batches —
    a per-batch scalar fetch would insert a full device sync between every
    dispatch (~fixed tunnel latency × n_batches)."""
    step = make_eval_step(model, sae)
    totals = dict(loss=0.0, recons=0.0, zero=0.0, samples=0)
    l0s, l0s_cls, l0s_img, cos = [], [], [], []
    act_counts = None
    total_tokens, total_images = 0, 0
    pending: List[Any] = []  # [(B, device BatchStats), ...]

    def flush():
        nonlocal act_counts, total_tokens
        if not pending:
            return
        host = jax.device_get([s for _, s in pending])  # one transfer
        for (B, _), s in zip(pending, host):
            totals["loss"] += float(s.loss) * B
            totals["recons"] += float(s.recons_loss) * B
            totals["zero"] += float(s.zero_abl_loss) * B
            l0s.extend(np.asarray(s.l0_patches).tolist())
            l0s_cls.extend(np.asarray(s.l0_cls).tolist())
            l0s_img.extend(np.asarray(s.l0_image).tolist())
            cos.append(float(s.cos_sim))
            act_counts = np.asarray(s.act_counts) if act_counts is None \
                else act_counts + np.asarray(s.act_counts)
            total_tokens += int(s.n_tokens)
        pending.clear()

    class_emb = jnp.asarray(class_embeddings)
    for images, labels in data_iter:
        images = jnp.asarray(images)
        labels = jnp.asarray(labels)
        B = images.shape[0]
        s = step(model.params, sae.params, images, labels, class_emb)
        pending.append((B, s))
        totals["samples"] += B
        total_images += B
        if len(pending) >= _FETCH_EVERY:
            flush()
        if totals["samples"] >= cfg.eval_max:
            break
    flush()

    n = max(totals["samples"], 1)
    avg_loss = totals["loss"] / n
    avg_recons = totals["recons"] / n
    avg_zero = totals["zero"] / n
    ce_recovered = ((avg_zero - avg_recons) / (avg_zero - avg_loss)
                    if avg_zero != avg_loss else float("nan"))
    return {
        "avg_loss": avg_loss,
        "avg_reconstruction_loss": avg_recons,
        "avg_zero_abl_loss": avg_zero,
        "ce_recovered": ce_recovered,
        "avg_l0": float(np.mean(l0s)) if l0s else 0.0,
        "avg_l0_cls": float(np.mean(l0s_cls)) if l0s_cls else 0.0,
        "avg_l0_image": float(np.mean(l0s_img)) if l0s_img else 0.0,
        "avg_cos_sim": float(np.mean(cos)) if cos else 0.0,
        "log_frequencies_per_token": calculate_log_frequencies(act_counts,
                                                               total_tokens),
        "log_frequencies_per_image": calculate_log_frequencies(act_counts,
                                                               total_images),
        "alive_fraction": float((act_counts > 0).mean()) if act_counts is not None else 0.0,
    }


def sweep_process_dataset(model, cfg, layers, sweep_params,
                          data_iter: Iterable, class_embeddings,
                          eval_cfg: EvalConfig) -> List[Dict[str, Any]]:
    """:func:`process_dataset` for an all-layer sweep: every batch runs ONE
    :func:`make_sweep_eval_step` program covering all L layers (shared
    clean prefix + vmapped SAE forwards) instead of L independent eval
    pipelines (reference: ``evaluate()`` re-run per layer,
    evals.py:920-1008).  Returns one metric dict per sweep layer."""
    step = make_sweep_eval_step(model, cfg, layers)
    L = len(layers)
    acc = [dict(loss=0.0, recons=0.0, zero=0.0) for _ in range(L)]
    l0s = [[] for _ in range(L)]
    l0s_cls = [[] for _ in range(L)]
    l0s_img = [[] for _ in range(L)]
    cos = [[] for _ in range(L)]
    act_counts: List[Optional[np.ndarray]] = [None] * L
    total_tokens, total_images, samples = 0, 0, 0
    pending: List[Any] = []

    def flush():
        nonlocal total_tokens
        if not pending:
            return
        host = jax.device_get([s for _, s in pending])
        for (B, _), s in zip(pending, host):
            for i in range(L):
                acc[i]["loss"] += float(s.loss[i]) * B
                acc[i]["recons"] += float(s.recons_loss[i]) * B
                acc[i]["zero"] += float(s.zero_abl_loss[i]) * B
                l0s[i].extend(np.asarray(s.l0_patches[i]).tolist())
                l0s_cls[i].extend(np.asarray(s.l0_cls[i]).tolist())
                l0s_img[i].extend(np.asarray(s.l0_image[i]).tolist())
                cos[i].append(float(s.cos_sim[i]))
                act_counts[i] = np.asarray(s.act_counts[i]) \
                    if act_counts[i] is None \
                    else act_counts[i] + np.asarray(s.act_counts[i])
            total_tokens += int(s.n_tokens[0])
        pending.clear()

    class_emb = jnp.asarray(class_embeddings)
    for images, labels in data_iter:
        images = jnp.asarray(images)
        labels = jnp.asarray(labels)
        B = images.shape[0]
        s = step(model.params, sweep_params, images, labels, class_emb)
        pending.append((B, s))
        samples += B
        total_images += B
        if len(pending) >= _FETCH_EVERY:
            flush()
        if samples >= eval_cfg.eval_max:
            break
    flush()

    n = max(samples, 1)
    results = []
    for i, layer in enumerate(layers):
        avg_loss = acc[i]["loss"] / n
        avg_recons = acc[i]["recons"] / n
        avg_zero = acc[i]["zero"] / n
        ce_recovered = ((avg_zero - avg_recons) / (avg_zero - avg_loss)
                        if avg_zero != avg_loss else float("nan"))
        results.append({
            "layer": int(layer),
            "avg_loss": avg_loss,
            "avg_reconstruction_loss": avg_recons,
            "avg_zero_abl_loss": avg_zero,
            "ce_recovered": ce_recovered,
            "avg_l0": float(np.mean(l0s[i])) if l0s[i] else 0.0,
            "avg_l0_cls": float(np.mean(l0s_cls[i])) if l0s_cls[i] else 0.0,
            "avg_l0_image": float(np.mean(l0s_img[i])) if l0s_img[i] else 0.0,
            "avg_cos_sim": float(np.mean(cos[i])) if cos[i] else 0.0,
            "log_frequencies_per_token": calculate_log_frequencies(
                act_counts[i], total_tokens),
            "log_frequencies_per_image": calculate_log_frequencies(
                act_counts[i], total_images),
            "alive_fraction": float((act_counts[i] > 0).mean())
                if act_counts[i] is not None else 0.0,
        })
    return results


# ---------------------------------------------------------------------------
# Sparsity intervals + feature sampling (evals.py:552-575, 1008-1030)
# ---------------------------------------------------------------------------

SPARSITY_INTERVALS = [
    (-8, -6), (-6, -5), (-5, -4), (-4, -3), (-3, -2), (-2, -1),
    (-float("inf"), -8), (-1, float("inf")),
]


def get_intervals_for_sparsities(log_freq: np.ndarray):
    conditions = [np.logical_and(log_freq >= lo, log_freq < hi)
                  for lo, hi in SPARSITY_INTERVALS]
    texts = [f"TOTAL_logfreq_[{lo},{hi}]" for lo, hi in SPARSITY_INTERVALS]
    return SPARSITY_INTERVALS, conditions, texts


def sample_features_from_bins(log_freq: np.ndarray, samples_per_bin: int,
                              seed: int = 0):
    rng = np.random.default_rng(seed)
    _, conditions, texts = get_intervals_for_sparsities(log_freq)
    indices, values, categories = [], [], []
    for cond, text in zip(conditions, texts):
        pool = np.nonzero(cond)[0]
        take = pool[rng.permutation(len(pool))[:samples_per_bin]]
        indices.extend(take.tolist())
        values.extend(log_freq[take].tolist())
        categories.extend([text] * len(take))
    return indices, values, categories


# ---------------------------------------------------------------------------
# Top-activating image mining (evals.py:803-917)
# ---------------------------------------------------------------------------

def make_feature_activation_step(model, sae: SparseAutoencoder,
                                 feature_ids: List[int],
                                 sampling_type: str = "avg"):
    """fn(params, sae_params, images) -> per-image activation score
    [B, n_features] for the selected features."""
    vcfg = model.cfg
    scfg = sae.cfg
    hook = scfg.hook_point
    head = scfg.hook_point_head_index
    fid = jnp.asarray(feature_ids)

    def step(params, sae_params, images):
        rt = HookRuntime(names_filter=hook)
        vit_forward(params, vcfg, images, rt,
                    stop_at_layer=scfg.hook_point_layer + 1)
        act = rt.cache[hook]
        if head is not None:          # [B, ctx, heads, d_head] hooks
            act = act[:, :, head]
        # the SAE's own encode: norm_in + architecture-correct activation
        # (gated/topk/normalized SAEs would otherwise rank by wrong values)
        from vit_prisma_tpu.sae.sae import encode
        _, feats_full, _, _ = encode(sae_params, scfg, act)
        feats = feats_full[..., fid]
        if sampling_type == "cls":
            return feats[:, 0, :]
        return feats.mean(1)

    return jax.jit(step)


def find_top_activations(data_iter, model, sae: SparseAutoencoder,
                         feature_ids: List[int],
                         is_cls_list: Optional[List[bool]] = None,
                         top_k: int = 16, max_samples: int = 50_000,
                         sampling_type: str = "avg"):
    """Running top-k (value, global-image-index) per feature
    (evals.py:855-917).  ``data_iter`` yields (images, labels, indices) or
    (images, indices)."""
    step = make_feature_activation_step(model, sae, feature_ids, sampling_type)
    cls_step = (make_feature_activation_step(model, sae, feature_ids, "cls")
                if is_cls_list and any(is_cls_list) else None)
    best_vals = None
    best_idx = None
    processed = 0
    for batch in data_iter:
        if len(batch) == 3:
            images, _, indices = batch
        else:
            images, indices = batch
        images = jnp.asarray(images)
        indices = np.asarray(indices)
        scores = np.asarray(step(model.params, sae.params, images))
        if cls_step is not None:
            cls_scores = np.asarray(cls_step(model.params, sae.params, images))
            mask = np.asarray(is_cls_list)[None, :]
            scores = np.where(mask, cls_scores, scores)
        if best_vals is None:
            best_vals = scores
            best_idx = np.broadcast_to(indices[:, None], scores.shape).copy()
        else:
            best_vals = np.concatenate([best_vals, scores], axis=0)
            best_idx = np.concatenate(
                [best_idx, np.broadcast_to(indices[:, None], scores.shape)], axis=0)
        # keep only the current top_k rows per feature
        if best_vals.shape[0] > 4 * top_k:
            order = np.argsort(-best_vals, axis=0)[:top_k]
            best_vals = np.take_along_axis(best_vals, order, axis=0)
            best_idx = np.take_along_axis(best_idx, order, axis=0)
        processed += images.shape[0]
        if processed >= max_samples:
            break
    order = np.argsort(-best_vals, axis=0)[:top_k]
    best_vals = np.take_along_axis(best_vals, order, axis=0)
    best_idx = np.take_along_axis(best_idx, order, axis=0)
    return {f: (best_vals[:, i], best_idx[:, i])
            for i, f in enumerate(feature_ids)}


# ---------------------------------------------------------------------------
# Heatmaps (evals.py:637-676)
# ---------------------------------------------------------------------------

def get_heatmap(image, model, sae: SparseAutoencoder, feature_id: int):
    """Per-token pre-activation of one feature for one image (through the
    SAE's own encode, so norm modes / gated params / head-index hooks all
    resolve correctly)."""
    vcfg = model.cfg
    scfg = sae.cfg
    rt = HookRuntime(names_filter=scfg.hook_point)
    vit_forward(model.params, vcfg, jnp.asarray(image)[None], rt,
                stop_at_layer=scfg.hook_point_layer + 1)
    act = rt.cache[scfg.hook_point][0]
    if scfg.hook_point_head_index is not None:
        act = act[:, scfg.hook_point_head_index]
    from vit_prisma_tpu.sae.sae import encode
    _, _, hidden_pre, _ = encode(sae.params, scfg, act)
    return hidden_pre[..., feature_id]


def image_patch_heatmap(activation_values, cfg) -> np.ndarray:
    """Expand per-patch activations (minus CLS) to a pixel heatmap
    (evals.py:657-676)."""
    n = cfg.image_size // cfg.patch_size
    vals = np.asarray(activation_values)[1:].reshape(n, n)
    return np.kron(vals, np.ones((cfg.patch_size, cfg.patch_size)))


# ---------------------------------------------------------------------------
# Sparsity visualization (evals.py:699-801) — saves histogram data; plots
# only if matplotlib is importable (not required on TPU hosts).
# ---------------------------------------------------------------------------

def visualize_sparsities(cfg: EvalConfig, log_freq_tokens, log_freq_images,
                         name: str, sae=None):
    os.makedirs(cfg.sae_path, exist_ok=True)
    np.savez(os.path.join(cfg.sae_path, f"sparsity_{name}.npz"),
             log_freq_tokens=np.asarray(log_freq_tokens),
             log_freq_images=np.asarray(log_freq_images))
    # interactive dashboard (the reference's plotly surface, evals.py:750):
    # self-contained HTML with hover tooltips + table views; with the SAE
    # available it adds the per-condition cosine-similarity histograms
    from vit_prisma_tpu.visualization.sae_dashboards import (
        default_frequency_conditions)
    from vit_prisma_tpu.visualization.sae_dashboards_html import (
        interactive_sparsity_dashboard)

    class _Dir:
        save_figure_dir = cfg.sae_path
    conditions, texts = ([], []) if sae is None else \
        default_frequency_conditions(np.asarray(log_freq_tokens))
    interactive_sparsity_dashboard(
        _Dir(), log_freq_tokens, log_freq_images, conditions, texts,
        name, sae if sae is not None else np.zeros((1, 1)))
    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        fig, ax = plt.subplots(1, 2, figsize=(10, 4))
        ax[0].hist(np.asarray(log_freq_tokens), bins=50)
        ax[0].set_title(f"{name} log10 feature freq (tokens)")
        ax[1].hist(np.asarray(log_freq_images), bins=50)
        ax[1].set_title(f"{name} log10 feature freq (images)")
        fig.savefig(os.path.join(cfg.sae_path, f"sparsity_{name}.png"))
        plt.close(fig)
    except Exception:
        pass


def save_stats(path: str, stats: Dict[str, Any]):
    os.makedirs(path, exist_ok=True)
    out = {k: (v.tolist() if isinstance(v, np.ndarray) else v)
           for k, v in stats.items()}
    with open(os.path.join(path, "eval_stats.json"), "w") as f:
        json.dump(out, f, indent=2)


# ---------------------------------------------------------------------------
# Full pipeline (evals.py:920-1008)
# ---------------------------------------------------------------------------

def evaluate(cfg: EvalConfig, sae: SparseAutoencoder, model,
             val_data_iter_fn, class_embeddings,
             seed: int = 0) -> Dict[str, Any]:
    """Run the full eval: stats -> sparsity viz -> per-bin feature sampling
    -> top-image mining.  ``val_data_iter_fn()`` returns a fresh iterator of
    (images, labels, indices) batches."""
    stats = process_dataset(model, sae,
                            ((im, lb) for im, lb, _ in val_data_iter_fn()),
                            class_embeddings, cfg)
    save_stats(cfg.sae_path, stats)

    log_freq_tokens = stats["log_frequencies_per_token"]
    visualize_sparsities(cfg, log_freq_tokens,
                         stats["log_frequencies_per_image"], "TOTAL",
                         sae=sae)

    indices, values, categories = sample_features_from_bins(
        log_freq_tokens, cfg.samples_per_bin, seed)
    top_per_feature = {}
    if indices:
        top_per_feature = find_top_activations(
            val_data_iter_fn(), model, sae, indices,
            [False] * len(indices), cfg.max_images_per_feature,
            cfg.top_image_max_samples, cfg.sampling_type)
    stats["sampled_features"] = {
        "indices": indices, "values": values, "categories": categories}
    stats["top_images_per_feature"] = {
        int(f): (v.tolist(), i.tolist()) for f, (v, i) in top_per_feature.items()}
    return stats
