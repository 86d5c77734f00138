"""Zero-shot CLIP classification: classifier construction and ImageNet-style
evaluation.

Counterparts of
``/root/reference/src/vit_prisma/models/build_zero_shot_classifier.py:57-97``
(``zero_shot_classifier``) and
``/root/reference/src/vit_prisma/model_eval/evaluate_imagenet.py:47-178``
(``run`` / ``zero_shot_eval`` / ``accuracy``).

The text encoder is our ``HookedTextTransformer`` (or any callable mapping
token batches to embeddings); tokenization defaults to the self-contained
CLIP BPE (``utils/clip_tokenizer.py``) so no network/open_clip dependency
is required — any other callable may be injected.
"""

from __future__ import annotations

import os
from typing import Callable, Dict, Iterable, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vit_prisma_tpu.utils.openai_templates import (
    OPENAI_IMAGENET_TEMPLATE_STRINGS,
)


def zero_shot_classifier(text_encoder: Callable,
                         tokenizer: Optional[Callable],
                         classnames: Sequence[str],
                         templates: Sequence[str] = OPENAI_IMAGENET_TEMPLATE_STRINGS,
                         batch_size: int = 64) -> jax.Array:
    """Build zero-shot weights [d, n_classes]
    (build_zero_shot_classifier.py:57-97): encode template(class) prompts,
    L2-normalize, mean over templates, renormalize, stack.

    ``tokenizer(texts: List[str]) -> int array [n, ctx]``; ``None`` uses
    the built-in CLIP BPE (utils/clip_tokenizer.py);
    ``text_encoder(tokens) -> [n, d]`` embeddings.
    """
    if tokenizer is None:
        from vit_prisma_tpu.utils.clip_tokenizer import get_default_tokenizer
        tokenizer = get_default_tokenizer()
    weights = []
    for classname in classnames:
        texts = [t.format(c=classname) if isinstance(t, str) else t(classname)
                 for t in templates]
        tokens = jnp.asarray(np.asarray(tokenizer(texts)))
        embs = []
        for i in range(0, tokens.shape[0], batch_size):
            embs.append(text_encoder(tokens[i:i + batch_size]))
        emb = jnp.concatenate(embs, axis=0)
        emb = emb / jnp.linalg.norm(emb, axis=-1, keepdims=True)
        class_emb = emb.mean(0)
        class_emb = class_emb / jnp.linalg.norm(class_emb)
        weights.append(class_emb)
    return jnp.stack(weights, axis=1)  # [d, n_classes]


def accuracy(logits: jax.Array, target: jax.Array,
             topk: Tuple[int, ...] = (1,)) -> List[float]:
    """Top-k correct counts (evaluate_imagenet.py:33-44)."""
    maxk = max(topk)
    pred = jnp.argsort(-logits, axis=-1)[:, :maxk]
    correct = pred == target[:, None]
    return [float(correct[:, :k].any(axis=-1).sum()) for k in topk]


def run(model, classifier, data_iter: Iterable, fwd_hooks=None
        ) -> Tuple[float, float]:
    """Evaluate top-1/top-5 over a (images, labels) iterator
    (evaluate_imagenet.py:47-99).  ``logits = 100 * image_features @
    classifier``; ``fwd_hooks`` lets the evaluation run under
    interventions."""
    classifier = jnp.asarray(classifier)
    top1 = top5 = n = 0.0
    for images, target in data_iter:
        images = jnp.asarray(images)
        target = jnp.asarray(target)
        if fwd_hooks is not None and hasattr(model, "run_with_hooks"):
            output = model.run_with_hooks(images, fwd_hooks=fwd_hooks)
        else:
            output = model(images)
        logits = 100.0 * output @ classifier
        acc1, acc5 = accuracy(logits, target, topk=(1, 5))
        top1 += acc1
        top5 += acc5
        n += images.shape[0]
    return top1 / n, top5 / n


def zero_shot_eval(model, data: Dict[str, Iterable], model_name: str = "",
                   pretrained_classifier=None,
                   text_encoder: Optional[Callable] = None,
                   tokenizer: Optional[Callable] = None,
                   classnames: Optional[Sequence[str]] = None,
                   fwd_hooks=None) -> Dict[str, float]:
    """Zero-shot ImageNet evaluation (evaluate_imagenet.py:102-178).

    ``data`` maps split names ('imagenet-val', 'imagenet-v2') to
    (images, labels) iterables.  Pass a prebuilt classifier or the
    (text_encoder, tokenizer, classnames) triple to build one.
    """
    if not any(k in data for k in ("imagenet-val", "imagenet-v2")):
        return {}
    if pretrained_classifier is None:
        assert text_encoder is not None and classnames is not None, \
            "need text_encoder+classnames to build a classifier"
        classifier = zero_shot_classifier(text_encoder, tokenizer, classnames)
    else:
        classifier = pretrained_classifier

    results: Dict[str, float] = {}
    if "imagenet-val" in data:
        top1, top5 = run(model, classifier, data["imagenet-val"],
                         fwd_hooks=fwd_hooks)
        results["imagenet-zeroshot-val-top1"] = top1
        results["imagenet-zeroshot-val-top5"] = top5
    if "imagenet-v2" in data:
        top1, top5 = run(model, classifier, data["imagenet-v2"],
                         fwd_hooks=fwd_hooks)
        results["imagenetv2-zeroshot-val-top1"] = top1
        results["imagenetv2-zeroshot-val-top5"] = top5
    return results


def load_classifier(path: str) -> jax.Array:
    """Load a prebuilt .npy classifier (the reference ships one at
    pretrained_classifiers/clip_benchmark/...npy)."""
    return jnp.asarray(np.load(path))


def save_classifier(path: str, classifier) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.save(path, np.asarray(classifier))
