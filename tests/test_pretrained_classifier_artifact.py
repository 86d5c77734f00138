"""Offline golden tests against the reference's SHIPPED zero-shot
classifier artifact.

The reference distributes a real 512x1000 ImageNet classifier built from
the flagship CLIP-B/32-DataComp checkpoint
(``build_zero_shot_classifier.py:57-97`` produces it;
``model_eval/evaluate_imagenet.py:102`` consumes it).  It is genuine data
from published weights, readable offline — these tests round-trip it
through our loader, drive ``zero_shot_eval``'s top-k path with it, and use
its real class directions in the substitution-CE eval machinery, so the
CE-recovered path is exercised with genuine CLIP geometry rather than
synthetic/identity directions.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vit_prisma_tpu.model_eval.zero_shot import (
    accuracy,
    load_classifier,
    save_classifier,
    zero_shot_eval,
)

ARTIFACT = ("/root/reference/pretrained_classifiers/clip_benchmark/"
            "imagenet_classifier_hf_hub_laion_CLIP_ViT_B_32_DataComp"
            ".XL_s13B_b90K.npy")

pytestmark = pytest.mark.skipif(
    not os.path.exists(ARTIFACT),
    reason="reference classifier artifact not present")


@pytest.fixture(scope="module")
def classifier():
    return load_classifier(ARTIFACT)


def test_artifact_roundtrip_and_geometry(classifier, tmp_path_factory):
    # the reference's builder L2-normalizes each class embedding
    # (build_zero_shot_classifier.py:90-95) -> unit columns
    assert classifier.shape == (512, 1000)
    assert classifier.dtype == jnp.float32
    col_norms = jnp.linalg.norm(classifier, axis=0)
    np.testing.assert_allclose(np.asarray(col_norms), 1.0, atol=1e-5)
    # class directions are distinct — except the known ImageNet label
    # collisions 657 "missile"/744 "projectile" and 836 "sunglass"/837
    # "sunglasses", whose prompt texts produce (near-)identical CLIP
    # embeddings; pin those exact quirks
    g = np.asarray(classifier.T @ classifier)
    od = g - np.eye(1000)
    dup_pairs = {(int(i), int(j))
                 for i, j in zip(*np.nonzero(od > 0.999)) if i < j}
    assert dup_pairs == {(657, 744), (836, 837)}

    out = tmp_path_factory.mktemp("clf") / "clf.npy"
    save_classifier(str(out), classifier)
    re = load_classifier(str(out))
    np.testing.assert_array_equal(np.asarray(re), np.asarray(classifier))


def test_zero_shot_eval_topk_with_real_classifier(classifier):
    """Drive the full zero_shot_eval top-1/top-5 path with the shipped
    classifier: an image encoder that emits each target's own class
    direction must score 100% top-1 (unit columns; max off-diagonal
    cosine < 1)."""
    rng = np.random.default_rng(0)
    labels = rng.integers(0, 1000, size=(64,))
    # 657/744 and 836/837 share directions (see the geometry test) — top-1
    # on them is a coin flip by construction, so draw around them
    labels = np.where(np.isin(labels, (657, 744, 836, 837)), 3, labels)
    embeddings = np.asarray(classifier)[:, labels].T  # [64, 512]

    def data_iter():
        for i in range(0, 64, 16):
            yield embeddings[i:i + 16], labels[i:i + 16]

    model = lambda images: images  # images ARE the embeddings here
    results = zero_shot_eval(model, {"imagenet-val": data_iter()},
                             pretrained_classifier=classifier)
    assert results["imagenet-zeroshot-val-top1"] == 1.0
    assert results["imagenet-zeroshot-val-top5"] == 1.0

    # perturbed embeddings: top-5 >= top-1, both finite and in [0, 1]
    noisy = embeddings + 0.35 * rng.normal(size=embeddings.shape) \
        .astype(np.float32)
    logits = 100.0 * jnp.asarray(noisy) @ classifier
    c1, c5 = accuracy(logits, jnp.asarray(labels), topk=(1, 5))
    assert 0.0 <= c1 <= c5 <= 64.0


def test_substitution_ce_with_real_class_directions(classifier):
    """The SAE substitution-CE machinery (clean / reconstructed /
    zero-ablated CE and CE-recovered) running with the artifact's REAL
    class directions: a tiny ViT with a 512-d head plays the image
    encoder, the 1000 CLIP text directions are the readout."""
    from vit_prisma_tpu import HookedViT, ViTConfig
    from vit_prisma_tpu.sae import SAERunnerConfig, SparseAutoencoder
    from vit_prisma_tpu.sae.evals import make_eval_step

    vcfg = ViTConfig(n_layers=2, d_model=32, d_head=8, n_heads=4, d_mlp=64,
                     patch_size=4, image_size=8, n_classes=512,
                     return_type="class_logits")
    scfg = SAERunnerConfig(d_in=32, expansion_factor=4, hook_point_layer=1,
                           layer_subtype="hook_resid_post",
                           context_size=vcfg.n_tokens,
                           b_dec_init_method="zeros", log_to_wandb=False)
    model = HookedViT(vcfg, key=jax.random.PRNGKey(0))
    sae = SparseAutoencoder(scfg, key=jax.random.PRNGKey(1))

    rng = np.random.default_rng(1)
    images = jnp.asarray(rng.normal(size=(16, 3, 8, 8)).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, 1000, size=(16,)))
    class_emb = classifier.T  # [n_classes, d] as the eval step expects

    step = make_eval_step(model, sae)
    s = step(model.params, sae.params, images, labels, class_emb)

    # clean CE must equal the direct computation against the real readout
    logits = model(images) @ classifier
    logp = jax.nn.log_softmax(logits, -1)
    ce = -np.take_along_axis(np.asarray(logp),
                             np.asarray(labels)[:, None], 1).mean()
    np.testing.assert_allclose(float(s.loss), ce, atol=1e-5)
    for name in ("loss", "recons_loss", "zero_abl_loss"):
        assert np.isfinite(float(getattr(s, name))), name
    # substituting an untrained SAE must move the CE; CE-recovered is then
    # a well-defined finite quantity
    assert abs(float(s.recons_loss) - float(s.loss)) > 1e-7
    denom = float(s.zero_abl_loss) - float(s.loss)
    assert abs(denom) > 1e-7
    ce_recovered = (float(s.zero_abl_loss) - float(s.recons_loss)) / denom
    assert np.isfinite(ce_recovered)
