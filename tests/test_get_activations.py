"""Legacy batch harvester (utils/get_activations.py) — capability match for
the reference's ``vit_prisma/utils/get_activations.py:91-117``: harvest one
hook over a (images, labels) loader into stacked numpy, with stop_at_layer
dead-code elimination picked automatically from the hook name."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vit_prisma_tpu import HookedViT, ViTConfig, get_act_name
from vit_prisma_tpu.utils.get_activations import (get_activations,
                                                  hook_stop_layer)


def make_model():
    cfg = ViTConfig(n_layers=2, d_model=8, d_head=2, n_heads=4, d_mlp=16,
                    patch_size=4, image_size=8, n_classes=3,
                    return_type="logits")
    return HookedViT(cfg, key=jax.random.PRNGKey(0))


def make_loader(n_batches=3, batch=4, with_labels=True, seed=0):
    rng = np.random.default_rng(seed)
    for i in range(n_batches):
        imgs = rng.standard_normal((batch, 3, 8, 8)).astype(np.float32)
        if with_labels:
            yield imgs, rng.integers(0, 3, size=(batch,))
        else:
            yield imgs


def test_matches_run_with_cache_concat():
    model = make_model()
    name = get_act_name("resid_post", 1)
    batches = list(make_loader())
    acts = get_activations(model, name, iter(batches))
    expected = np.concatenate([
        np.asarray(model.run_with_cache(b[0], names_filter=[name],
                                        return_cache_object=False)[1][name])
        for b in batches], axis=0)
    assert acts.shape == (12, 5, 8)  # 3 batches x 4, T=4+CLS, d_model
    np.testing.assert_allclose(acts, expected, rtol=1e-6, atol=1e-6)


def test_shorthand_name_and_labels():
    model = make_model()
    acts, labels = get_activations(model, "resid_post",  # layer-less name
                                   make_loader(), return_labels=True)
    assert acts.shape[0] == 12 and labels.shape == (12,)


def test_max_count_and_test_run():
    model = make_model()
    name = get_act_name("pattern", 0)
    acts = get_activations(model, name, make_loader(n_batches=5),
                           max_count=2)
    assert acts.shape[0] == 8  # 2 batches x 4
    acts1 = get_activations(model, name, make_loader(n_batches=5),
                            test_run=True)
    assert acts1.shape[0] == 4


def test_labelless_loader_and_jnp_batches():
    model = make_model()
    batches = [jnp.asarray(b) for b in
               (np.random.default_rng(1)
                .standard_normal((2, 4, 3, 8, 8)).astype(np.float32))]
    acts = get_activations(model, get_act_name("mlp_out", 0), iter(batches))
    assert acts.shape[0] == 8


def test_stop_layer_inference():
    assert hook_stop_layer("blocks.0.hook_resid_post", 2) == 1
    assert hook_stop_layer("blocks.1.attn.hook_pattern", 2) == 2
    assert hook_stop_layer("hook_full_embed", 2) == 0
    assert hook_stop_layer("ln_final.hook_normalized", 2) is None
    with pytest.raises(ValueError):
        hook_stop_layer("blocks.7.hook_resid_post", 2)
