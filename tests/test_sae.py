"""SAE numerics: forward values and *gradients* must match the PyTorch
reference (standard/gated/topk/transcoder variants, incl. ghost grads with
the masked rewrite), plus train-step/store/trainer integration smoke."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vit_prisma_tpu import HookedViT, ViTConfig
from vit_prisma_tpu.sae import (
    SAERunnerConfig,
    SparseAutoencoder,
    VisionActivationsStore,
    VisionSAETrainer,
    init_sae_params,
    init_train_state,
    remove_gradient_parallel_to_decoder_directions,
    sae_forward,
    sae_train_step,
    set_decoder_norm_to_unit_norm,
)

from tests.reference_oracle import load_reference

ATOL = 2e-5
D_IN, EXPANSION = 16, 4


def ref_sae(arch="standard", act="relu", act_kwargs=None, norm="none",
            ghost=False, l1=0.01):
    import torch
    load_reference()
    from vit_prisma.sae.config import VisionModelSAERunnerConfig
    from vit_prisma.sae.sae import (GatedSparseAutoencoder,
                                    StandardSparseAutoencoder)
    from vit_prisma.sae.transcoder import Transcoder
    torch.manual_seed(0)
    rcfg = VisionModelSAERunnerConfig(
        d_in=D_IN, expansion_factor=EXPANSION, activation_fn_str=act,
        activation_fn_kwargs=act_kwargs or {}, normalize_activations=norm,
        use_ghost_grads=ghost, l1_coefficient=l1, _device="cpu",
        architecture="standard" if arch != "gated" else "gated",
        is_transcoder=(arch == "transcoder"), d_out=D_IN,
        log_to_wandb=False, verbose=False)
    cls = {"standard": StandardSparseAutoencoder,
           "gated": GatedSparseAutoencoder,
           "transcoder": Transcoder}[arch]
    return cls(rcfg), rcfg


def jax_cfg(arch="standard", act="relu", act_kwargs=None, norm="none",
            ghost=False, l1=0.01):
    return SAERunnerConfig(
        d_in=D_IN, expansion_factor=EXPANSION, activation_fn_str=act,
        activation_fn_kwargs=tuple(sorted((act_kwargs or {}).items())),
        normalize_activations=norm, use_ghost_grads=ghost, l1_coefficient=l1,
        architecture=arch, d_out=D_IN, is_transcoder=(arch == "transcoder"),
        b_dec_init_method="zeros", log_to_wandb=False)


def copy_params(ref):
    return {k: jnp.asarray(v.detach().numpy())
            for k, v in ref.state_dict().items()}


CASES = [
    ("standard", "relu", None, "none", False),
    ("standard", "relu", None, "layer_norm", False),
    ("standard", "relu", None, "constant_norm_rescale", False),
    ("standard", "topk", {"k": 8}, "none", False),
    ("standard", "tanh-relu", None, "none", False),
    ("standard", "relu", None, "none", True),   # ghost grads
    ("gated", "relu", None, "none", False),
    ("transcoder", "relu", None, "none", False),
]


@pytest.mark.parametrize("arch,act,act_kwargs,norm,ghost", CASES)
def test_sae_forward_and_grads_match_reference(arch, act, act_kwargs, norm, ghost):
    import torch
    ref, rcfg = ref_sae(arch, act, act_kwargs, norm, ghost)
    jcfg = jax_cfg(arch, act, act_kwargs, norm, ghost)
    params = copy_params(ref)

    torch.manual_seed(1)
    x_t = torch.randn(32, D_IN, requires_grad=False)
    x = jnp.asarray(x_t.numpy())
    y_t = torch.randn(32, D_IN)
    y = jnp.asarray(y_t.numpy())

    d_sae = D_IN * EXPANSION
    mask_np = np.zeros(d_sae, bool)
    mask_np[::3] = True  # arbitrary dead set
    mask_t = torch.from_numpy(mask_np)
    mask_j = jnp.asarray(mask_np)

    ref.train()
    if arch == "transcoder":
        out_ref = ref(x_t, y_t, mask_t if ghost else None)
    else:
        out_ref = ref(x_t, mask_t if ghost else None)
    (sae_out_r, feats_r, loss_r, mse_r, l1_r, ghost_r, aux_r) = out_ref

    def loss_fn(p):
        out = sae_forward(p, jcfg, x, y=y if arch == "transcoder" else None,
                          dead_neuron_mask=mask_j if ghost else None,
                          training=True)
        return out.loss, out

    (loss_j, out_j), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)

    np.testing.assert_allclose(np.asarray(out_j.sae_out), sae_out_r.detach().numpy(),
                               atol=ATOL, err_msg="sae_out")
    np.testing.assert_allclose(np.asarray(out_j.feature_acts), feats_r.detach().numpy(),
                               atol=ATOL, err_msg="feature_acts")
    np.testing.assert_allclose(float(out_j.mse_loss), float(mse_r), atol=ATOL)
    np.testing.assert_allclose(float(loss_j), float(loss_r), atol=ATOL)
    if l1_r is not None and out_j.l1_loss is not None:
        np.testing.assert_allclose(float(out_j.l1_loss), float(l1_r), atol=ATOL)
    np.testing.assert_allclose(float(out_j.ghost_grad_loss), float(ghost_r),
                               atol=ATOL)

    # gradients
    loss_r.backward()
    for name, p in ref.named_parameters():
        if p.grad is None:
            continue
        np.testing.assert_allclose(
            np.asarray(grads[name]), p.grad.numpy(), atol=1e-4,
            err_msg=f"grad mismatch at {name}")


def test_unit_norm_and_parallel_removal_match_reference():
    import torch
    ref, _ = ref_sae()
    jcfg = jax_cfg()
    params = copy_params(ref)

    ref.set_decoder_norm_to_unit_norm()
    ours = set_decoder_norm_to_unit_norm(params)
    np.testing.assert_allclose(np.asarray(ours["W_dec"]),
                               ref.W_dec.detach().numpy(), atol=1e-6)

    # remove-parallel on a synthetic gradient
    torch.manual_seed(2)
    g = torch.randn_like(ref.W_dec)
    ref.W_dec.grad = g.clone()
    ref.remove_gradient_parallel_to_decoder_directions()
    grads = {"W_dec": jnp.asarray(g.numpy())}
    ours_g = remove_gradient_parallel_to_decoder_directions(
        grads, {"W_dec": ours["W_dec"]})
    np.testing.assert_allclose(np.asarray(ours_g["W_dec"]),
                               ref.W_dec.grad.numpy(), atol=1e-5)


def test_train_step_runs_and_counters_update():
    cfg = jax_cfg().replace(train_batch_size=64, lr=1e-3,
                            lr_scheduler_name="constant",
                            dead_feature_window=2)
    state = init_train_state(cfg, key=jax.random.PRNGKey(0))
    batch = jax.random.normal(jax.random.PRNGKey(1), (64, D_IN))
    w_enc_sum_before = float(jnp.abs(state.params["W_enc"]).sum())
    state2, metrics = sae_train_step(state, batch, cfg)
    assert int(state2.step) == 1
    assert int(state2.n_training_tokens) == 64
    assert float(metrics.loss) > 0
    # params actually moved (state was donated into the jitted step)
    delta = float(jnp.abs(state2.params["W_enc"]).sum()) - w_enc_sum_before
    assert delta != 0.0
    # decoder stays ~unit norm after projection+step drift is bounded
    norms = jnp.linalg.norm(state2.params["W_dec"], axis=1)
    assert float(jnp.abs(norms - 1).max()) < 0.1
    # loss decreases over a few steps on a fixed batch
    losses = [float(metrics.loss)]
    for i in range(20):
        state2, m = sae_train_step(state2, batch, cfg)
        losses.append(float(m.loss))
    assert losses[-1] < losses[0]


def test_store_and_trainer_end_to_end():
    """SAE training smoke over a live HookedViT store (counterpart of
    /root/reference/tests/sae/test_sae_training.py:7-33)."""
    vcfg = ViTConfig(n_layers=2, d_model=16, d_head=4, n_heads=4, d_mlp=32,
                     patch_size=4, image_size=8, n_classes=5,
                     return_type="logits")
    model = HookedViT(vcfg, key=jax.random.PRNGKey(0))
    n_tokens = vcfg.n_tokens
    cfg = SAERunnerConfig(
        d_in=16, expansion_factor=2, context_size=n_tokens,
        hook_point_layer=1, layer_subtype="hook_resid_post",
        store_batch_size=8, n_batches_in_buffer=2, train_batch_size=40,
        total_training_images=64, lr=1e-3,
        lr_scheduler_name="constantwithwarmup", lr_warm_up_steps=2,
        b_dec_init_method="geometric_median", log_to_wandb=False,
        n_checkpoints=0, feature_sampling_window=5, dead_feature_window=3)
    images = np.random.default_rng(0).normal(
        size=(64, 3, 8, 8)).astype(np.float32)
    store = VisionActivationsStore(cfg, model, images)
    batch = store.next_batch()
    assert batch.shape == (40, 16)

    trainer = VisionSAETrainer(cfg, model=model, store=store)
    sae = trainer.run()
    assert int(trainer.state.n_training_tokens) >= cfg.total_training_tokens
    out = sae(jax.random.normal(jax.random.PRNGKey(3), (8, 16)))
    assert out.sae_out.shape == (8, 16)


def test_sae_save_load_roundtrip(tmp_path):
    cfg = jax_cfg()
    sae = SparseAutoencoder(cfg, key=jax.random.PRNGKey(0))
    path = str(tmp_path / "sae_test")
    sae.save_model(path)
    loaded = SparseAutoencoder.load_from_pretrained(path)
    assert loaded.cfg.d_sae == cfg.d_sae
    for k in sae.params:
        np.testing.assert_array_equal(np.asarray(sae.params[k]),
                                      np.asarray(loaded.params[k]))


def test_topk_activation_exact():
    from vit_prisma_tpu.sae.sae import topk_activation
    x = jnp.asarray([[1.0, -2.0, 3.0, 0.5], [0.1, 0.2, -0.3, 0.4]])
    out = topk_activation(x, 2)
    np.testing.assert_allclose(np.asarray(out),
                               [[1.0, 0, 3.0, 0], [0, 0.2, 0, 0.4]])
