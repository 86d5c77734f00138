"""Import reference-format SAE checkpoints: create real checkpoints with the
reference's own save_model, then load them WITHOUT vit_prisma importable in
the unpickler path."""

import numpy as np
import pytest

import jax.numpy as jnp

from vit_prisma_tpu.sae import SAERunnerConfig
from vit_prisma_tpu.sae.checkpoint_import import (
    load_legacy_saelens_v2,
    load_reference_sae_checkpoint,
)
from vit_prisma_tpu.sae.sae import sae_forward

from tests.reference_oracle import load_reference


def test_load_reference_checkpoint(tmp_path):
    import torch
    load_reference()
    from vit_prisma.sae.config import VisionModelSAERunnerConfig
    from vit_prisma.sae.sae import StandardSparseAutoencoder
    torch.manual_seed(0)
    rcfg = VisionModelSAERunnerConfig(
        d_in=16, expansion_factor=4, _device="cpu", hook_point_layer=7,
        layer_subtype="hook_resid_post", activation_fn_str="relu",
        l1_coefficient=0.001, log_to_wandb=False)
    ref = StandardSparseAutoencoder(rcfg)
    path = str(tmp_path / "ref_sae.pt")
    ref.save_model(path)

    sae = load_reference_sae_checkpoint(path)
    assert sae.cfg.d_in == 16 and sae.cfg.d_sae == 64
    assert sae.cfg.hook_point == "blocks.7.hook_resid_post"
    assert sae.cfg.l1_coefficient == pytest.approx(0.001)
    for k in ("W_enc", "b_enc", "W_dec", "b_dec"):
        np.testing.assert_allclose(np.asarray(sae.params[k]),
                                   ref.state_dict()[k].numpy(), atol=1e-6)
    # loaded SAE forward matches the reference forward
    x_t = torch.randn(8, 16)
    with torch.no_grad():
        ref.eval()
        sae_out_ref = ref(x_t)[0]
    out = sae_forward(sae.params, sae.cfg, jnp.asarray(x_t.numpy()),
                      training=False)
    np.testing.assert_allclose(np.asarray(out.sae_out),
                               sae_out_ref.numpy(), atol=1e-5)


def test_load_legacy_saelens_v2(tmp_path):
    import torch
    torch.manual_seed(1)
    d_in, d_sae = 8, 32
    state = {"W_enc": torch.randn(d_in, d_sae),
             "b_enc": torch.randn(d_sae),
             "W_dec": torch.randn(d_sae, d_in),
             "b_dec": torch.randn(d_in)}
    ckpt = {"config": {"d_in": d_in, "expansion_factor": 4,
                       "hook_point": "blocks.3.hook_mlp_out",
                       "l1_coefficient": 5e-4,
                       "feature_sampling_method": "dropped-field"},
            "autoencoder": {"state_dict": state}}
    path = str(tmp_path / "legacy.pt")
    torch.save(ckpt, path)
    sae = load_legacy_saelens_v2(path)
    assert sae.cfg.hook_point == "blocks.3.hook_mlp_out"
    assert sae.cfg.d_sae == 32
    np.testing.assert_allclose(np.asarray(sae.params["W_enc"]),
                               state["W_enc"].numpy(), atol=1e-6)


def test_orbax_sharded_train_state_roundtrip(tmp_path):
    """Orbax save/restore of the full train state, incl. restore onto a
    mesh with feature-parallel shardings."""
    import jax
    import numpy as np
    from vit_prisma_tpu.parallel import make_mesh
    from vit_prisma_tpu.sae import SAERunnerConfig, init_train_state
    from vit_prisma_tpu.sae.train import (load_train_state_sharded,
                                          sae_train_step,
                                          save_train_state_sharded)

    cfg = SAERunnerConfig(d_in=16, expansion_factor=4, train_batch_size=32,
                          lr=1e-3, lr_scheduler_name="constant",
                          b_dec_init_method="zeros", log_to_wandb=False)
    state = init_train_state(cfg, key=jax.random.PRNGKey(0))
    batch = jax.random.normal(jax.random.PRNGKey(1), (32, 16))
    state, _ = sae_train_step(state, batch, cfg)

    path = save_train_state_sharded(str(tmp_path / "ckpt"), state, cfg)

    # plain restore
    restored, cfg2 = load_train_state_sharded(path)
    assert cfg2.d_sae == cfg.d_sae
    np.testing.assert_array_equal(np.asarray(restored.params["W_enc"]),
                                  np.asarray(state.params["W_enc"]))
    assert int(restored.step) == 1

    # mesh restore: leaves land sharded and training continues identically
    mesh = make_mesh(data=2, model=4)
    restored_m, _ = load_train_state_sharded(path, mesh=mesh)
    s2, m2 = sae_train_step(restored_m, batch, cfg)
    s1, m1 = sae_train_step(restored, batch, cfg)
    np.testing.assert_allclose(float(m1.loss), float(m2.loss), rtol=1e-6)
