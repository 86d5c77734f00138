"""Multi-chip sharding tests on the virtual 8-device CPU mesh: sharded
forward and SAE train step must compile, execute, and agree numerically
with the single-device path."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vit_prisma_tpu import HookedViT, ViTConfig
from vit_prisma_tpu.parallel import (
    batch_sharding,
    make_mesh,
    sae_state_shardings,
    shard_sae_train_step,
    shard_vit_forward,
    vit_param_shardings,
)
from vit_prisma_tpu.sae import SAERunnerConfig, init_train_state, sae_train_step


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= 8, "conftest must provide 8 virtual devices"
    return make_mesh(data=2, model=4)


def test_sharded_vit_forward_matches_single(mesh):
    cfg = ViTConfig(n_layers=2, d_model=16, d_head=4, n_heads=4, d_mlp=32,
                    patch_size=4, image_size=16, n_classes=8,
                    return_type="logits")
    model = HookedViT(cfg, key=jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(1), (8, 3, 16, 16))
    single = model(x)

    params_sh = jax.device_put(model.params,
                               vit_param_shardings(mesh, model.params))
    x_sh = jax.device_put(x, batch_sharding(mesh))
    fwd = shard_vit_forward(model, mesh)
    sharded = fwd(params_sh, x_sh)
    np.testing.assert_allclose(np.asarray(sharded), np.asarray(single),
                               atol=1e-5)


def test_sharded_cached_forward(mesh):
    cfg = ViTConfig(n_layers=2, d_model=16, d_head=4, n_heads=4, d_mlp=32,
                    patch_size=4, image_size=16, n_classes=8,
                    return_type="logits")
    model = HookedViT(cfg, key=jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(1), (8, 3, 16, 16))
    fwd = shard_vit_forward(model, mesh,
                            names_filter=lambda n: "resid_post" in n)
    params_sh = jax.device_put(model.params,
                               vit_param_shardings(mesh, model.params))
    x_sh = jax.device_put(x, batch_sharding(mesh))
    out, cache = fwd(params_sh, x_sh)
    assert set(cache) == {"blocks.0.hook_resid_post", "blocks.1.hook_resid_post"}
    _, ref_cache = model.run_with_cache(x, names_filter=lambda n: "resid_post" in n,
                                        return_cache_object=False)
    np.testing.assert_allclose(np.asarray(cache["blocks.1.hook_resid_post"]),
                               np.asarray(ref_cache["blocks.1.hook_resid_post"]),
                               atol=1e-5)


def test_sharded_sae_train_step_matches_single(mesh):
    cfg = SAERunnerConfig(d_in=32, expansion_factor=8, train_batch_size=64,
                          lr=1e-3, lr_scheduler_name="constant",
                          b_dec_init_method="zeros", log_to_wandb=False)
    state = init_train_state(cfg, key=jax.random.PRNGKey(0))
    batch = jax.random.normal(jax.random.PRNGKey(1), (64, 32))

    # single-device result
    s_single, m_single = sae_train_step(
        init_train_state(cfg, key=jax.random.PRNGKey(0)), batch, cfg)

    place, step = shard_sae_train_step(cfg, mesh, state)
    state_sh = place(state)
    s_sharded, m_sharded = step(state_sh, jax.device_put(batch, batch_sharding(mesh)))

    np.testing.assert_allclose(float(m_sharded.loss), float(m_single.loss),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(s_sharded.params["W_enc"]),
                               np.asarray(s_single.params["W_enc"]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(s_sharded.act_freq_scores),
                               np.asarray(s_single.act_freq_scores), atol=1e-5)
    # multiple steps keep working (donated, resharded)
    for i in range(3):
        b = jax.device_put(jax.random.normal(jax.random.PRNGKey(2 + i), (64, 32)),
                           batch_sharding(mesh))
        s_sharded, m = step(s_sharded, b)
    assert int(s_sharded.step) == 4


def test_sharded_sweep_step_matches_single(mesh):
    from vit_prisma_tpu.parallel import shard_sae_sweep_step, sweep_batch_sharding
    from vit_prisma_tpu.sae import init_sweep_state, sae_sweep_train_step

    cfg = SAERunnerConfig(d_in=32, expansion_factor=4, train_batch_size=64,
                          sweep_layers=(0, 1, 2, 3), lr=1e-3,
                          lr_scheduler_name="constant",
                          b_dec_init_method="zeros", log_to_wandb=False)
    state = init_sweep_state(cfg, 4, key=jax.random.PRNGKey(0))
    batch = jax.random.normal(jax.random.PRNGKey(1), (64, 4, 32))

    ref_state, ref_m = sae_sweep_train_step(
        init_sweep_state(cfg, 4, key=jax.random.PRNGKey(0)), batch, cfg)

    place, step = shard_sae_sweep_step(cfg, mesh, state)
    st = place(state)
    st, m = step(st, jax.device_put(batch, sweep_batch_sharding(mesh)))
    np.testing.assert_allclose(np.asarray(m.loss), np.asarray(ref_m.loss),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(st.params["W_enc"]),
                               np.asarray(ref_state.params["W_enc"]),
                               atol=1e-5)
    # keeps running when donated/resharded
    st, m = step(st, jax.device_put(
        jax.random.normal(jax.random.PRNGKey(2), (64, 4, 32)),
        sweep_batch_sharding(mesh)))
    assert int(st.step[0]) == 2


def test_public_api_sharded_run_matches_single(mesh):
    """A user-facing mesh= run — store harvest, buffer, refills, trainer
    steps — must match the single-device trainer numerically."""
    from vit_prisma_tpu.sae import (VisionActivationsStore, VisionSAETrainer)

    vcfg = ViTConfig(n_layers=2, d_model=32, d_head=8, n_heads=4, d_mlp=64,
                     patch_size=8, image_size=16, n_classes=8,
                     return_type="logits")
    model = HookedViT(vcfg, key=jax.random.PRNGKey(0))
    scfg = SAERunnerConfig(
        d_in=32, expansion_factor=8, context_size=vcfg.n_tokens,
        hook_point_layer=1, layer_subtype="hook_resid_post",
        store_batch_size=8, n_batches_in_buffer=2, train_batch_size=40,
        total_training_images=100_000, lr=1e-3,
        lr_scheduler_name="constant", b_dec_init_method="zeros",
        log_to_wandb=False, feature_sampling_window=10_000)
    images = np.random.default_rng(0).normal(
        size=(64, 3, 16, 16)).astype(np.float32)

    def run(mesh_arg):
        m = HookedViT(vcfg, key=jax.random.PRNGKey(0))
        store = VisionActivationsStore(scfg, m, images, mesh=mesh_arg)
        trainer = VisionSAETrainer(scfg, model=m, store=store)
        # enough steps to force at least one refill cycle
        steps = store.buffer.shape[0] // 2 // scfg.train_batch_size + 4
        trainer.run(max_steps=steps)
        return trainer

    t_sharded = run(mesh)
    t_single = run(None)
    assert int(t_sharded.state.step) == int(t_single.state.step)
    np.testing.assert_allclose(
        np.asarray(t_sharded.state.params["W_enc"]),
        np.asarray(t_single.state.params["W_enc"]), atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(t_sharded.state.act_freq_scores),
        np.asarray(t_single.state.act_freq_scores), atol=1e-4)


def test_public_api_sharded_sweep_matches_single(mesh):
    """mesh= through SAESweepTrainer: layer-parallel sweep numerics match
    the single-device sweep."""
    from vit_prisma_tpu.sae import (SAESweepTrainer, VisionActivationsStore)

    vcfg = ViTConfig(n_layers=4, d_model=32, d_head=8, n_heads=4, d_mlp=64,
                     patch_size=8, image_size=16, n_classes=8,
                     return_type="logits")
    scfg = SAERunnerConfig(
        d_in=32, expansion_factor=4, context_size=vcfg.n_tokens,
        sweep_layers=(0, 1, 2, 3), layer_subtype="hook_resid_post",
        store_batch_size=8, n_batches_in_buffer=2, train_batch_size=40,
        total_training_images=100_000, lr=1e-3,
        lr_scheduler_name="constant", b_dec_init_method="zeros",
        log_to_wandb=False, feature_sampling_window=10_000)
    images = np.random.default_rng(0).normal(
        size=(64, 3, 16, 16)).astype(np.float32)

    def run(mesh_arg):
        m = HookedViT(vcfg, key=jax.random.PRNGKey(0))
        store = VisionActivationsStore(scfg, m, images, mesh=mesh_arg)
        trainer = SAESweepTrainer(scfg, model=m, store=store)
        trainer.run(max_steps=6)
        return trainer

    t_sharded = run(mesh)
    t_single = run(None)
    np.testing.assert_allclose(
        np.asarray(t_sharded.state.params["W_enc"]),
        np.asarray(t_single.state.params["W_enc"]), atol=1e-4)


def test_hooked_vit_shard_api(mesh):
    """Model-level mesh placement: HookedViT.shard(mesh) keeps forward and
    cached forward numerically identical to single-device."""
    cfg = ViTConfig(n_layers=2, d_model=16, d_head=4, n_heads=4, d_mlp=32,
                    patch_size=4, image_size=16, n_classes=8,
                    return_type="logits")
    single = HookedViT(cfg, key=jax.random.PRNGKey(0))
    sharded = HookedViT(cfg, key=jax.random.PRNGKey(0)).shard(mesh)
    x = jax.random.uniform(jax.random.PRNGKey(1), (8, 3, 16, 16))
    np.testing.assert_allclose(np.asarray(single(x)),
                               np.asarray(sharded(x)), atol=1e-5)
    _, c1 = single.run_with_cache(x, names_filter="blocks.1.hook_resid_post",
                                  return_cache_object=False)
    _, c2 = sharded.run_with_cache(x, names_filter="blocks.1.hook_resid_post",
                                   return_cache_object=False)
    np.testing.assert_allclose(
        np.asarray(c1["blocks.1.hook_resid_post"]),
        np.asarray(c2["blocks.1.hook_resid_post"]), atol=1e-5)


def test_scan_forward_under_mesh(mesh):
    """The lax.scan block loop composes with GSPMD sharding."""
    cfg = ViTConfig(n_layers=16, d_model=16, d_head=4, n_heads=4, d_mlp=32,
                    patch_size=4, image_size=16, n_classes=8,
                    return_type="logits", scan_blocks="always")
    single = HookedViT(cfg, key=jax.random.PRNGKey(0))
    sharded = HookedViT(cfg, key=jax.random.PRNGKey(0)).shard(mesh)
    x = jax.random.uniform(jax.random.PRNGKey(1), (8, 3, 16, 16))
    np.testing.assert_allclose(np.asarray(single(x)),
                               np.asarray(sharded(x)), atol=1e-4)


def test_shard_invalidates_jit_cache():
    """Programs compiled before shard() captured unsharded inputs —
    shard() must retrace.  The fused attention kernel stays ON under the
    mesh (custom_partitioning, ops/attention.py)."""
    import jax
    from vit_prisma_tpu import HookedViT, ViTConfig
    from vit_prisma_tpu.parallel.mesh import make_mesh

    cfg = ViTConfig(n_layers=2, d_model=32, d_head=8, n_heads=4, d_mlp=64,
                    patch_size=8, image_size=16, n_classes=5,
                    return_type="class_logits")
    model = HookedViT(cfg, key=jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 3, 16, 16))
    model(x)  # warm the pre-shard cache
    assert model._jit_cache
    model.shard(make_mesh(data=2, model=4))
    assert not model._jit_cache          # dropped
    assert model.cfg.use_fused_attention  # kernel partitions; stays on
    out = model(x)                       # recompiles with the sharded cfg
    assert out.shape == (4, 5)


def test_fused_mix_partitions_over_batch_and_heads(mesh):
    """The attention-mix custom_partitioning: with q/k/v sharded
    (data, None, model) over [B, T, N*H], each device must run the
    unmodified kernel on its batch/head-block shard — numerics equal to
    the unsharded call, and the partitioned lowering must actually split
    (checked via the compiled HLO's local shapes)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from vit_prisma_tpu.ops.attention import attention_mix_tnh

    B, T, N, H = 8, 6, 8, 4
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q, k, v = (jax.random.normal(kk, (B, T, N * H)) for kk in ks)
    ref = attention_mix_tnh(q, k, v, N, False)

    sh = NamedSharding(mesh, P("data", None, "model"))
    args = [jax.device_put(a, sh) for a in (q, k, v)]
    fn = jax.jit(lambda a, b, c: attention_mix_tnh(a, b, c, N, False),
                 in_shardings=(sh, sh, sh), out_shardings=sh)
    out = fn(*args)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)
    # the output really is sharded over both axes (not replicated)
    assert out.sharding.spec == P("data", None, "model")


def test_fused_mix_backward_partitions(mesh):
    """Gradients through the fused mix under a (data, None, model)
    sharding: the backward Pallas kernel has its own custom_partitioning,
    so the sharded grad must equal the single-device grad with no
    replication fallback."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from vit_prisma_tpu.ops.attention import attention_mix_tnh

    B, T, N, H = 8, 6, 8, 4
    ks = jax.random.split(jax.random.PRNGKey(2), 3)
    q, k, v = (jax.random.normal(kk, (B, T, N * H)) for kk in ks)

    def loss(a, b, c):
        return jnp.sum(jnp.sin(attention_mix_tnh(a, b, c, N, False)))

    ref = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    sh = NamedSharding(mesh, P("data", None, "model"))
    args = [jax.device_put(a, sh) for a in (q, k, v)]
    got = jax.jit(jax.grad(loss, argnums=(0, 1, 2)),
                  in_shardings=(sh, sh, sh),
                  out_shardings=(sh, sh, sh))(*args)
    for g, r in zip(got, ref):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r), atol=1e-6)
        assert g.sharding.spec == P("data", None, "model")


def test_flash_padded_partitions(mesh):
    """The video-scale flash path partitions over batch and heads (heads
    are a whole dim in its [B, N, T, H] layout) in BOTH directions; the
    sharded forward and grads must equal single-device."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from vit_prisma_tpu.ops.attention import flash_attention_padded

    B, N, Tp, H = 8, 4, 128, 8
    T = 100
    ks = jax.random.split(jax.random.PRNGKey(3), 3)
    q, k, v = (jax.random.normal(kk, (B, N, Tp, H)) for kk in ks)
    seg = jnp.broadcast_to(
        jnp.where(jnp.arange(Tp) < T, 1, 2)[None].astype(jnp.int32),
        (B, Tp))

    def loss(a, b, c):
        return jnp.sum(jnp.sin(
            flash_attention_padded(a, b, c, seg, False)[:, :, :T]))

    fwd_ref = flash_attention_padded(q, k, v, seg, False)
    grad_ref = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)

    sh = NamedSharding(mesh, P("data", "model", None, None))
    args = [jax.device_put(a, sh) for a in (q, k, v)]
    fwd = jax.jit(lambda a, b, c: flash_attention_padded(a, b, c, seg,
                                                         False),
                  in_shardings=(sh, sh, sh), out_shardings=sh)(*args)
    np.testing.assert_allclose(np.asarray(fwd), np.asarray(fwd_ref),
                               atol=1e-6)
    assert fwd.sharding.spec == P("data", "model", None, None)
    got = jax.jit(jax.grad(loss, argnums=(0, 1, 2)),
                  in_shardings=(sh, sh, sh),
                  out_shardings=(sh, sh, sh))(*args)
    for g, r in zip(got, grad_ref):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r), atol=1e-6)
        assert g.sharding.spec == P("data", "model", None, None)


def test_sharded_incl_bwd_matches_single(mesh):
    """Attribution under the mesh: run_with_cache(incl_bwd=True) on a
    sharded model must produce the single-device activations AND gradient
    cache entries (the grad path crosses both the forward and backward
    custom_partitioning rules)."""
    cfg = ViTConfig(n_layers=2, d_model=16, d_head=4, n_heads=4, d_mlp=32,
                    patch_size=4, image_size=16, n_classes=8,
                    return_type="logits")
    model = HookedViT(cfg, key=jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(1), (8, 3, 16, 16))
    flt = lambda n: n.endswith("hook_resid_post")
    _, ref = model.run_with_cache(x, names_filter=flt, incl_bwd=True,
                                  return_cache_object=False)
    assert any(k.endswith("_grad") for k in ref)
    model.shard(mesh)
    x_sh = jax.device_put(x, batch_sharding(mesh))
    _, got = model.run_with_cache(x_sh, names_filter=flt, incl_bwd=True,
                                  return_cache_object=False)
    assert set(got) == set(ref)
    for k in ref:
        np.testing.assert_allclose(np.asarray(got[k]), np.asarray(ref[k]),
                                   atol=1e-5, err_msg=k)


def test_fused_mix_head_misaligned_falls_back_replicated(mesh):
    """A 'model' sharding that does NOT split on head boundaries must snap
    to replicated heads (correctness over parallelism) — numerics still
    exact."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from vit_prisma_tpu.ops.attention import attention_mix_tnh

    B, T, N, H = 8, 5, 3, 8   # N*H=24; 4-way model split -> 6, not %8
    ks = jax.random.split(jax.random.PRNGKey(1), 3)
    q, k, v = (jax.random.normal(kk, (B, T, N * H)) for kk in ks)
    ref = attention_mix_tnh(q, k, v, N, False)
    sh = NamedSharding(mesh, P("data", None, "model"))
    args = [jax.device_put(a, sh) for a in (q, k, v)]
    out = jax.jit(lambda a, b, c: attention_mix_tnh(a, b, c, N, False),
                  in_shardings=(sh, sh, sh))(*args)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)


class _StubDev:
    """Minimal device stand-in for the multi-slice ordering logic."""
    def __init__(self, i, slice_index=None, process_index=0):
        self.id = i
        self.process_index = process_index
        if slice_index is not None:
            self.slice_index = slice_index

    def __repr__(self):
        return f"dev{self.id}@s{getattr(self, 'slice_index', '?')}"


class TestMultisliceMesh:
    def test_model_axis_never_crosses_slices(self):
        from vit_prisma_tpu.parallel.mesh import multislice_device_array
        # 2 slices x 8 devices, interleaved enumeration order
        devs = [_StubDev(i, slice_index=i % 2) for i in range(16)]
        arr = multislice_device_array(devs, model=4)
        assert arr.shape == (4, 4)  # data = 2 slices x (8/4) groups
        for row in arr:
            slices = {d.slice_index for d in row}
            assert len(slices) == 1, f"model row crosses slices: {row}"
        # data axis keeps same-slice replicas adjacent (hierarchical
        # all-reduce does the intra-slice hop first)
        data_slice_ids = [row[0].slice_index for row in arr]
        assert data_slice_ids == sorted(data_slice_ids)
        # every device used exactly once
        assert {d.id for d in arr.ravel()} == {d.id for d in devs}

    def test_process_index_fallback(self):
        from vit_prisma_tpu.parallel.mesh import multislice_device_array
        devs = [_StubDev(i, process_index=i // 4) for i in range(8)]
        arr = multislice_device_array(devs, model=2)
        for row in arr:
            assert len({d.process_index for d in row}) == 1

    def test_model_must_fit_one_slice(self):
        from vit_prisma_tpu.parallel.mesh import multislice_device_array
        devs = [_StubDev(i, slice_index=i // 4) for i in range(8)]
        with pytest.raises(ValueError, match="model"):
            multislice_device_array(devs, model=8)

    def test_uneven_slices_rejected(self):
        from vit_prisma_tpu.parallel.mesh import multislice_device_array
        devs = [_StubDev(i, slice_index=0) for i in range(4)] + \
               [_StubDev(9, slice_index=1)]
        with pytest.raises(ValueError, match="uneven"):
            multislice_device_array(devs, model=1)

    def test_single_slice_reduces_to_make_mesh(self, mesh):
        """On one slice (this CPU platform) the multislice mesh is the
        plain (data, model) mesh, and a sharded forward runs on it."""
        import jax
        from vit_prisma_tpu import HookedViT, ViTConfig
        from vit_prisma_tpu.parallel.mesh import (make_mesh,
                                                  make_multislice_mesh)
        ms = make_multislice_mesh(model=4)
        assert ms.shape == {"data": 2, "model": 4}
        assert [d.id for d in ms.devices.ravel()] == \
            [d.id for d in make_mesh(data=2, model=4).devices.ravel()]
        cfg = ViTConfig(n_layers=2, d_model=32, d_head=8, n_heads=4,
                        d_mlp=64, patch_size=8, image_size=16, n_classes=5,
                        return_type="class_logits")
        model = HookedViT(cfg, key=jax.random.PRNGKey(0)).shard(ms)
        out = model(jnp.zeros((4, 3, 16, 16)))
        assert out.shape == (4, 5)

    def test_distributed_init_single_process_noop(self):
        """Single-process (no coordinator configured): returns False and
        leaves the runtime usable; calling twice is safe."""
        from vit_prisma_tpu.parallel.mesh import distributed_init
        assert distributed_init() is False
        assert distributed_init() is False
        assert len(jax.devices()) == 8  # platform untouched
