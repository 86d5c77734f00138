"""Perf-path correctness: the fused Pallas attention mix and the lax.scan
block loop must be numerically faithful to the unrolled einsum forward."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vit_prisma_tpu import HookedViT, ViTConfig
from vit_prisma_tpu.models.vit import vit_forward
from vit_prisma_tpu.ops.attention import (_mix_forward, attention_mix,
                                          attention_mix_reference)
from vit_prisma_tpu.prisma.hooks import HookRuntime


def tiny_cfg(**kw):
    base = dict(n_layers=4, d_model=32, d_head=8, n_heads=4, d_mlp=64,
                patch_size=8, image_size=32, n_classes=10,
                activation_name="gelu", return_type="logits")
    base.update(kw)
    return ViTConfig(**base)


class TestFusedAttentionKernel:
    def setup_method(self):
        k = jax.random.PRNGKey
        self.q = jax.random.normal(k(0), (4, 4, 10, 8), jnp.float32)
        self.k = jax.random.normal(k(1), (4, 4, 10, 8), jnp.float32)
        self.v = jax.random.normal(k(2), (4, 4, 10, 8), jnp.float32)

    def test_forward_matches_reference(self):
        z = jax.jit(attention_mix)(self.q, self.k, self.v)
        ref = attention_mix_reference(self.q, self.k, self.v)
        np.testing.assert_allclose(np.asarray(z), np.asarray(ref), atol=1e-5)

    @pytest.mark.parametrize("g", [1, 2, 4])
    def test_head_grouping_exact(self, g):
        """Cross-head blocks are masked out; any grouping is equivalent."""
        z = jax.jit(lambda q, k, v: _mix_forward(q, k, v, head_group=g))(
            self.q, self.k, self.v)
        ref = attention_mix_reference(self.q, self.k, self.v)
        np.testing.assert_allclose(np.asarray(z), np.asarray(ref), atol=1e-5)

    def test_gradients_match_reference(self):
        def loss(f):
            return lambda q, k, v: jnp.sum(jnp.sin(f(q, k, v)))
        g1 = jax.grad(loss(attention_mix), argnums=(0, 1, 2))(
            self.q, self.k, self.v)
        g2 = jax.grad(loss(attention_mix_reference), argnums=(0, 1, 2))(
            self.q, self.k, self.v)
        for a, b in zip(g1, g2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-5)


class TestFusedModelPath:
    def test_model_forward_matches_unfused(self):
        cfg_f = tiny_cfg(use_fused_attention=True)
        cfg_u = tiny_cfg(use_fused_attention=False)
        model = HookedViT(cfg_f, key=jax.random.PRNGKey(0))
        x = jax.random.uniform(jax.random.PRNGKey(1), (2, 3, 32, 32))
        of = vit_forward(model.params, cfg_f, x)
        ou = vit_forward(model.params, cfg_u, x)
        np.testing.assert_allclose(np.asarray(of), np.asarray(ou), atol=1e-5)

    def test_attention_hooks_force_exact_path(self):
        """Requesting any attention-internal hook must disengage the fused
        kernel and produce the exact einsum-path values."""
        cfg_f = tiny_cfg(use_fused_attention=True)
        cfg_u = tiny_cfg(use_fused_attention=False)
        model = HookedViT(cfg_f, key=jax.random.PRNGKey(0))
        x = jax.random.uniform(jax.random.PRNGKey(1), (2, 3, 32, 32))
        name = "blocks.0.attn.hook_pattern"
        rt_f = HookRuntime(names_filter=name)
        vit_forward(model.params, cfg_f, x, rt_f)
        rt_u = HookRuntime(names_filter=name)
        vit_forward(model.params, cfg_u, x, rt_u)
        # layer 0 sees identical inputs, so its exact-path internals are
        # bitwise equal; later layers may differ by kernel-vs-einsum
        # rounding upstream.
        np.testing.assert_array_equal(np.asarray(rt_f.cache[name]),
                                      np.asarray(rt_u.cache[name]))
        name1 = "blocks.1.attn.hook_pattern"
        rt_f1 = HookRuntime(names_filter=name1)
        vit_forward(model.params, cfg_f, x, rt_f1)
        rt_u1 = HookRuntime(names_filter=name1)
        vit_forward(model.params, cfg_u, x, rt_u1)
        np.testing.assert_allclose(np.asarray(rt_f1.cache[name1]),
                                   np.asarray(rt_u1.cache[name1]), atol=1e-5)

    def test_intervention_on_pattern_still_works(self):
        cfg = tiny_cfg(use_fused_attention=True)
        model = HookedViT(cfg, key=jax.random.PRNGKey(0))
        x = jax.random.uniform(jax.random.PRNGKey(1), (2, 3, 32, 32))
        base = model(x)
        out = model.run_with_hooks(
            x, fwd_hooks=[("blocks.0.attn.hook_pattern",
                           lambda v, h: jnp.zeros_like(v))])
        assert not np.allclose(np.asarray(base), np.asarray(out))


class TestScanForward:
    def setup_method(self):
        self.cfg_s = tiny_cfg(scan_blocks="always")
        self.cfg_u = tiny_cfg(scan_blocks="never")
        self.model = HookedViT(self.cfg_s, key=jax.random.PRNGKey(0))
        self.x = jax.random.uniform(jax.random.PRNGKey(1), (2, 3, 32, 32))

    def test_forward_matches_unrolled(self):
        os_ = vit_forward(self.model.params, self.cfg_s, self.x)
        ou = vit_forward(self.model.params, self.cfg_u, self.x)
        np.testing.assert_allclose(np.asarray(os_), np.asarray(ou), atol=1e-5)

    def test_full_cache_matches_unrolled(self):
        rt_s = HookRuntime(names_filter=None)
        vit_forward(self.model.params, self.cfg_s, self.x, rt_s)
        rt_u = HookRuntime(names_filter=None)
        vit_forward(self.model.params, self.cfg_u, self.x, rt_u)
        assert set(rt_s.cache) == set(rt_u.cache)
        for k in rt_u.cache:
            np.testing.assert_allclose(np.asarray(rt_s.cache[k]),
                                       np.asarray(rt_u.cache[k]),
                                       atol=1e-5, err_msg=k)

    def test_subset_filter(self):
        rt = HookRuntime(names_filter="blocks.2.hook_resid_post")
        vit_forward(self.model.params, self.cfg_s, self.x, rt)
        assert list(rt.cache) == ["blocks.2.hook_resid_post"]

    def test_stop_at_layer(self):
        r1 = vit_forward(self.model.params, self.cfg_s, self.x, stop_at_layer=2)
        r2 = vit_forward(self.model.params, self.cfg_u, self.x, stop_at_layer=2)
        np.testing.assert_allclose(np.asarray(r1), np.asarray(r2), atol=1e-5)

    @pytest.mark.slow
    def test_gradients_match_unrolled(self):
        def loss(cfg):
            return lambda p: jnp.sum(
                jnp.sin(vit_forward(p, cfg, self.x)))
        g1 = jax.tree.leaves(jax.grad(loss(self.cfg_s))(self.model.params))
        g2 = jax.tree.leaves(jax.grad(loss(self.cfg_u))(self.model.params))
        for a, b in zip(g1, g2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-4)

    def test_editors_force_unrolled(self):
        """Intervention hooks are per-layer — the scan gate must yield."""
        cfg = tiny_cfg(scan_blocks="auto", n_layers=16, d_model=16, d_head=4,
                       n_heads=4, d_mlp=32)
        model = HookedViT(cfg, key=jax.random.PRNGKey(0))
        base = model(self.x)
        out = model.run_with_hooks(
            self.x, fwd_hooks=[("blocks.7.hook_resid_post",
                                lambda v, h: v * 0.0)])
        assert not np.allclose(np.asarray(base), np.asarray(out))

    def test_bert_block_scan(self):
        cfg_s = tiny_cfg(scan_blocks="always", use_bert_block=True)
        cfg_u = tiny_cfg(scan_blocks="never", use_bert_block=True)
        model = HookedViT(cfg_s, key=jax.random.PRNGKey(0))
        os_ = vit_forward(model.params, cfg_s, self.x)
        ou = vit_forward(model.params, cfg_u, self.x)
        np.testing.assert_allclose(np.asarray(os_), np.asarray(ou), atol=1e-5)

    def test_dropout_under_scan(self):
        cfg = dataclasses.replace(self.cfg_s, attn_dropout_rate=0.5)
        d1 = vit_forward(self.model.params, cfg, self.x,
                         dropout_key=jax.random.PRNGKey(3))
        d2 = vit_forward(self.model.params, cfg, self.x,
                         dropout_key=jax.random.PRNGKey(4))
        assert not np.allclose(np.asarray(d1), np.asarray(d2))


class TestCausalFusedPath:
    def test_causal_kernel_matches_masked_einsum(self):
        from vit_prisma_tpu.ops.attention import attention_mix_tnh
        B, N, T, H = 2, 4, 12, 8
        k = jax.random.PRNGKey
        q = jax.random.normal(k(0), (B, T, N * H), jnp.float32)
        kk = jax.random.normal(k(1), (B, T, N * H), jnp.float32)
        v = jax.random.normal(k(2), (B, T, N * H), jnp.float32)
        z = jax.jit(lambda *a: attention_mix_tnh(*a, N, True))(q, kk, v)

        def ref(q, kk, v):
            qf = q.reshape(B, T, N, H)
            kf = kk.reshape(B, T, N, H)
            vf = v.reshape(B, T, N, H)
            s = jnp.einsum("bqnh,bknh->bnqk", qf, kf)
            tri = jnp.tril(jnp.ones((T, T), bool))
            s = jnp.where(tri[None, None], s, -jnp.inf)
            p = jax.nn.softmax(s, axis=-1)
            zf = jnp.einsum("bnqk,bknh->bqnh", p, vf)
            return zf.reshape(B, T, N * H)

        np.testing.assert_allclose(np.asarray(z), np.asarray(ref(q, kk, v)),
                                   atol=1e-5)
        # gradients through the causal custom VJP
        g1 = jax.grad(lambda q: jnp.sum(
            jnp.sin(attention_mix_tnh(q, kk, v, N, True))))(q)
        g2 = jax.grad(lambda q: jnp.sum(jnp.sin(ref(q, kk, v))))(q)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-5)

    def test_text_tower_fused_matches_unfused(self):
        from vit_prisma_tpu.configs.vit_config import TextTransformerConfig
        from vit_prisma_tpu.models.text import init_text_params, text_forward
        import dataclasses
        cfg_f = TextTransformerConfig(
            n_layers=2, d_model=32, d_head=8, n_heads=4, d_mlp=64,
            n_classes=16, vocab_size=50, context_length=12,
            causal_attention=True, normalization_type="LN",
            return_type="class_logits", use_fused_attention=True)
        cfg_u = dataclasses.replace(cfg_f, use_fused_attention=False)
        params = init_text_params(cfg_f, jax.random.PRNGKey(0))
        tokens = jax.random.randint(jax.random.PRNGKey(1), (3, 12), 1, 50)
        of = text_forward(params, cfg_f, tokens)
        ou = text_forward(params, cfg_u, tokens)
        np.testing.assert_allclose(np.asarray(of), np.asarray(ou), atol=1e-5)


class TestBackwardMixKernel:
    """The Pallas backward kernel must reproduce the exact einsum softmax
    VJP (fp32 inputs -> tight tolerance; the kernel is the default VJP of
    attention_mix_tnh)."""

    def setup_method(self):
        k = jax.random.PRNGKey
        self.B, self.N, self.T, self.H = 3, 4, 10, 8
        shape = (self.B, self.T, self.N * self.H)
        self.q = jax.random.normal(k(0), shape, jnp.float32)
        self.k = jax.random.normal(k(1), shape, jnp.float32)
        self.v = jax.random.normal(k(2), shape, jnp.float32)
        self.dz = jax.random.normal(k(3), shape, jnp.float32)

    @pytest.mark.parametrize("causal", [False, True])
    def test_kernel_matches_einsum_vjp(self, causal):
        from vit_prisma_tpu.ops.attention import (_mix_tnh_backward,
                                                  _mix_tnh_bwd_reference)
        got = jax.jit(lambda *a: _mix_tnh_backward(*a, self.N, causal))(
            self.q, self.k, self.v, self.dz)
        ref = _mix_tnh_bwd_reference(self.q, self.k, self.v, self.dz,
                                     self.N, causal)
        for g, r in zip(got, ref):
            np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                       atol=1e-5)

    def test_custom_vjp_grads_match_reference_fn(self):
        from vit_prisma_tpu.ops.attention import attention_mix_tnh
        B, T, N, H = self.B, self.T, self.N, self.H

        def ref(q, kk, v):
            qf = q.reshape(B, T, N, H)
            kf = kk.reshape(B, T, N, H)
            vf = v.reshape(B, T, N, H)
            s = jnp.einsum("bqnh,bknh->bnqk", qf, kf)
            p = jax.nn.softmax(s, axis=-1)
            return jnp.einsum("bnqk,bknh->bqnh", p, vf).reshape(B, T, N * H)

        loss = lambda f: lambda q, kk, v: jnp.sum(jnp.sin(f(q, kk, v)))
        g1 = jax.jit(jax.grad(loss(
            lambda q, kk, v: attention_mix_tnh(q, kk, v, N, False)),
            argnums=(0, 1, 2)))(self.q, self.k, self.v)
        g2 = jax.grad(loss(ref), argnums=(0, 1, 2))(self.q, self.k, self.v)
        for a, b in zip(g1, g2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-5)

    def test_model_train_grads_match_unfused(self):
        """End-to-end: param gradients of a training-style loss through the
        fused path (Pallas fwd + Pallas bwd) match the unfused einsum model
        at fp32."""
        cfg_f = tiny_cfg(use_fused_attention=True)
        cfg_u = tiny_cfg(use_fused_attention=False)
        model = HookedViT(cfg_f, key=jax.random.PRNGKey(0))
        x = jax.random.uniform(jax.random.PRNGKey(1), (2, 3, 32, 32))

        def loss(cfg):
            return lambda p: jnp.sum(jnp.sin(vit_forward(p, cfg, x)))

        gf = jax.jit(jax.grad(loss(cfg_f)))(model.params)
        gu = jax.grad(loss(cfg_u))(model.params)
        flat_f, _ = jax.tree.flatten(gf)
        flat_u, _ = jax.tree.flatten(gu)
        for a, b in zip(flat_f, flat_u):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=2e-4)


class TestVmemFitGate:
    """Video-scale token axes must route to the einsum path: the Pallas
    kernels' per-head fp32 score temporaries (~5*T*T*4 bytes backward)
    exceed the ~16MB/core VMEM there — a real-chip constraint the CPU
    interpret mode cannot catch, so the gate itself is the testable
    surface."""

    def test_fit_gate_shapes(self):
        from vit_prisma_tpu.ops.attention import mix_tnh_fits_vmem
        assert mix_tnh_fits_vmem(50, 768, 2)      # CLIP ViT-B/32
        assert mix_tnh_fits_vmem(257, 1024, 2)    # ViT-L/14
        assert mix_tnh_fits_vmem(77, 512, 2)      # text tower
        assert not mix_tnh_fits_vmem(1569, 768, 2)   # ViViT 16-frame
        assert not mix_tnh_fits_vmem(3137, 1024, 2)  # V-JEPA-scale

    def test_video_scale_routes_to_flash(self, monkeypatch):
        """A fused-config forward whose T fails the gate must never call
        the whole-T kernel — it takes the tiled flash path instead, and
        must still match the unfused einsum model."""
        import vit_prisma_tpu.ops.attention as A

        def boom(*a, **k):
            raise AssertionError("whole-T kernel taken at video scale")

        # 232/8 -> 29x29+1 = 842 tokens; NH=32: backward temporaries
        # ~15MB > the 13MB budget, so the gate must refuse.
        cfg_f = tiny_cfg(n_layers=2, image_size=232,
                         use_fused_attention=True)
        cfg_u = tiny_cfg(n_layers=2, image_size=232,
                         use_fused_attention=False)
        assert not A.mix_tnh_fits_vmem(842, 32, 4)
        model = HookedViT(cfg_f, key=jax.random.PRNGKey(0))
        x = jax.random.uniform(jax.random.PRNGKey(1), (1, 3, 232, 232))
        monkeypatch.setattr(A, "attention_mix_tnh", boom)
        called = {}
        orig = A.flash_attention_padded

        def spy(*a, **k):
            called["flash"] = True
            return orig(*a, **k)

        monkeypatch.setattr(A, "flash_attention_padded", spy)
        out_f = vit_forward(model.params, cfg_f, x)
        assert called.get("flash"), "flash path not taken at video scale"
        monkeypatch.undo()
        out_u = vit_forward(model.params, cfg_u, x)
        np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_u),
                                   atol=1e-5)

    def test_video_scale_gradients(self):
        """Param grads through the flash path (video-scale T) match the
        unfused einsum model — training and incl_bwd attribution on video
        models stay correct."""
        cfg_f = tiny_cfg(n_layers=1, image_size=232,
                         use_fused_attention=True)
        cfg_u = tiny_cfg(n_layers=1, image_size=232,
                         use_fused_attention=False)
        model = HookedViT(cfg_f, key=jax.random.PRNGKey(0))
        x = jax.random.uniform(jax.random.PRNGKey(1), (1, 3, 232, 232))

        def loss(cfg):
            return lambda p: jnp.sum(jnp.sin(vit_forward(p, cfg, x)))

        gf = jax.jit(jax.grad(loss(cfg_f)))(model.params)
        gu = jax.grad(loss(cfg_u))(model.params)
        for a, b in zip(*map(lambda t: jax.tree.flatten(t)[0], (gf, gu))):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=2e-4)


class TestFlashPaddedKernel:
    """flash_attention_padded: exact softmax attention at any T via
    pad-to-128 + segment-id masking (fwd, bwd, causal)."""

    def setup_method(self):
        ks = jax.random.split(jax.random.PRNGKey(0), 3)
        self.B, self.N, self.T, self.H = 2, 2, 200, 32
        self.Tp = 256
        self.q, self.k, self.v = (
            jax.random.normal(kk, (self.B, self.N, self.T, self.H))
            for kk in ks)

    def _ein(self, q, k, v, causal):
        T = self.T
        s = jnp.einsum("bnqh,bnkh->bnqk", q, k)
        if causal:
            tri = jnp.tril(jnp.ones((T, T), bool))
            s = jnp.where(tri[None, None], s, -jnp.inf)
        return jnp.einsum("bnqk,bnkh->bnqh", jax.nn.softmax(s, -1), v)

    def _flash(self, q, k, v, causal):
        from vit_prisma_tpu.ops.attention import flash_attention_padded
        T, Tp, B = self.T, self.Tp, self.B
        pad = ((0, 0), (0, 0), (0, Tp - T), (0, 0))
        qp, kp, vp = (jnp.pad(a, pad) for a in (q, k, v))
        seg = jnp.broadcast_to(
            jnp.where(jnp.arange(Tp) < T, 1, 2)[None].astype(jnp.int32),
            (B, Tp))
        return flash_attention_padded(qp, kp, vp, seg, causal)[:, :, :T]

    @pytest.mark.parametrize("causal", [False, True])
    def test_matches_einsum(self, causal):
        z = jax.jit(lambda a, b, c: self._flash(a, b, c, causal))(
            self.q, self.k, self.v)
        r = self._ein(self.q, self.k, self.v, causal)
        np.testing.assert_allclose(np.asarray(z), np.asarray(r), atol=1e-5)

    @pytest.mark.parametrize("causal", [False, True])
    def test_grads_match_einsum(self, causal):
        lf = lambda f: lambda a, b, c: jnp.sum(jnp.sin(f(a, b, c, causal)))
        g1 = jax.jit(jax.grad(lf(self._flash), argnums=(0, 1, 2)))(
            self.q, self.k, self.v)
        g2 = jax.grad(lf(self._ein), argnums=(0, 1, 2))(
            self.q, self.k, self.v)
        for a, b in zip(g1, g2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-4)


class TestShuffleKernel:
    def test_take_rows_matches_jnp_take(self):
        from vit_prisma_tpu.ops.shuffle import permute_rows, take_rows
        x = jax.random.normal(jax.random.PRNGKey(0), (64, 24, 128))
        idx = jax.random.permutation(jax.random.PRNGKey(1), 64)
        np.testing.assert_array_equal(np.asarray(take_rows(x, idx)),
                                      np.asarray(jnp.take(x, idx, axis=0)))
        p = permute_rows(jax.random.PRNGKey(2), x)
        # a permutation: same multiset of rows (exact — rows move whole)
        np.testing.assert_array_equal(
            np.sort(np.asarray(p).reshape(64, -1), axis=0),
            np.sort(np.asarray(x).reshape(64, -1), axis=0))

    def test_store_mix_still_exact_mixing(self):
        """The store's refill keeps the unserved half + fresh rows (in some
        order) after the Pallas-shuffle change."""
        from vit_prisma_tpu.sae import SAERunnerConfig, VisionActivationsStore
        vcfg = tiny_cfg()
        model = HookedViT(vcfg, key=jax.random.PRNGKey(0))
        scfg = SAERunnerConfig(
            d_in=32, expansion_factor=2, context_size=vcfg.n_tokens,
            hook_point_layer=1, store_batch_size=4, n_batches_in_buffer=2,
            train_batch_size=16, log_to_wandb=False,
            b_dec_init_method="zeros")
        images = np.random.default_rng(0).normal(
            size=(32, 3, 32, 32)).astype(np.float32)
        store = VisionActivationsStore(scfg, model, images)
        before = np.asarray(store.buffer)
        half_rows = {r.tobytes() for r in before[before.shape[0] // 2:]}
        store._refill_half()
        after = np.asarray(store.buffer)
        after_rows = {r.tobytes() for r in after}
        assert half_rows <= after_rows, "unserved half must be retained"
