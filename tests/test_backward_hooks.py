"""Backward-direction hooks: gradient caching (``incl_bwd=True``) and pure
gradient interventions (``bwd_hooks``) vs the PyTorch reference's
``dir="bwd"`` hook machinery
(/root/reference/src/vit_prisma/prisma_tools/hook_point.py:60-79,
hooked_root_module.py:255-287), loaded as a live oracle.

The reference caches ``{name}_grad`` by calling ``model_out.backward()``
(requires a single-element output), so the oracle comparisons use
n_classes=1 / batch=1 models; the JAX side's default seed (``out.sum()``,
a ones cotangent) is then identical."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vit_prisma_tpu import HookedViT, ViTConfig

from tests.test_equivalence_vit import make_pair

ATOL = 1e-4


def small_cfg(**kw):
    base = dict(n_layers=2, d_model=32, d_head=8, n_heads=4, d_mlp=64,
                image_size=16, patch_size=8, n_classes=1, model_name="test",
                return_type="logits",
                use_fused_attention=False, scan_blocks="never")
    base.update(kw)
    return ViTConfig(**base)


def run_both_bwd(jcfg, names_filter, seed=0):
    import torch
    ref, model = make_pair(jcfg, seed)
    torch.manual_seed(seed + 1)
    x_t = torch.randn(1, jcfg.n_channels, jcfg.image_size, jcfg.image_size)
    x_j = jnp.asarray(x_t.numpy())

    out_ref, cache_ref = ref.run_with_cache(
        x_t, names_filter=names_filter, return_cache_object=False,
        incl_bwd=True)
    out, cache = model.run_with_cache(x_j, names_filter=names_filter,
                                      return_cache_object=False,
                                      incl_bwd=True)
    return out, cache, out_ref, cache_ref


class TestGradCacheEquivalence:
    """Per-hook-name gradient equivalence at 1e-4 for the resid, attn and
    mlp hook classes (VERDICT r2 item 1's done-bar)."""

    def test_resid_class(self):
        names = lambda n: "resid" in n
        out, cache, out_ref, cache_ref = run_both_bwd(small_cfg(), names)
        grad_keys = [k for k in cache_ref if k.endswith("_grad")]
        assert grad_keys, "oracle produced no backward entries"
        assert sorted(k for k in cache if k.endswith("_grad")) == sorted(grad_keys)
        for k in grad_keys:
            np.testing.assert_allclose(
                np.asarray(cache[k]), cache_ref[k].detach().numpy(),
                atol=ATOL, err_msg=f"grad mismatch at {k}")

    def test_attn_class(self):
        names = lambda n: n.startswith("blocks.0.attn.") or n.startswith("blocks.1.attn.")
        out, cache, out_ref, cache_ref = run_both_bwd(small_cfg(), names)
        for k in [k for k in cache_ref if k.endswith("_grad")]:
            np.testing.assert_allclose(
                np.asarray(cache[k]), cache_ref[k].detach().numpy(),
                atol=ATOL, err_msg=f"grad mismatch at {k}")

    def test_mlp_class(self):
        names = lambda n: "mlp" in n
        out, cache, out_ref, cache_ref = run_both_bwd(
            small_cfg(use_hook_mlp_in=True), names)
        for k in [k for k in cache_ref if k.endswith("_grad")]:
            np.testing.assert_allclose(
                np.asarray(cache[k]), cache_ref[k].detach().numpy(),
                atol=ATOL, err_msg=f"grad mismatch at {k}")

    def test_embed_and_ln_class(self):
        names = lambda n: "embed" in n or "ln2" in n or "ln_final" in n
        out, cache, out_ref, cache_ref = run_both_bwd(small_cfg(), names)
        grad_keys = [k for k in cache_ref if k.endswith("_grad")]
        for k in grad_keys:
            np.testing.assert_allclose(
                np.asarray(cache[k]), cache_ref[k].detach().numpy(),
                atol=ATOL, err_msg=f"grad mismatch at {k}")

    def test_ln1_true_gradient(self):
        """The reference invokes ln1 THREE times per block (q/k/v inputs,
        transformer_block.py:107-109), so its backward hook clobbers the
        ``ln1.hook_normalized_grad`` cache entry with the query-path
        cotangent only.  We fire the hook once on the shared tensor, so our
        entry is the TRUE gradient — the sum over all three uses (verified
        here against a torch retain_grad oracle; the clobbering is also
        demonstrated so the deviation stays documented)."""
        import torch
        jcfg = small_cfg()
        ref, model = make_pair(jcfg, 0)
        torch.manual_seed(1)
        x_t = torch.randn(1, 3, 16, 16)
        x_j = jnp.asarray(x_t.numpy())
        name = "blocks.1.ln1.hook_normalized"

        # torch true gradient: retain_grad on every invocation, sum.
        uses = []
        h = ref.blocks[1].ln1.hook_normalized.register_forward_hook(
            lambda m, i, o: (o.retain_grad(), uses.append(o)) and None)
        ref(x_t).backward()
        h.remove()
        assert len(uses) == 3
        true_grad = sum(u.grad for u in uses).numpy()

        _, cache = model.run_with_cache(x_j, names_filter=name,
                                        incl_bwd=True,
                                        return_cache_object=False)
        np.testing.assert_allclose(np.asarray(cache[name + "_grad"]),
                                   true_grad, atol=ATOL)
        # The documented reference artifact: its own cached entry is only
        # the query-path use, not the sum.
        _, cache_ref = ref.run_with_cache(x_t, names_filter=name,
                                          return_cache_object=False,
                                          incl_bwd=True)
        assert np.allclose(cache_ref[name + "_grad"].numpy(),
                           uses[0].grad.numpy(), atol=1e-6)
        assert not np.allclose(cache_ref[name + "_grad"].numpy(),
                               true_grad, atol=1e-4)

    def test_discarded_sites_tap_stream_grad(self):
        """hook_full_embed's (fwd-edited) return value is discarded in the
        reference forward (base_vit.py:181), but the identity HookPoint
        returns its input tensor, so its backward hook still observes the
        live stream's gradient — both sides must produce the entry and it
        must equal the oracle's."""
        out, cache, out_ref, cache_ref = run_both_bwd(
            small_cfg(), ["hook_full_embed", "hook_embed",
                          "hook_ln_final", "hook_post_head_pre_normalize"])
        for k in [k for k in cache_ref if k.endswith("_grad")]:
            assert k in cache, f"missing {k}"
            np.testing.assert_allclose(
                np.asarray(cache[k]), cache_ref[k].detach().numpy(),
                atol=ATOL, err_msg=f"grad mismatch at {k}")

    def test_fused_attention_grads(self):
        """Grad caching must also work through the fused Pallas/custom_vjp
        attention path (resid hooks don't force the einsum path)."""
        cfg_f = small_cfg(use_fused_attention=True)
        cfg_e = small_cfg(use_fused_attention=False)
        names = lambda n: "resid_post" in n
        import torch
        _, m_f = make_pair(cfg_f, 3)
        _, m_e = make_pair(cfg_e, 3)
        torch.manual_seed(7)
        x = jnp.asarray(torch.randn(1, 3, 16, 16).numpy())
        _, c_f = m_f.run_with_cache(x, names_filter=names, incl_bwd=True,
                                    return_cache_object=False)
        _, c_e = m_e.run_with_cache(x, names_filter=names, incl_bwd=True,
                                    return_cache_object=False)
        for k in c_e:
            np.testing.assert_allclose(np.asarray(c_f[k]), np.asarray(c_e[k]),
                                       atol=ATOL, err_msg=k)


class TestBwdInterventions:
    def test_zero_grad_upstream(self):
        """Zeroing the cotangent at blocks.1.hook_resid_pre kills every
        upstream gradient, while the intervened site's cached grad stays
        the unmodified grad_output (torch replaces grad_input only)."""
        cfg = small_cfg()
        model = HookedViT(cfg, key=jax.random.PRNGKey(0))
        x = jax.random.normal(jax.random.PRNGKey(1), (1, 3, 16, 16))
        names = lambda n: "resid" in n

        def zero_grad(g, hook):
            assert hook.name == "blocks.1.hook_resid_pre"
            return g * 0.0

        _, cache = model.run_with_cache(
            x, names_filter=names, incl_bwd=True,
            bwd_hooks=[("blocks.1.hook_resid_pre", zero_grad)],
            return_cache_object=False)
        # Site itself: unmodified (nonzero) grad_output.
        assert float(jnp.abs(cache["blocks.1.hook_resid_pre_grad"]).max()) > 0
        # Upstream of the intervention: exactly zero.
        assert float(jnp.abs(cache["blocks.0.hook_resid_post_grad"]).max()) == 0.0
        assert float(jnp.abs(cache["blocks.0.hook_resid_pre_grad"]).max()) == 0.0
        # Downstream: untouched vs a clean run.
        _, clean = model.run_with_cache(x, names_filter=names, incl_bwd=True,
                                        return_cache_object=False)
        np.testing.assert_allclose(
            np.asarray(cache["blocks.1.hook_resid_post_grad"]),
            np.asarray(clean["blocks.1.hook_resid_post_grad"]), atol=0)

    def test_scaled_grad_matches_manual_vjp(self):
        """Doubling the cotangent at resid_mid doubles every upstream
        gradient (linearity check against the clean run)."""
        cfg = small_cfg()
        model = HookedViT(cfg, key=jax.random.PRNGKey(0))
        x = jax.random.normal(jax.random.PRNGKey(2), (2, 3, 16, 16))
        names = lambda n: "resid" in n
        double = lambda g, hook: 2.0 * g
        _, cache = model.run_with_cache(
            x, names_filter=names, incl_bwd=True,
            bwd_hooks=[("blocks.1.hook_resid_pre", double)],
            return_cache_object=False)
        _, clean = model.run_with_cache(x, names_filter=names, incl_bwd=True,
                                        return_cache_object=False)
        np.testing.assert_allclose(
            np.asarray(cache["blocks.0.hook_resid_post_grad"]),
            2.0 * np.asarray(clean["blocks.0.hook_resid_post_grad"]),
            atol=1e-6)

    def test_forward_values_untouched(self):
        """bwd hooks must not change any forward value or the output."""
        cfg = small_cfg()
        model = HookedViT(cfg, key=jax.random.PRNGKey(0))
        x = jax.random.normal(jax.random.PRNGKey(3), (2, 3, 16, 16))
        noisy = lambda g, hook: g * -3.7 + 1.0
        out_h, cache_h = model.run_with_cache(
            x, names_filter="blocks.0.hook_resid_post", incl_bwd=False,
            bwd_hooks=[(lambda n: "resid" in n, noisy)],
            return_cache_object=False)
        out, cache = model.run_with_cache(
            x, names_filter="blocks.0.hook_resid_post",
            return_cache_object=False)
        np.testing.assert_allclose(np.asarray(out_h), np.asarray(out), atol=0)
        np.testing.assert_allclose(
            np.asarray(cache_h["blocks.0.hook_resid_post"]),
            np.asarray(cache["blocks.0.hook_resid_post"]), atol=0)
        # incl_bwd=False => no grad entries even with bwd hooks (matching
        # the reference, where only caching hooks write _grad keys).
        assert not [k for k in cache_h if k.endswith("_grad")]


class TestAttributionPatching:
    """End-to-end attribution-patching workflow: attribution = grad x
    (corrupt - clean) activation, per hook — the use case backward hooks
    exist for.  Verified against the torch oracle."""

    def test_attribution_scores_match_oracle(self):
        import torch
        cfg = small_cfg()
        ref, model = make_pair(cfg, 11)
        torch.manual_seed(12)
        x_clean_t = torch.randn(1, 3, 16, 16)
        x_corr_t = torch.randn(1, 3, 16, 16)
        names = lambda n: n.endswith("hook_resid_post")

        # torch side
        _, cc = ref.run_with_cache(x_clean_t, names_filter=names,
                                   return_cache_object=False, incl_bwd=True)
        with torch.no_grad():
            _, cx = ref.run_with_cache(x_corr_t, names_filter=names,
                                       return_cache_object=False)
        attr_ref = {
            n: (cc[n + "_grad"] * (cx[n] - cc[n])).sum().item()
            for n in cx}

        # jax side
        xc = jnp.asarray(x_clean_t.numpy())
        xx = jnp.asarray(x_corr_t.numpy())
        _, jc = model.run_with_cache(xc, names_filter=names, incl_bwd=True,
                                     return_cache_object=False)
        _, jx = model.run_with_cache(xx, names_filter=names,
                                     return_cache_object=False)
        attr = {n: float((jc[n + "_grad"] * (jx[n] - jc[n])).sum())
                for n in jx}
        for n in attr_ref:
            np.testing.assert_allclose(attr[n], attr_ref[n], atol=1e-4,
                                       err_msg=f"attribution mismatch at {n}")

    def test_custom_loss_fn(self):
        """loss_fn seeds the backward with the metric's gradient (the
        'metric then backward' workflow on multi-class outputs)."""
        cfg = small_cfg(n_classes=10)
        model = HookedViT(cfg, key=jax.random.PRNGKey(4))
        x = jax.random.normal(jax.random.PRNGKey(5), (2, 3, 16, 16))
        metric = lambda out: out[:, 3].sum() - out[:, 5].sum()
        _, cache = model.run_with_cache(
            x, names_filter="blocks.0.hook_resid_post", incl_bwd=True,
            loss_fn=metric, return_cache_object=False)
        g = cache["blocks.0.hook_resid_post_grad"]
        # Manual vjp of the same metric w.r.t. that activation.
        def f(resid):
            patch = lambda v, hook: v
            out = model.run_with_hooks(
                x, fwd_hooks=[("blocks.0.hook_resid_post",
                               lambda v, hook: resid)])
            return metric(out)
        _, c0 = model.run_with_cache(x, names_filter="blocks.0.hook_resid_post",
                                     return_cache_object=False)
        g_manual = jax.grad(f)(c0["blocks.0.hook_resid_post"])
        np.testing.assert_allclose(np.asarray(g), np.asarray(g_manual),
                                   atol=1e-5)


class TestTextBackwardHooks:
    def test_text_grad_cache(self):
        from vit_prisma_tpu.configs.vit_config import TextTransformerConfig
        from vit_prisma_tpu.models.text import HookedTextTransformer
        cfg = TextTransformerConfig(n_layers=2, d_model=32, d_head=8,
                                    n_heads=4, d_mlp=64, context_length=12,
                                    vocab_size=50, model_name="t",
                                    use_fused_attention=False)
        model = HookedTextTransformer(cfg, key=jax.random.PRNGKey(0))
        toks = jax.random.randint(jax.random.PRNGKey(1), (2, 12), 0, 49)
        names = lambda n: "resid" in n
        _, cache = model.run_with_cache(toks, names_filter=names,
                                        incl_bwd=True,
                                        return_cache_object=False)
        gkeys = [k for k in cache if k.endswith("_grad")]
        assert gkeys, "no grads cached for text model"
        for k in gkeys:
            assert np.isfinite(np.asarray(cache[k])).all()


class TestSAESplicedBackwardHooks:
    """Gradient flow through spliced SAEs (VERDICT r3 item 3): the reference
    gets backward hooks through attached SAE modules for free from torch
    autograd (base_vit.py:850-873 + hooked_root_module.py:255-287); here
    HookedSAEViT.run_with_cache(incl_bwd=True) compiles forward + backward
    through the splice into one XLA program."""

    def _pair_with_sae(self, use_error_term=None, seed=0):
        import torch
        from vit_prisma_tpu.models.sae_vit import HookedSAEViT
        from vit_prisma_tpu.sae import SAERunnerConfig, SparseAutoencoder
        from tests.reference_oracle import load_reference

        load_reference()
        jcfg = small_cfg()
        ref, model = make_pair(jcfg, seed)
        smodel = HookedSAEViT(jcfg, params=model.params)

        # weight-identical SAEs at blocks.1.hook_resid_post
        from vit_prisma.sae.config import VisionModelSAERunnerConfig
        from vit_prisma.sae.sae import StandardSparseAutoencoder
        torch.manual_seed(seed + 7)
        rcfg = VisionModelSAERunnerConfig(
            d_in=jcfg.d_model, expansion_factor=4, hook_point_layer=1,
            layer_subtype="hook_resid_post", _device="cpu",
            activation_fn_str="relu", normalize_activations="none",
            log_to_wandb=False, verbose=False)
        rsae = StandardSparseAutoencoder(rcfg)
        if not hasattr(rsae, "use_error_term"):
            rsae.use_error_term = False
        scfg = SAERunnerConfig(
            d_in=jcfg.d_model, expansion_factor=4, hook_point_layer=1,
            layer_subtype="hook_resid_post", b_dec_init_method="zeros",
            log_to_wandb=False)
        jsae = SparseAutoencoder(
            scfg, params={k: jnp.asarray(v.detach().numpy())
                          for k, v in rsae.state_dict().items()})

        # attach to both
        rmodel_sae = self._ref_sae_model(jcfg, ref, rsae)
        smodel.add_sae(jsae, use_error_term=use_error_term)
        return rmodel_sae, smodel, jcfg

    @staticmethod
    def _ref_sae_model(jcfg, ref, rsae):
        """Reference HookedSAEViT carrying the HookedViT's weights."""
        from vit_prisma.models.base_vit import HookedSAEViT as RefSAEViT
        rmodel = RefSAEViT(ref.cfg)
        rmodel.load_state_dict(ref.state_dict())
        rmodel.eval()
        rmodel.add_sae(rsae)
        return rmodel

    def test_spliced_grads_match_oracle(self):
        import torch
        rmodel, smodel, jcfg = self._pair_with_sae()
        torch.manual_seed(3)
        x_t = torch.randn(1, 3, jcfg.image_size, jcfg.image_size)
        x_j = jnp.asarray(x_t.numpy())

        out_r, cache_r = rmodel.run_with_cache(
            x_t, return_cache_object=False, incl_bwd=True)
        out_j, cache_j = smodel.run_with_cache(
            x_j, return_cache_object=False, incl_bwd=True)
        np.testing.assert_allclose(np.asarray(out_j),
                                   out_r.detach().numpy(), atol=ATOL)
        # ln sites excluded: the reference invokes ln1 3x per block so its
        # backward hook clobbers those cache entries with one path's
        # cotangent — a documented oracle artifact (see
        # test_ln1_true_gradient above), not a parity target.
        grad_keys = [k for k in cache_r if k.endswith("_grad")
                     and ".ln" not in k and "ln_final" not in k]
        sae_grad_keys = [k for k in grad_keys if ".hook_sae" in k
                         or ".hook_hidden" in k]
        assert sae_grad_keys, "oracle cached no SAE-hook grads"
        missing = [k for k in grad_keys if k not in cache_j]
        assert not missing, f"missing grads: {missing}"
        for k in grad_keys:
            np.testing.assert_allclose(
                np.asarray(cache_j[k]), cache_r[k].detach().numpy(),
                atol=ATOL, err_msg=f"grad mismatch at {k}")

    def test_error_term_attribution(self):
        """use_error_term=True: clean forward, gradients route through the
        SAE — the SAELens attribution workflow.  Checked analytically:
        hook_sae_out_grad equals the plain model's gradient at the splice
        site, and hook_hidden_post_grad equals it pulled back through the
        decoder."""
        _, smodel, jcfg = self._pair_with_sae(use_error_term=True)
        hp = "blocks.1.hook_resid_post"
        x = jax.random.normal(jax.random.PRNGKey(11),
                              (1, 3, jcfg.image_size, jcfg.image_size))

        clean_out, clean_cache = HookedViT(
            jcfg, params=smodel.params).run_with_cache(
            x, names_filter=hp, incl_bwd=True, return_cache_object=False)
        out, cache = smodel.run_with_cache(x, return_cache_object=False,
                                           incl_bwd=True)
        # clean forward
        np.testing.assert_allclose(np.asarray(out), np.asarray(clean_out),
                                    atol=1e-5)
        g_site = clean_cache[f"{hp}_grad"]
        np.testing.assert_allclose(np.asarray(cache[f"{hp}.hook_sae_out_grad"]),
                                   np.asarray(g_site), atol=1e-5)
        W_dec = smodel.acts_to_saes[hp].params["W_dec"]
        np.testing.assert_allclose(
            np.asarray(cache[f"{hp}.hook_hidden_post_grad"]),
            np.asarray(g_site @ W_dec.T), atol=1e-5)
        # feature-attribution scores (grad x act) are finite and non-trivial
        attr = (cache[f"{hp}.hook_hidden_post_grad"]
                * cache[f"{hp}.hook_hidden_post"])
        assert np.isfinite(np.asarray(attr)).all()
        assert float(jnp.abs(attr).sum()) > 0

    def test_bwd_hooks_through_splice(self):
        """A bwd editor upstream of the splice observes the gradient routed
        through the SAE; zeroing it kills upstream grads."""
        _, smodel, jcfg = self._pair_with_sae()
        x = jax.random.normal(jax.random.PRNGKey(13),
                              (1, 3, jcfg.image_size, jcfg.image_size))
        zero = lambda g, hook: jnp.zeros_like(g)
        _, cache = smodel.run_with_cache(
            x, return_cache_object=False, incl_bwd=True,
            bwd_hooks=[("blocks.1.hook_resid_pre", zero)])
        np.testing.assert_allclose(
            np.asarray(cache["blocks.0.hook_resid_post_grad"]), 0.0)
        # the tap at the edited site still caches the unedited grad
        assert float(jnp.abs(cache["blocks.1.hook_resid_pre_grad"]).sum()) > 0
