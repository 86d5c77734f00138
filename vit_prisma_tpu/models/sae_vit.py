"""HookedSAEViT — a HookedViT that can splice SAEs into its forward pass.

Counterpart of ``/root/reference/src/vit_prisma/models/base_vit.py:827-1086``:
``add_sae`` / ``reset_saes`` / ``run_with_saes`` /
``run_with_cache_with_saes`` / ``run_with_hooks_with_saes`` / ``saes()``
context manager.

The reference physically replaces the ``HookPoint`` module with the SAE and
re-runs ``setup()`` (:850-873).  Functionally, splicing an SAE at hook ``X``
means "replace the activation at X with its SAE reconstruction", so here it
compiles to an intervention hook whose SAE parameters are passed as jit
*arguments* (never baked as constants): one XLA program per attached-SAE
configuration, with the SAE encode/decode fused into the surrounding
forward.

``use_error_term=True`` gives the SAELens semantics: the spliced output
equals the clean activation (reconstruction + stop-gradient error), so the
forward is unchanged but gradients flow through the SAE.
"""

from __future__ import annotations

from contextlib import contextmanager
from typing import Dict, List, Optional, Union

import jax

from vit_prisma_tpu.models.vit import HookedViT, hook_names, vit_forward
from vit_prisma_tpu.prisma.hooks import HookRuntime, hook_key, resolve_names_filter
from vit_prisma_tpu.sae.sae import SparseAutoencoder, sae_forward


class HookedSAEViT(HookedViT):
    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.acts_to_saes: Dict[str, SparseAutoencoder] = {}

    # -- attachment -------------------------------------------------------
    def add_sae(self, sae: SparseAutoencoder,
                use_error_term: Optional[bool] = None):
        """Attach ``sae`` at its configured hook point (base_vit.py:850-873)."""
        act_name = sae.cfg.hook_point
        if act_name not in self.acts_to_saes and act_name not in hook_names(self.cfg):
            import logging
            logging.warning(f"No hook found for {act_name}. Skipping.")
            return
        if use_error_term is not None:
            if not hasattr(sae, "_original_use_error_term"):
                sae._original_use_error_term = getattr(sae, "use_error_term", False)
            sae.use_error_term = use_error_term
        self.acts_to_saes[act_name] = sae

    def _reset_sae(self, act_name: str,
                   prev_sae: Optional[SparseAutoencoder] = None):
        if act_name not in self.acts_to_saes:
            import logging
            logging.warning(f"No SAE is attached to {act_name}. "
                            "There's nothing to reset.")
            return
        current = self.acts_to_saes[act_name]
        if hasattr(current, "_original_use_error_term"):
            current.use_error_term = current._original_use_error_term
            delattr(current, "_original_use_error_term")
        if prev_sae is not None:
            self.acts_to_saes[act_name] = prev_sae
        else:
            del self.acts_to_saes[act_name]

    def reset_saes(self, act_names: Optional[Union[str, List[str]]] = None,
                   prev_saes: Optional[List[Optional[SparseAutoencoder]]] = None):
        if isinstance(act_names, str):
            act_names = [act_names]
        elif act_names is None:
            act_names = list(self.acts_to_saes.keys())
        if prev_saes:
            if len(act_names) != len(prev_saes):
                raise ValueError("act_names and prev_saes must have the same length")
        else:
            prev_saes = [None] * len(act_names)
        for act_name, prev in zip(act_names, prev_saes):
            self._reset_sae(act_name, prev)

    @contextmanager
    def saes(self, saes: Union[SparseAutoencoder, List[SparseAutoencoder]] = (),
             reset_saes_end: bool = True,
             use_error_term: Optional[bool] = None):
        """Temporarily attach SAEs (base_vit.py:1040-1086)."""
        if isinstance(saes, SparseAutoencoder):
            saes = [saes]
        act_names_to_reset, prev_saes = [], []
        try:
            for sae in saes:
                act_names_to_reset.append(sae.cfg.hook_point)
                prev_saes.append(self.acts_to_saes.get(sae.cfg.hook_point))
                self.add_sae(sae, use_error_term=use_error_term)
            yield self
        finally:
            if reset_saes_end:
                self.reset_saes(act_names_to_reset, prev_saes)

    # -- spliced execution ------------------------------------------------
    def _sae_hook_names(self, act_name: str) -> List[str]:
        """Cache keys contributed by an SAE spliced at ``act_name``
        (reference: the SAE module's own hook points, sae.py:54-57, become
        ``{act_name}.hook_sae_in`` etc. after set_deep_attr+setup)."""
        scfg = self.acts_to_saes[act_name].cfg
        names = [f"{act_name}.hook_sae_in"]
        if scfg.architecture != "gated":
            names.append(f"{act_name}.hook_hidden_pre")
        names += [f"{act_name}.hook_hidden_post", f"{act_name}.hook_sae_out"]
        return names

    def _sae_jit(self, key_extra, names, fwd_hooks, stop_at_layer, with_cache,
                 incl_bwd=False, bwd_hooks=(), loss_fn=None):
        attached = sorted(self.acts_to_saes.items())
        sae_names = tuple(n for n, _ in attached)
        sae_cfgs = tuple(s.cfg for _, s in attached)
        err_terms = tuple(bool(getattr(s, "use_error_term", False))
                          for _, s in attached)
        grad_mode = incl_bwd or bool(bwd_hooks)
        key = ("saes", sae_names, sae_cfgs, err_terms, key_extra, names,
               hook_key(fwd_hooks), stop_at_layer, with_cache,
               incl_bwd, hook_key(bwd_hooks),
               None if loss_fn is None else id(loss_fn))
        fn = self._jit_cache.get(key)
        if fn is None:
            cfg = self.cfg

            def spliced_forward(params, sae_params_tuple, x, rt):
                # Prepend splice editors that also fire the SAE's own hook
                # points (prefixed by the attachment name) through `rt`.
                splices = []
                for name, scfg, err, sp in zip(sae_names, sae_cfgs, err_terms,
                                               sae_params_tuple):
                    def splice(value, hook, scfg=scfg, sp=sp, err=err,
                               name=name):
                        recon = sae_forward(sp, scfg, value, hooks=rt,
                                            training=False,
                                            prefix=f"{name}.").sae_out
                        recon = recon.astype(value.dtype)
                        if err:
                            # SAELens use_error_term: the forward is CLEAN
                            # (recon + sg(value - recon) == value) but the
                            # gradient routes through the SAE, so incl_bwd
                            # caches d loss / d feature_acts etc. —
                            # reference base_vit.py:850-873 +
                            # hooked_root_module.py:255-287.
                            recon = recon + jax.lax.stop_gradient(value - recon)
                        return recon
                    splices.append((resolve_names_filter(name), splice))
                rt._editors = splices + rt._editors
                return vit_forward(params, cfg, x, rt, stop_at_layer)

            if grad_mode:
                from vit_prisma_tpu.prisma.hooks import grad_cached_traced
                traced0 = grad_cached_traced(
                    lambda pp, x, rt: spliced_forward(pp[0], pp[1], x, rt),
                    names, fwd_hooks=tuple(fwd_hooks),
                    bwd_hooks=tuple(bwd_hooks), loss_fn=loss_fn,
                    incl_bwd=incl_bwd)

                def traced(params, sae_params_tuple, x):
                    return traced0((params, sae_params_tuple), x)
            else:
                def traced(params, sae_params_tuple, x):
                    rt = HookRuntime(names_filter=names,
                                     fwd_hooks=tuple(fwd_hooks),
                                     record=with_cache)
                    out = spliced_forward(params, sae_params_tuple, x, rt)
                    if with_cache:
                        return out, dict(rt.cache)
                    return out

            fn = jax.jit(traced)
            self._jit_cache[key] = fn

        sae_params = tuple(s.params for _, s in attached)
        return fn, sae_params

    def forward(self, x, stop_at_layer: Optional[int] = None):
        if not self.acts_to_saes:
            return super().forward(x, stop_at_layer=stop_at_layer)
        fn, sae_params = self._sae_jit("fwd", None, (), stop_at_layer, False)
        return fn(self.params, sae_params, x)

    __call__ = forward

    def run_with_cache(self, x, names_filter=None, return_cache_object=True,
                       stop_at_layer=None, fwd_hooks=(), remove_batch_dim=False,
                       incl_bwd=False, bwd_hooks=(), loss_fn=None):
        """Spliced cached forward; with ``incl_bwd=True`` (or ``bwd_hooks``)
        the gradient of the reduced output flows THROUGH the attached SAEs
        and is cached as ``{name}_grad`` for every cached site, including
        the SAEs' own hook points (``...hook_sae_in/hidden_pre/hidden_post/
        hook_sae_out``) — the reference gets this for free from torch
        autograd over the spliced modules (base_vit.py:850-873 +
        hooked_root_module.py:255-287); here forward + backward compile to
        one XLA program.  With ``use_error_term=True`` attachments, the
        forward is the clean model but gradients route through the SAE —
        the SAE-feature attribution workflow."""
        if not self.acts_to_saes:
            return super().run_with_cache(
                x, names_filter=names_filter,
                return_cache_object=return_cache_object,
                stop_at_layer=stop_at_layer, fwd_hooks=fwd_hooks,
                remove_batch_dim=remove_batch_dim, incl_bwd=incl_bwd,
                bwd_hooks=bwd_hooks, loss_fn=loss_fn)
        # Enumerate hook names with spliced points replaced by the SAE's own
        # hook points (parity with the reference's module substitution).
        pred = resolve_names_filter(names_filter)
        base = self._resolve_names(None, stop_at_layer)
        expanded: List[str] = []
        for n in base:
            if n in self.acts_to_saes:
                expanded.extend(self._sae_hook_names(n))
            else:
                expanded.append(n)
        names = tuple(n for n in expanded if pred(n))
        fn, sae_params = self._sae_jit("cache", names, tuple(fwd_hooks),
                                       stop_at_layer, True,
                                       incl_bwd=incl_bwd,
                                       bwd_hooks=tuple(bwd_hooks),
                                       loss_fn=loss_fn)
        out, cache = fn(self.params, sae_params, x)
        order = list(names) + [n + "_grad" for n in reversed(names)]
        cache = {k: cache[k] for k in order if k in cache}
        if remove_batch_dim:
            cache = {k: v[0] for k, v in cache.items()}
        if return_cache_object:
            from vit_prisma_tpu.prisma.cache import ActivationCache
            cache = ActivationCache(cache, self, has_batch_dim=not remove_batch_dim)
        return out, cache

    def run_with_hooks(self, x, fwd_hooks=(), stop_at_layer=None, **kw):
        if not self.acts_to_saes:
            return super().run_with_hooks(x, fwd_hooks=fwd_hooks,
                                          stop_at_layer=stop_at_layer)
        fn, sae_params = self._sae_jit("hooks", None, tuple(fwd_hooks),
                                       stop_at_layer, False)
        return fn(self.params, sae_params, x)

    # -- one-shot wrappers (base_vit.py:938-1038) -------------------------
    def run_with_saes(self, x, saes=(), reset_saes_end: bool = True,
                      use_error_term: Optional[bool] = None, **kw):
        with self.saes(saes=saes, reset_saes_end=reset_saes_end,
                       use_error_term=use_error_term):
            return self(x, **kw)

    def run_with_cache_with_saes(self, x, saes=(), reset_saes_end: bool = True,
                                 use_error_term: Optional[bool] = None,
                                 return_cache_object: bool = True,
                                 remove_batch_dim: bool = False, **kw):
        with self.saes(saes=saes, reset_saes_end=reset_saes_end,
                       use_error_term=use_error_term):
            return self.run_with_cache(
                x, return_cache_object=return_cache_object,
                remove_batch_dim=remove_batch_dim, **kw)

    def run_with_hooks_with_saes(self, x, saes=(), reset_saes_end: bool = True,
                                 fwd_hooks=(), **kw):
        with self.saes(saes=saes, reset_saes_end=reset_saes_end):
            return self.run_with_hooks(x, fwd_hooks=fwd_hooks, **kw)
