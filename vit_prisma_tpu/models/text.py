"""HookedTextTransformer — CLIP text encoder, TPU-native counterpart of
``/root/reference/src/vit_prisma/models/base_text_transformer.py:24``.

Token embedding lookup, learned positional embedding slice, optional cls
embedding appended at the *end* of the sequence, additive causal mask
(build_causal_mask, :188-194) plus pad-aware cls mask (:108-117), shared
pre-LN TransformerBlock, EOT pooling ``x[arange(B), argmax(tokens)]``
(:151), projection head, optional L2 normalization.

Note: the reference constructs an ``ln_pre`` module but never applies it in
the text forward (base_text_transformer.py:120-146) — OpenCLIP text towers
have no pre-LN.  We match that behavior.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vit_prisma_tpu.configs.vit_config import TextTransformerConfig
from vit_prisma_tpu.models import layers as L
from vit_prisma_tpu.models.vit import block_hook_names, block_slice
from vit_prisma_tpu.prisma.hooks import (
    NULL_HOOKS,
    HookRuntime,
    NamesFilter,
    hook_key,
    resolve_names_filter,
)

Params = Dict[str, Any]


def text_hook_names(cfg: TextTransformerConfig):
    names = ["hook_embed", "hook_pos_embed", "hook_full_embed"]
    for l in range(cfg.n_layers):
        names += block_hook_names(cfg, l)
    if cfg.normalization_type:
        names += ["ln_final.hook_scale", "ln_final.hook_normalized"]
    names += ["hook_ln_final", "hook_post_head_pre_normalize"]
    return names


def build_causal_mask(num_pos: int) -> jnp.ndarray:
    """Additive causal mask: -inf above the diagonal
    (base_text_transformer.py:188-194)."""
    return jnp.triu(jnp.full((num_pos, num_pos), -jnp.inf), k=1)


def init_text_params(cfg: TextTransformerConfig, key: jax.Array) -> Params:
    dt = cfg.jax_dtype
    ks = iter(jax.random.split(key, 8))
    D = cfg.d_model
    from vit_prisma_tpu.models.vit import init_vit_params
    base = init_vit_params(cfg.replace(layer_norm_pre=False), next(ks))
    params: Params = {
        "token_embed": {"W_E": jax.random.normal(next(ks), (cfg.vocab_size, D), dt) * 0.02},
        "pos_embed": {"W_pos": jax.random.normal(next(ks), (cfg.context_length, D), dt) * 0.01},
        "blocks": base["blocks"],
        "head": base["head"],
    }
    if cfg.normalization_type == "LN":
        params["ln_final"] = {"w": jnp.ones((D,), dt), "b": jnp.zeros((D,), dt)}
    if cfg.use_cls_emb:
        params["cls_emb"] = jax.random.normal(next(ks), (D,), dt) * cfg.cls_std
    return params


def _build_cls_mask(tokens, cfg: TextTransformerConfig, pad_id: int = 0):
    """Pad-aware additive mask for the appended cls position
    (base_text_transformer.py:108-117): cls may not attend to padding."""
    B, S = tokens.shape
    valid = tokens != pad_id                       # [B, S]
    # Rows: every query can see non-pad keys; pad (1,0) on the key axis for
    # the cls position itself and extend queries by cls row of True.
    cls_mask = jnp.concatenate(
        [jnp.ones((B, 1), bool), valid], axis=-1)  # [B, S+1] keys incl. cls
    add = jnp.where(cls_mask[:, None, None, :], 0.0, -jnp.inf)  # [B,1,1,S+1]
    return add


def text_forward(params: Params, cfg: TextTransformerConfig, tokens,
                 hooks: HookRuntime = NULL_HOOKS,
                 stop_at_layer: Optional[int] = None):
    """Forward over integer token ids [B, S]."""
    B, S = tokens.shape
    embed = hooks("hook_embed", params["token_embed"]["W_E"][tokens])

    seq_len = S
    if cfg.causal_attention and not cfg.use_cls_emb:
        # pure causal mask: pass the static marker so the fused attention
        # kernel can apply it in-kernel (models/layers.py)
        attn_mask = "causal"
    else:
        attn_mask = build_causal_mask(cfg.n_tokens) if cfg.causal_attention \
            else None

    if cfg.use_cls_emb:
        seq_len += 1
        cls = jnp.broadcast_to(params["cls_emb"][None, None, :],
                               (B, 1, cfg.d_model)).astype(embed.dtype)
        embed = jnp.concatenate([embed, cls], axis=1)
        cls_mask = _build_cls_mask(tokens, cfg)
        # reference parity (base_text_transformer.py:133): the pad-aware
        # cls mask merges only into an existing causal mask — with
        # causal_attention=False the reference also runs unmasked
        if attn_mask is not None:
            attn_mask = attn_mask[None, None, :seq_len, :seq_len] + \
                cls_mask[:, :, :seq_len, :seq_len]
    elif attn_mask is not None and not isinstance(attn_mask, str):
        attn_mask = attn_mask[:seq_len, :seq_len]

    pos = hooks("hook_pos_embed", params["pos_embed"]["W_pos"][:seq_len])
    x = embed + pos
    x = hooks("hook_full_embed", x, editable=False)

    layer_idxs = range(cfg.n_layers)[:stop_at_layer]
    for l in layer_idxs:
        x = L.transformer_block(block_slice(params, l), cfg, x, hooks,
                                f"blocks.{l}", attn_mask=attn_mask)
    if stop_at_layer is not None:
        return x

    x = L.apply_norm(params.get("ln_final"), cfg, x, hooks, "ln_final")
    x = hooks("hook_ln_final", x, editable=False)

    # EOT pooling (base_text_transformer.py:151)
    pooled = x[jnp.arange(B), jnp.argmax(tokens, axis=-1)]
    if cfg.return_type != "pre_logits":
        pooled = L.head(params["head"], cfg, pooled)
    pooled = hooks("hook_post_head_pre_normalize", pooled, editable=False)
    if cfg.normalize_output:
        pooled = pooled / jnp.linalg.norm(pooled, axis=-1, keepdims=True)
    return pooled


# ---------------------------------------------------------------------------
# State-dict round trip
# ---------------------------------------------------------------------------

def stack_text_params(flat: Dict[str, Any], cfg: TextTransformerConfig) -> Params:
    import jax.numpy as jnp

    from vit_prisma_tpu.models.loading.state_dict import _asarray
    dt = cfg.jax_dtype
    g = lambda k: _asarray(flat[k], dt)

    def stack(fmt):
        return jnp.stack([g(fmt.format(l=l)) for l in range(cfg.n_layers)])

    params: Params = {
        "token_embed": {"W_E": g("token_embed.W_E") if "token_embed.W_E" in flat
                        else g("token_embed.weight")},
        "pos_embed": {"W_pos": g("pos_embed.W_pos") if "pos_embed.W_pos" in flat
                      else g("pos_embed")},
        "blocks": {
            "attn": {k: stack(f"blocks.{{l}}.attn.{k}")
                     for k in ["W_Q", "W_K", "W_V", "W_O",
                               "b_Q", "b_K", "b_V", "b_O"]},
            "mlp": {k: stack(f"blocks.{{l}}.mlp.{k}")
                    for k in ["W_in", "b_in", "W_out", "b_out"]},
        },
        "head": {"W_H": g("head.W_H"), "b_H": g("head.b_H")},
    }
    if cfg.normalization_type == "LN":
        params["blocks"]["ln1"] = {"w": stack("blocks.{l}.ln1.w"),
                                   "b": stack("blocks.{l}.ln1.b")}
        params["blocks"]["ln2"] = {"w": stack("blocks.{l}.ln2.w"),
                                   "b": stack("blocks.{l}.ln2.b")}
        params["ln_final"] = {"w": g("ln_final.w"), "b": g("ln_final.b")}
    if cfg.use_cls_emb and "cls_emb" in flat:
        params["cls_emb"] = g("cls_emb")
    return params


def unstack_text_params(params: Params, cfg: TextTransformerConfig):
    flat: Dict[str, Any] = {
        "token_embed.W_E": params["token_embed"]["W_E"],
        "pos_embed.W_pos": params["pos_embed"]["W_pos"],
        "head.W_H": params["head"]["W_H"],
        "head.b_H": params["head"]["b_H"],
    }
    blocks = params["blocks"]
    for l in range(cfg.n_layers):
        for k, v in blocks["attn"].items():
            flat[f"blocks.{l}.attn.{k}"] = v[l]
        for k in ["W_in", "b_in", "W_out", "b_out"]:
            flat[f"blocks.{l}.mlp.{k}"] = blocks["mlp"][k][l]
        if "ln1" in blocks:
            flat[f"blocks.{l}.ln1.w"] = blocks["ln1"]["w"][l]
            flat[f"blocks.{l}.ln1.b"] = blocks["ln1"]["b"][l]
            flat[f"blocks.{l}.ln2.w"] = blocks["ln2"]["w"][l]
            flat[f"blocks.{l}.ln2.b"] = blocks["ln2"]["b"][l]
    if "ln_final" in params:
        flat["ln_final.w"] = params["ln_final"]["w"]
        flat["ln_final.b"] = params["ln_final"]["b"]
    if "cls_emb" in params:
        flat["cls_emb"] = params["cls_emb"]
    return flat


# ---------------------------------------------------------------------------
# Class wrapper
# ---------------------------------------------------------------------------

class HookedTextTransformer:
    """API counterpart of the reference HookedTextTransformer."""

    def __init__(self, cfg: TextTransformerConfig, params: Optional[Params] = None,
                 key: Optional[jax.Array] = None):
        self.cfg = cfg
        if params is None:
            params = init_text_params(cfg, key if key is not None else jax.random.PRNGKey(0))
        self.params = params
        self._jit_cache: Dict[Any, Callable] = {}

    def __call__(self, tokens, stop_at_layer: Optional[int] = None):
        fn = self._get_jitted(("fwd", stop_at_layer), (), None, stop_at_layer, False)
        return fn(self.params, tokens)

    forward = __call__

    def run_with_cache(self, tokens, names_filter: NamesFilter = None,
                       return_cache_object: bool = True,
                       stop_at_layer: Optional[int] = None,
                       fwd_hooks: Sequence[Tuple] = (),
                       incl_bwd: bool = False,
                       bwd_hooks: Sequence[Tuple] = (),
                       loss_fn=None):
        """``incl_bwd``/``bwd_hooks``/``loss_fn`` behave exactly as on
        :meth:`HookedViT.run_with_cache` (gradient caching under
        ``{name}_grad`` keys / pure cotangent editors)."""
        pred = resolve_names_filter(names_filter)
        names = tuple(n for n in text_hook_names(self.cfg) if pred(n))
        grad_mode = incl_bwd or bool(bwd_hooks)
        if grad_mode:
            key = ("cache_bwd", names, hook_key(fwd_hooks),
                   hook_key(bwd_hooks), stop_at_layer, incl_bwd,
                   None if loss_fn is None else id(loss_fn))
        else:
            key = ("cache", names, hook_key(fwd_hooks), stop_at_layer)
        fn = self._get_jitted(key, tuple(fwd_hooks), names, stop_at_layer,
                              True, bwd_hooks=tuple(bwd_hooks),
                              loss_fn=loss_fn, incl_bwd=incl_bwd)
        out, cache = fn(self.params, tokens)
        ordered = {k: cache[k] for k in names if k in cache}
        if grad_mode:
            for k in reversed(names):
                if k + "_grad" in cache:
                    ordered[k + "_grad"] = cache[k + "_grad"]
        cache = ordered
        if return_cache_object:
            from vit_prisma_tpu.prisma.cache import ActivationCache
            cache = ActivationCache(cache, self)
        return out, cache

    def run_with_hooks(self, tokens, fwd_hooks: Sequence[Tuple] = (),
                       stop_at_layer: Optional[int] = None):
        key = ("hooks", hook_key(fwd_hooks), stop_at_layer)
        fn = self._get_jitted(key, tuple(fwd_hooks), None, stop_at_layer, False)
        return fn(self.params, tokens)

    def _get_jitted(self, key, fwd_hooks, names, stop_at_layer, with_cache,
                    bwd_hooks=(), loss_fn=None, incl_bwd=False):
        fn = self._jit_cache.get(key)
        if fn is None:
            cfg = self.cfg

            if bwd_hooks or incl_bwd:
                from vit_prisma_tpu.prisma.hooks import grad_cached_traced
                traced = grad_cached_traced(
                    lambda p, t, rt: text_forward(p, cfg, t, rt, stop_at_layer),
                    names, fwd_hooks=fwd_hooks, bwd_hooks=bwd_hooks,
                    loss_fn=loss_fn, incl_bwd=incl_bwd)
            else:
                def traced(params, tokens):
                    hooks = HookRuntime(names_filter=names, fwd_hooks=fwd_hooks,
                                        record=with_cache) if (with_cache or fwd_hooks) \
                        else NULL_HOOKS
                    out = text_forward(params, cfg, tokens, hooks, stop_at_layer)
                    if with_cache:
                        return out, dict(hooks.cache)
                    return out

            fn = jax.jit(traced)
            self._jit_cache[key] = fn
        return fn

    # Stacked weight properties
    @property
    def W_Q(self): return self.params["blocks"]["attn"]["W_Q"]
    @property
    def W_K(self): return self.params["blocks"]["attn"]["W_K"]
    @property
    def W_V(self): return self.params["blocks"]["attn"]["W_V"]
    @property
    def W_O(self): return self.params["blocks"]["attn"]["W_O"]
    @property
    def W_in(self): return self.params["blocks"]["mlp"]["W_in"]
    @property
    def W_out(self): return self.params["blocks"]["mlp"]["W_out"]
    @property
    def W_E(self): return self.params["token_embed"]["W_E"]
    @property
    def W_pos(self): return self.params["pos_embed"]["W_pos"]

    @classmethod
    def from_pretrained(cls, model_name: str, **kwargs):
        from vit_prisma_tpu.models.loading.loader import load_hooked_model
        return load_hooked_model(model_name, model_type="text", **kwargs)
