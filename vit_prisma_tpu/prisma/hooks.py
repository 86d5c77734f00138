"""Functional hook runtime — the TPU-native replacement for the reference's
``HookPoint``/``HookedRootModule`` machinery
(``/root/reference/src/vit_prisma/prisma_tools/hook_point.py:16``,
``hooked_root_module.py:22``).

Design
------
The reference wraps every intermediate activation in an identity ``nn.Module``
and registers Python forward hooks that mutate a dict.  That is inherently
eager: every hook is a host-side callback.  On TPU we instead make the forward
pass *pure*: a :class:`HookRuntime` object is threaded through the forward
function; ``hooks(name, value)`` optionally applies user intervention
functions (pure ``f(value, hook) -> value``) and records the (traced) value.
The recorded dict is **returned** from the traced function, so under
``jax.jit`` the whole cached forward compiles to one XLA program whose
outputs are the requested activations — no host round-trips, no Python at
runtime, and the cache lives in HBM.

``names_filter`` semantics match the reference
(``hooked_root_module.py:289-332``): ``None`` (everything), exact string,
list/tuple of strings, or a predicate.

Hook *ordering* within one call matches the reference exactly so that the
golden hook-name test (``/root/reference/tests/test_cache_hook_names.py``)
passes verbatim.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, List, Optional, Sequence, Set, Tuple, Union

import jax
import jax.numpy as jnp

NamesFilter = Union[None, str, Sequence[str], Callable[[str], bool]]
# An intervention hook: (value, HookInfo) -> new value (pure function).
HookFn = Callable[..., Any]


class HookInfo:
    """Metadata passed to intervention hooks (mirrors the reference's
    ``HookPoint`` argument; ``hook.name``/``hook.layer()`` are the only
    attributes reference code uses)."""

    __slots__ = ("name", "ctx")

    def __init__(self, name: str):
        self.name = name
        self.ctx: Dict[str, Any] = {}

    def layer(self) -> int:
        # Mirrors hook_point.py:107 — extract block index from the name.
        parts = self.name.split(".")
        if parts[0] == "blocks":
            return int(parts[1])
        raise ValueError(f"Hook name {self.name!r} has no layer")

    def __repr__(self):
        return f"HookInfo({self.name!r})"


def resolve_names_filter(names_filter: NamesFilter) -> Callable[[str], bool]:
    if names_filter is None:
        return lambda name: True
    if isinstance(names_filter, str):
        name = names_filter
        return lambda n: n == name
    if isinstance(names_filter, (list, tuple, set, frozenset)):
        allowed = frozenset(names_filter)
        return lambda n: n in allowed
    if callable(names_filter):
        return names_filter
    raise ValueError(f"Bad names_filter: {names_filter!r}")


def _grad_tap(fn, value):
    return value


def _grad_tap_fwd(fn, value):
    return value, None


def _grad_tap_bwd(fn, _res, g):
    return (fn(g),)


# Identity in the forward; applies ``fn`` to the cotangent in the backward.
# This is the TPU-native counterpart of the reference's dir="bwd" hooks
# (hook_point.py:60-79): a pure ``f(grad, hook) -> grad`` rewrites the
# gradient flowing *upstream* through the hook point.
grad_tap = functools.partial(jax.custom_vjp, nondiff_argnums=(0,))(_grad_tap)
grad_tap.defvjp(_grad_tap_fwd, _grad_tap_bwd)


class HookRuntime:
    """Collects activations and applies interventions during one traced
    forward pass.  Created fresh inside each traced call; the collected
    ``cache`` dict (of traced arrays) is returned as a jit output.

    Gradient support (the reference's ``dir="bwd"`` hooks,
    hook_point.py:60-79) is functional: ``bwd_hooks`` are pure
    ``f(grad, hook) -> grad`` editors applied to the cotangent via
    :func:`grad_tap`; ``grad_eps`` injects a zeros tensor at each cached
    site so that ``jax.grad`` w.r.t. the eps tree yields exactly the
    gradient of the live stream at that hook point (see
    :func:`grad_cached_traced`).  ``grad_sites`` (a set) collects, during
    an abstract probe pass, the names of cached sites.  Sites whose
    fwd-edited return value the forward discards (``editable=False``, e.g.
    ``hook_full_embed``, base_vit.py:181) still receive the stream's
    gradient — the reference's identity HookPoint returns its input
    tensor, so its backward hooks tap the live stream there too."""

    __slots__ = ("_should_cache", "_editors", "_bwd_editors", "cache",
                 "record", "grad_eps", "grad_sites", "grad_mode")

    def __init__(
        self,
        names_filter: NamesFilter = None,
        fwd_hooks: Sequence[Tuple[Union[str, Callable[[str], bool]], HookFn]] = (),
        record: bool = True,
        bwd_hooks: Sequence[Tuple[Union[str, Callable[[str], bool]], HookFn]] = (),
        grad_eps: Optional[Dict[str, Any]] = None,
        grad_sites: Optional[Set[str]] = None,
    ):
        self._should_cache = resolve_names_filter(names_filter) if record else None
        self.record = record
        # Normalize editor list: (matcher, fn)
        self._editors: List[Tuple[Callable[[str], bool], HookFn]] = [
            (resolve_names_filter(pat), fn) for pat, fn in fwd_hooks
        ]
        self._bwd_editors: List[Tuple[Callable[[str], bool], HookFn]] = [
            (resolve_names_filter(pat), fn) for pat, fn in bwd_hooks
        ]
        self.grad_eps = grad_eps
        self.grad_sites = grad_sites
        self.grad_mode = (bool(bwd_hooks) or grad_eps is not None
                          or grad_sites is not None)
        self.cache: Dict[str, Any] = {}

    def __call__(self, name: str, value, *, editable: bool = True):
        """Fire the hook point ``name``.

        ``editable=False`` mirrors reference call sites that discard the
        hook's return value (e.g. ``hook_full_embed``, base_vit.py:181):
        the value is cached but interventions cannot modify the stream.
        """
        out = value
        if self._editors:
            for matches, fn in self._editors:
                if matches(name):
                    out = fn(out, HookInfo(name))
        ret = out if editable else value
        if self.grad_mode:
            if self.grad_sites is not None and self.record \
                    and self._should_cache(name):
                self.grad_sites.add(name)
            # Grad taps attach to the RETURNED stream value: the reference's
            # identity HookPoint returns its input tensor unchanged, so
            # backward hooks observe the live stream's gradient even at
            # call sites whose (fwd-edited) return value the forward
            # discards (editable=False, e.g. hook_full_embed).
            #
            # Construction order matters for the backward: the eps tap is
            # built LAST (closest to downstream), so the cotangent reaches
            # it before any bwd editor at the same site — the cached
            # ``{name}_grad`` is the *unmodified* grad_output, while the
            # edited gradient propagates upstream.  This matches torch,
            # where a backward hook's return replaces grad_input (upstream)
            # but every hook on the module still observes the original
            # grad_output (hook_point.py:60-79).  Multiple editors on one
            # site chain (g -> fn_n -> ... -> fn_0 upstream) — saner than
            # the deprecated-torch clobbering they'd get in the reference.
            for matches, fn in self._bwd_editors:
                if matches(name):
                    info = HookInfo(name)
                    ret = grad_tap(lambda g, _fn=fn, _i=info: _fn(g, _i), ret)
            if self.grad_eps and name in self.grad_eps:
                ret = ret + self.grad_eps[name]
        if self.record and self._should_cache(name):
            # Cache the fwd-edited value; at editable sites ``ret`` carries
            # the same numbers (eps is zeros) plus the grad taps.
            self.cache[name] = ret if editable else out
        return ret

    def wants(self, name: str) -> bool:
        """True if this hook point needs to fire at all (cached or edited).
        Lets the forward skip optional computations (e.g. hook_result)."""
        if self.record and self._should_cache(name):
            return True
        if any(matches(name) for matches, _ in self._bwd_editors):
            return True
        return any(matches(name) for matches, _ in self._editors)


class NullHooks:
    """No-op runtime for plain forwards — zero overhead under trace."""

    cache: Dict[str, Any] = {}

    def __call__(self, name: str, value, *, editable: bool = True):
        return value

    def wants(self, name: str) -> bool:
        return False


NULL_HOOKS = NullHooks()


def grad_cached_traced(forward, names: Tuple[str, ...],
                       fwd_hooks: Sequence[Tuple] = (),
                       bwd_hooks: Sequence[Tuple] = (),
                       loss_fn: Optional[Callable] = None,
                       incl_bwd: bool = True):
    """Build ``traced(params, x) -> (out, cache)`` where ``cache`` carries
    both activations and, for every cached editable site, the gradient of
    the (reduced) output under key ``{name}_grad`` — the functional
    counterpart of the reference's ``run_with_cache(..., incl_bwd=True)``
    + ``model_out.backward()`` (hooked_root_module.py:255-287).

    ``forward``: ``(params, x, rt: HookRuntime) -> out`` (a closure over
    cfg / stop_at_layer).  ``loss_fn(out) -> scalar`` chooses the backward
    seed; ``None`` means ``out.sum()``, i.e. a ones cotangent — identical
    to ``model_out.backward()`` for the scalar outputs torch supports, and
    a well-defined generalization for non-scalar outputs (torch errors).

    Mechanics: a zeros tensor ``eps[name]`` is added at each hook site, so
    ``d loss / d eps[name]`` is exactly the cotangent arriving there.  The
    site set and shapes come from one free ``jax.eval_shape`` probe; the
    whole thing (forward + backward) compiles to ONE XLA program — grads
    never leave HBM and XLA dead-code-eliminates the backward entirely
    when ``incl_bwd=False`` (bwd editors only).
    """
    def traced(params, x):
        sites: Set[str] = set()

        def probe(eps, collecting=False):
            rt = HookRuntime(names_filter=names, fwd_hooks=fwd_hooks,
                             bwd_hooks=bwd_hooks, grad_eps=eps,
                             grad_sites=sites if collecting else None)
            out = forward(params, x, rt)
            loss = loss_fn(out) if loss_fn is not None else jnp.sum(out)
            return loss, (out, dict(rt.cache))

        shapes = jax.eval_shape(lambda e: probe(e, collecting=True), {})
        cache_shapes = shapes[1][1]
        grad_names = tuple(n for n in names if n in sites) if incl_bwd else ()
        eps = {n: jnp.zeros(cache_shapes[n].shape, cache_shapes[n].dtype)
               for n in grad_names}
        grads, (out, cache) = jax.grad(probe, has_aux=True)(eps)
        # Reference backward entries append in reverse firing order as the
        # cotangent propagates; mirror that for cache-key order parity.
        for n in reversed(grad_names):
            cache[n + "_grad"] = grads[n]
        return out, cache

    return traced


def hook_key(fwd_hooks) -> Tuple:
    """A hashable jit-cache key for a list of (pattern, fn) hooks.

    Functions are keyed by identity: re-using the same function object across
    calls avoids recompilation (the idiomatic-JAX contract, documented in the
    README).  Patterns are keyed by value when hashable, identity otherwise.
    """
    key = []
    for pat, fn in fwd_hooks:
        try:
            hash(pat)
            pkey = ("v", pat)
        except TypeError:
            pkey = ("id", id(pat))
        key.append((pkey, id(fn)))
    return tuple(key)
