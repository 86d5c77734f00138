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

from typing import Any, Callable, Dict, List, Sequence, Tuple, Union

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


class HookRuntime:
    """Collects activations and applies interventions during one traced
    forward pass.  Created fresh inside each traced call; the collected
    ``cache`` dict (of traced arrays) is returned as a jit output."""

    __slots__ = ("_should_cache", "_editors", "cache", "record")

    def __init__(
        self,
        names_filter: NamesFilter = None,
        fwd_hooks: Sequence[Tuple[Union[str, Callable[[str], bool]], HookFn]] = (),
        record: bool = True,
    ):
        self._should_cache = resolve_names_filter(names_filter) if record else None
        self.record = record
        # Normalize editor list: (matcher, fn)
        self._editors: List[Tuple[Callable[[str], bool], HookFn]] = [
            (resolve_names_filter(pat), fn) for pat, fn in fwd_hooks
        ]
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
        if self.record and self._should_cache(name):
            self.cache[name] = out
        return out if editable else value

    def wants(self, name: str) -> bool:
        """True if this hook point needs to fire at all (cached or edited).
        Lets the forward skip optional computations (e.g. hook_result)."""
        if self.record and self._should_cache(name):
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
