"""Load the PyTorch reference implementation (read-only at /root/reference)
as a *numerics oracle* for equivalence tests.

The reference has optional heavy deps (torchvision, wandb, plotly, open_clip,
timm, datasets, line_profiler, fancy_einsum) that are absent from this image
and irrelevant to the numerics under test; an import hook auto-stubs them
(and any of their submodules).  ``fancy_einsum`` is the one stub that must be
*real* (it sits in the compute path), so we provide a faithful named-dims ->
torch.einsum translator.

No reference code is copied — it is imported and executed as-is to produce
golden outputs.
"""

import importlib.abc
import importlib.machinery
import sys
import types
from unittest.mock import MagicMock

REFERENCE_SRC = "/root/reference/src"

_STUB_CANDIDATES = {
    "torchvision", "wandb", "plotly", "matplotlib", "datasets", "open_clip",
    "timm", "scipy", "sklearn", "kornia", "cv2", "PIL_stubless",
}

# Only stub modules that are genuinely absent: replacing an installed
# package (e.g. matplotlib, which IS in this image) with a MagicMock
# poisons every later user of it in the same process.
def _missing(name):
    import importlib.util
    try:
        return importlib.util.find_spec(name) is None
    except (ImportError, ValueError):
        return True


STUB_ROOTS = {m for m in _STUB_CANDIDATES if _missing(m)}


def _fancy_einsum(equation: str, *operands):
    """Minimal reimplementation of the public ``fancy_einsum`` package:
    translate word-named dims ('batch pos d_model, ...') to letters and call
    torch.einsum."""
    import torch

    lhs, rhs = equation.split("->")
    terms = [t.strip() for t in lhs.split(",")]
    names = {}

    def letters(term):
        out = []
        for w in term.split():
            if w not in names:
                names[w] = chr(ord("a") + len(names))
            out.append(names[w])
        return "".join(out)

    spec = ",".join(letters(t) for t in terms) + "->" + letters(rhs.strip())
    return torch.einsum(spec, *operands)


class _StubModule(types.ModuleType):
    def __getattr__(self, name):
        if name == "__path__":
            return []
        if name.startswith("__") and name.endswith("__"):
            raise AttributeError(name)
        return MagicMock()


class _StubLoader(importlib.abc.Loader):
    def create_module(self, spec):
        mod = _StubModule(spec.name)
        mod.__spec__ = spec
        return mod

    def exec_module(self, module):
        pass


class _StubFinder(importlib.abc.MetaPathFinder):
    """Auto-stub any import whose root package is in STUB_ROOTS."""

    def find_spec(self, fullname, path=None, target=None):
        if fullname.split(".")[0] in STUB_ROOTS:
            spec = importlib.machinery.ModuleSpec(fullname, _StubLoader())
            spec.submodule_search_locations = []
            return spec
        return None


_installed = False


def load_reference():
    """Import and return the ``vit_prisma`` reference package."""
    global _installed
    if REFERENCE_SRC not in sys.path:
        sys.path.insert(0, REFERENCE_SRC)
    if not _installed:
        # Materialize transformers' lazy ViT/CLIP imports before stubbing
        # torchvision etc., so its optional-dependency probing sees the truth.
        from transformers import ViTForImageClassification, ViTConfig  # noqa: F401
        from transformers import CLIPModel, CLIPConfig  # noqa: F401

        lp = types.ModuleType("line_profiler")
        lp.profile = lambda f: f
        sys.modules["line_profiler"] = lp
        fe = types.ModuleType("fancy_einsum")
        fe.einsum = _fancy_einsum
        sys.modules["fancy_einsum"] = fe
        sys.meta_path.insert(0, _StubFinder())
        _installed = True
    import vit_prisma  # noqa: F401
    return sys.modules["vit_prisma"]
