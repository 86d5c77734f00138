"""Project directory constants.

Counterpart of ``/root/reference/src/vit_prisma/utils/constants.py:6-20``
(BASE/DATA/MODEL dirs + device autodetect).  The torch device autodetect
is meaningless under JAX — ``jax.devices()[0]`` is the accelerator — so
``DEVICE`` reports the default JAX backend instead.
"""

from __future__ import annotations

import os
from pathlib import Path

BASE_DIR = Path(os.environ.get("VIT_PRISMA_BASE_DIR",
                               Path(__file__).resolve().parents[2]))
DATA_DIR = Path(os.environ.get("VIT_PRISMA_DATA_DIR", BASE_DIR / "data"))
MODEL_DIR = Path(os.environ.get("VIT_PRISMA_MODEL_DIR", BASE_DIR / "models"))


def device() -> str:
    """Default JAX backend name ('tpu' / 'cpu' / ...)."""
    import jax
    return jax.default_backend()
