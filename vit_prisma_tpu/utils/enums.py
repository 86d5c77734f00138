"""Model-type enum (reference utils/enums.py)."""

from enum import Enum


class ModelType(Enum):
    VISION = "vision"
    TEXT = "text"
