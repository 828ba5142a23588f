"""Core math layer: Lie-group/screw-theory primitives and time scalings."""

from . import lie
from . import time_scaling

__all__ = ["lie", "time_scaling"]
