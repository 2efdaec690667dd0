from .logic import L, H, X, Z, STATE_CHARS
from . import logic

__all__ = ["L", "H", "X", "Z", "STATE_CHARS", "logic"]
