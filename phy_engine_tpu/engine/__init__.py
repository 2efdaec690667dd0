from .environment import Environment
from .circuit import Circuit, AnalyzeType

__all__ = ["Environment", "Circuit", "AnalyzeType"]
