from .netlist import Netlist, Node, ModelInstance
from . import operations

__all__ = ["Netlist", "Node", "ModelInstance", "operations"]
