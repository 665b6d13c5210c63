from .pytree import PytreeNode, register_model

__all__ = ["PytreeNode", "register_model"]
