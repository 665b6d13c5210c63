"""Pytree registration helper for model classes.

The reference's layers are ``torch.nn.Module`` subclasses; the TPU-native
equivalent is a *pytree*: array state (parameters, buffers like the Kabsch
reference coordinates) are leaves, and index metadata resolved at
construction time is static auxiliary data. This makes every model object
directly usable with ``jax.jit`` / ``jax.grad`` / ``jax.vmap`` /
``shard_map`` — e.g. ``jax.jit(lambda m, x: m(x))(model, x)`` traces once
per static structure and differentiates w.r.t. the model's arrays.

Classes declare ``__leaves__`` (child pytrees / arrays) and ``__static__``
(hashable metadata). Static fields participate in the jit cache key, so they
must be hashable and value-comparable (tuples, strings, ints, or objects
with value-based ``__eq__``/``__hash__``).
"""

from __future__ import annotations

import jax

__all__ = ["PytreeNode", "register_model"]


class PytreeNode:
    """Base for model classes registered as JAX pytrees.

    Subclasses set ``__leaves__`` / ``__static__`` tuples of attribute names
    and call :func:`register_model` (or use it as a decorator).
    """

    __leaves__: tuple = ()
    __static__: tuple = ()

    def tree_flatten(self):
        children = tuple(getattr(self, n) for n in self.__leaves__)
        aux = tuple(getattr(self, n) for n in self.__static__)
        return children, aux

    def tree_flatten_with_keys(self):
        children = tuple(
            (jax.tree_util.GetAttrKey(n), getattr(self, n)) for n in self.__leaves__
        )
        aux = tuple(getattr(self, n) for n in self.__static__)
        return children, aux

    @classmethod
    def tree_unflatten(cls, aux, children):
        # Bypass __init__: children may be tracers or None during
        # transformations, so no validation can run here.
        obj = object.__new__(cls)
        for name, value in zip(cls.__leaves__, children):
            object.__setattr__(obj, name, value)
        for name, value in zip(cls.__static__, aux):
            object.__setattr__(obj, name, value)
        return obj

    def _replace(self, **updates):
        """Return a copy with the given leaf/static fields replaced."""
        obj = object.__new__(type(self))
        for name in (*self.__leaves__, *self.__static__):
            object.__setattr__(obj, name, updates.pop(name, getattr(self, name)))
        if updates:
            raise AttributeError(f"unknown fields: {sorted(updates)}")
        return obj


def register_model(cls):
    """Class decorator registering a :class:`PytreeNode` subclass with JAX."""
    jax.tree_util.register_pytree_with_keys(
        cls,
        cls.tree_flatten_with_keys,
        cls.tree_unflatten,
        cls.tree_flatten,
    )
    return cls
