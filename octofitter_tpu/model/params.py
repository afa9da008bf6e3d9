"""Structured parameter namespaces.

Equivalent of the reference's nested named tuples produced by
`make_arr2nt` (`/root/reference/src/variables.jl:758-1060`): a
dot-accessible, ordered, pytree-registered container. Where the
reference metaprograms an unrolled function per model for type
stability, here the structure is a pytree and jit tracing provides the
specialization.
"""

from __future__ import annotations

import jax


class Params:
    """Ordered dot-accessible namespace; registered JAX pytree."""

    __slots__ = ("_d",)

    def __init__(self, *args, **kwargs):
        d = dict(*args, **kwargs)
        object.__setattr__(self, "_d", d)

    # --- mapping/namespace interface ---
    def __getattr__(self, name):
        try:
            return self._d[name]
        except KeyError:
            raise AttributeError(name) from None

    def __getitem__(self, name):
        return self._d[name]

    def __contains__(self, name):
        return name in self._d

    def keys(self):
        return self._d.keys()

    def values(self):
        return self._d.values()

    def items(self):
        return self._d.items()

    def get(self, name, default=None):
        return self._d.get(name, default)

    def asdict(self):
        return dict(self._d)

    def __len__(self):
        return len(self._d)

    def __iter__(self):
        return iter(self._d)

    def __repr__(self):
        inner = ", ".join(f"{k}={v!r}" for k, v in self._d.items())
        return f"Params({inner})"

    def merge(self, other):
        """New Params with other's entries overriding (like Julia merge)."""
        d = dict(self._d)
        if isinstance(other, Params):
            d.update(other._d)
        else:
            d.update(other)
        return Params(d)


def _params_flatten(p: Params):
    keys = tuple(p._d.keys())
    return tuple(p._d[k] for k in keys), keys


def _params_unflatten(keys, children):
    return Params(dict(zip(keys, children)))


jax.tree_util.register_pytree_node(Params, _params_flatten, _params_unflatten)


def hasproperty(p, name) -> bool:
    """Mirror of Julia `hasproperty(θ, :name)` used throughout likelihoods."""
    if isinstance(p, Params):
        return name in p
    return hasattr(p, name)
