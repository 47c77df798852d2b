"""Container/pytree utilities — the reference's GenericContainer layer.

The reference's L0 substrate (``GenericContainer::Vector`` +
``TemplateHelpers``, SURVEY.md §2 row 1) exists to give C++ a uniform
*non-owning resizable view* over heterogeneous vector types
(``Vector.h:54-105``) plus compile-time container introspection
(``TemplateHelpers.h:40-259``). In JAX the uniform container abstraction is
the **pytree**; this module supplies the capabilities the reference's layer
provides that pytrees alone do not:

- :func:`make_view` / :class:`FlatView` — a named non-owning view over a
  slice of a flat vector (the ``make_vector``/``to_eigen`` role: one buffer,
  many typed windows — device-friendly because views are just index math);
- structural predicates (:func:`is_resizable_like`, :func:`same_structure`)
  standing in for the SFINAE traits (``is_iterable``/``is_resizable``/…);
- :func:`flatten_bounded` / :func:`unflatten_bounded` — fixed-capacity
  padded flattening for jit-stable shapes (the ``VectorResizeMode::Fixed``
  vs ``Resizable`` distinction, ``Vector.h:498-559``, re-expressed for a
  compiler that requires static shapes).
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "FlatView",
    "make_view",
    "same_structure",
    "is_resizable_like",
    "flatten_bounded",
    "unflatten_bounded",
    "tree_size",
    "tree_concat",
]


class FlatView(NamedTuple):
    """Non-owning window ``flat[offset : offset+size]`` reshaped to ``shape``.

    The JAX analogue of ``GenericContainer::Vector`` (``Vector.h:54-105``):
    no storage of its own, valid for any array whose trailing axis covers it,
    usable under jit/vmap because it is pure index arithmetic.
    """

    offset: int
    shape: Tuple[int, ...]

    @property
    def size(self) -> int:
        return int(np.prod(self.shape)) if self.shape else 1

    def read(self, flat: jnp.ndarray) -> jnp.ndarray:
        window = flat[..., self.offset : self.offset + self.size]
        return window.reshape(window.shape[:-1] + self.shape)

    def write(self, flat: jnp.ndarray, value) -> jnp.ndarray:
        value = jnp.asarray(value)
        window = value.reshape(value.shape[: value.ndim - len(self.shape)] + (self.size,))
        return flat.at[..., self.offset : self.offset + self.size].set(window)


def make_view(layout: Dict[str, Tuple[int, ...]]) -> Tuple[Dict[str, FlatView], int]:
    """Build named views over one flat buffer from a ``name → shape`` layout
    (the ``make_vector`` factory role, ``Vector.h:619-662``). Returns
    (views, total_size)."""
    views: Dict[str, FlatView] = {}
    offset = 0
    for name, shape in layout.items():
        v = FlatView(offset, tuple(shape))
        views[name] = v
        offset += v.size
    return views, offset


def same_structure(a, b) -> bool:
    """True iff two pytrees have identical treedef and leaf shapes/dtypes
    (the role of the reference's type-trait truth tables)."""
    ta, tb = jax.tree_util.tree_structure(a), jax.tree_util.tree_structure(b)
    if ta != tb:
        return False
    la, lb = jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b)
    return all(
        jnp.shape(x) == jnp.shape(y)
        and jnp.result_type(x) == jnp.result_type(y)
        for x, y in zip(la, lb)
    )


def is_resizable_like(x) -> bool:
    """Host containers (list/bytearray/np array) are resizable; device arrays
    and tuples are not — the ``is_resizable`` trait (``TemplateHelpers.h``)
    mapped to the Python/JAX world."""
    return isinstance(x, (list, bytearray, np.ndarray)) and not isinstance(
        x, jnp.ndarray
    )


def tree_size(tree) -> int:
    """Total number of scalar elements in a pytree."""
    return sum(int(np.prod(jnp.shape(leaf)) or 1)
               for leaf in jax.tree_util.tree_leaves(tree))


def tree_concat(tree) -> jnp.ndarray:
    """Flatten a pytree of arrays into one 1-D vector (leaf order)."""
    leaves = jax.tree_util.tree_leaves(tree)
    return jnp.concatenate([jnp.ravel(leaf) for leaf in leaves])


def flatten_bounded(tree, capacity: int, fill=0.0):
    """Flatten into a fixed-``capacity`` padded vector (+ actual size).

    The jit-era answer to ``VectorResizeMode``: content may vary, shapes may
    not, so variable-size host data lowers to (padded buffer, count).
    Raises if the tree exceeds capacity (the reference's Fixed-mode failure,
    ``Vector.h:223-241``, as a host-side error).
    """
    flat = tree_concat(tree)
    n = flat.shape[-1]
    if n > capacity:
        raise ValueError(f"tree size {n} exceeds capacity {capacity}")
    padded = jnp.full((capacity,), fill, dtype=flat.dtype).at[:n].set(flat)
    return padded, n


def unflatten_bounded(example, padded: jnp.ndarray):
    """Inverse of :func:`flatten_bounded` given an example tree (its leading
    ``tree_size(example)`` entries are consumed)."""
    leaves, treedef = jax.tree_util.tree_flatten(example)
    out, k = [], 0
    for leaf in leaves:
        size = int(np.prod(jnp.shape(leaf)) or 1)
        out.append(padded[k : k + size].reshape(jnp.shape(leaf)).astype(
            jnp.result_type(leaf)))
        k += size
    return jax.tree_util.tree_unflatten(treedef, out)
