"""Decision-variable registry: names → slices of a flat optimization vector.

Re-design of the reference's ``VariablesHandler`` (``src/System/src/
VariablesHandler.cpp:13-48``; SURVEY.md §2 row 7): the same name → (offset,
size) bookkeeping, plus pack/unpack helpers so transcription code can move
between a dict of named pytree leaves and the flat vector a QP solver sees
(the "pytree slicing registry" of SURVEY.md §7).
"""

from __future__ import annotations

from typing import Dict, Mapping, NamedTuple

import jax.numpy as jnp

__all__ = ["IndexRange", "VariablesHandler"]


class IndexRange(NamedTuple):
    """(offset, size) pair — ``iDynTree::IndexRange`` equivalent."""

    offset: int
    size: int

    @property
    def slice(self) -> slice:
        return slice(self.offset, self.offset + self.size)


class VariablesHandler:
    """Stacks named variables into one flat vector.

    ``add_variable`` rejects duplicates (``VariablesHandler.cpp:13-30``
    returns false; host-side we raise), ``get_variable`` of an unknown name
    raises (the reference returns ``InvalidRange``,
    ``VariablesHandler.cpp:32-43``).
    """

    def __init__(self):
        self._variables: Dict[str, IndexRange] = {}
        self._num_variables = 0

    def add_variable(self, name: str, size: int) -> IndexRange:
        if name in self._variables:
            raise ValueError(
                f"[VariablesHandler::add_variable] variable {name!r} already exists"
            )
        if size <= 0:
            raise ValueError(f"variable {name!r} must have positive size")
        rng = IndexRange(self._num_variables, int(size))
        self._variables[name] = rng
        self._num_variables += int(size)
        return rng

    def get_variable(self, name: str) -> IndexRange:
        if name not in self._variables:
            raise KeyError(f"[VariablesHandler::get_variable] unknown variable {name!r}")
        return self._variables[name]

    def has_variable(self, name: str) -> bool:
        return name in self._variables

    @property
    def num_variables(self) -> int:
        return self._num_variables

    def names(self):
        return list(self._variables)

    # -- flat-vector helpers (the reason this exists, SURVEY.md §7) ----------
    def extract(self, name: str, flat: jnp.ndarray) -> jnp.ndarray:
        """Named view into the trailing axis of a (batched) flat vector."""
        r = self.get_variable(name)
        return flat[..., r.offset : r.offset + r.size]

    def pack(self, values: Mapping[str, jnp.ndarray]) -> jnp.ndarray:
        """Assemble the flat vector from named parts (all must be present)."""
        missing = set(self._variables) - set(values)
        if missing:
            raise KeyError(f"missing variables in pack(): {sorted(missing)}")
        parts = [jnp.asarray(values[n]) for n in self._variables]
        return jnp.concatenate(parts, axis=-1)

    def unpack(self, flat: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        return {n: self.extract(n, flat) for n in self._variables}
