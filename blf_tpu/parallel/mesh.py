"""Mesh/topology module — the framework's distribution substrate.

The reference is single-threaded, single-process (verified exhaustively,
SURVEY.md §2.3); scaling is a *new* first-class component of the TPU build:
scenario data-parallelism over a ``("data",)`` axis is the primary strategy
(thousands of independent MPC scenarios), with a ``("model",)`` axis reserved
for sharding within one solve (horizon/constraint-row blocks).

This module owns mesh construction and pytree sharding helpers; the
collective reductions live in :mod:`blf_tpu.parallel.collectives`; the
sharded fleet step in :mod:`blf_tpu.parallel.sweep`.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["init_distributed", "make_mesh", "shard_batch", "replicate",
           "data_parallel_specs"]

DATA_AXIS = "data"
MODEL_AXIS = "model"


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> int:
    """Initialize multi-host JAX (one process per host of a pod slice).

    Thin, idempotent wrapper over ``jax.distributed.initialize``: on cloud
    TPU pods all three arguments are discovered from the runtime metadata,
    so bare ``init_distributed()`` is the whole multi-host launch story —
    afterwards ``jax.devices()`` spans the slice, :func:`make_mesh` builds a
    global mesh whose data axis rides ICI within hosts and DCN across them,
    and the ``shard_map`` fleet step (:mod:`blf_tpu.parallel.sweep`) runs
    unchanged (BASELINE "N ≥ 2 hosts" row). Single-process runs (no
    coordinator, one host) skip initialization and return 0.

    Returns this host's process index.
    """
    already = getattr(jax.distributed, "is_initialized", None)
    if callable(already) and already():
        return jax.process_index()
    if coordinator_address is None and num_processes is None:
        try:  # cloud TPU metadata path: fully automatic discovery
            jax.distributed.initialize()
        except (ValueError, RuntimeError):
            return 0  # single-process (CPU dev box / one-host run)
    else:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    return jax.process_index()


def make_mesh(
    n_devices: Optional[int] = None,
    model_axis: int = 1,
    axis_names: Tuple[str, str] = (DATA_AXIS, MODEL_AXIS),
) -> Mesh:
    """Build a ``(data, model)`` mesh over the available devices.

    ``n_devices`` defaults to all of ``jax.devices()``; ``model_axis`` is how
    many devices each scenario-shard group spans (1 = pure DP). On a v5e pod
    slice the data axis rides ICI; DCN only enters across hosts via
    ``jax.distributed`` initialization (outside this function's scope).
    """
    devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    if n_devices > len(devices):
        raise ValueError(f"requested {n_devices} devices, have {len(devices)}")
    if n_devices % model_axis != 0:
        raise ValueError("n_devices must be divisible by model_axis")
    shape = (n_devices // model_axis, model_axis)
    if n_devices == len(devices):
        # topology-aware placement: contiguous ICI neighborhoods per axis
        # (and per host on multi-host slices); falls back to enumeration
        # order when the physical topology doesn't factor into the shape.
        try:
            from jax.experimental import mesh_utils

            return Mesh(mesh_utils.create_device_mesh(shape), axis_names)
        except (ValueError, NotImplementedError, AssertionError):
            pass
    grid = np.asarray(devices[:n_devices]).reshape(shape)
    return Mesh(grid, axis_names)


def data_parallel_specs(mesh: Mesh):
    """(sharded, replicated) PartitionSpecs for scenario-batched arrays."""
    return P(mesh.axis_names[0]), P()


def shard_batch(pytree, mesh: Mesh, axis_name: str = DATA_AXIS):
    """Place a scenario-batched pytree with its leading axis sharded over
    ``axis_name`` (lanes stay resident on their device across ticks)."""
    sharding = NamedSharding(mesh, P(axis_name))
    return jax.tree_util.tree_map(
        lambda leaf: jax.device_put(leaf, sharding), pytree
    )


def replicate(pytree, mesh: Mesh):
    """Replicate (broadcast) a pytree across every device of the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(
        lambda leaf: jax.device_put(leaf, sharding), pytree
    )
