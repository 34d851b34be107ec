"""Device mesh construction and data-parallel batch solving.

Data-parallel ARAP is communication-free: every chip owns whole problems
(batch entries), exactly like the reference's one-GPU-per-worker farm
(para_gen.py:560-567) but on-chip-batched and without processes or tmp files.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops import solver as S


def make_mesh(
    n_devices: int | None = None,
    data: int | None = None,
    space: int = 1,
    devices=None,
) -> Mesh:
    """Create a ('data', 'space') mesh. Defaults to all devices on 'data'."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    if data is None:
        data = n // space
    assert data * space == n, f"mesh {data}x{space} != {n} devices"
    arr = np.asarray(devices).reshape(data, space)
    return Mesh(arr, ("data", "space"))


def shard_batch(ops_batched, mesh: Mesh):
    """Place batched operands with the batch axis sharded over 'data'."""
    def put(leaf):
        spec = P("data", *([None] * (leaf.ndim - 1)))
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree.map(put, ops_batched)


@lru_cache(maxsize=None)
def _solve_batch_sharded_fn(mesh: Mesh, cfg: S.SolverConfig):
    """Cached jit(shard_map(solve_batch)) — a fresh shard_map per call would
    recompile every time."""
    from jax.sharding import PartitionSpec as P

    spec = P("data")

    def fn(ops):
        return S.solve_batch(ops, cfg)

    return jax.jit(jax.shard_map(
        fn, mesh=mesh, in_specs=(spec,), out_specs=(spec, spec),
        check_vma=False,
    ))


def solve_batch_sharded(ops_batched, cfg: S.SolverConfig, mesh: Mesh):
    """Data-parallel batched solve: batch sharded over the mesh's 'data' axis
    via shard_map — each device traces its own LOCAL-batch program (the
    batched program may contain pallas_calls, which the GSPMD auto-partitioner
    cannot split), with zero collectives (each chip owns whole problems).
    Batch size must be divisible by the data-axis size.
    """
    return _solve_batch_sharded_fn(mesh, cfg.resolve())(
        shard_batch(ops_batched, mesh)
    )
