"""Sharding placement helpers.

``shard_particles`` places a ``(frames, particles, dims)`` block with the
particle axis split over the active mesh (see parallel.mesh). Kernels in
``ops`` are pure jnp programs, so under ``jit`` XLA partitions the
batched FFTs per shard and inserts the ICI all-reduce only at the final
particle mean — the TPU-native replacement for the communication the
reference never had (SURVEY.md §2d).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from .mesh import ATOM_AXIS, current_mesh


def _pad_to_multiple(arr: jnp.ndarray, axis: int, multiple: int):
    size = arr.shape[axis]
    rem = size % multiple
    if rem == 0:
        return arr, size
    pad = [(0, 0)] * arr.ndim
    pad[axis] = (0, multiple - rem)
    return jnp.pad(arr, pad), size


def shard_particles(arr, axis: int = 1):
    """Place ``arr`` with its particle axis sharded over the active mesh.

    Pads the particle axis up to a multiple of the mesh size (callers
    must slice results back with the original count). No-op when no mesh
    is active.
    """
    mesh = current_mesh()
    arr = jnp.asarray(arr)
    if mesh is None:
        return arr, arr.shape[axis]
    n_dev = mesh.shape[ATOM_AXIS]
    arr, orig = _pad_to_multiple(arr, axis, n_dev)
    spec = [None] * arr.ndim
    spec[axis] = ATOM_AXIS
    sharding = NamedSharding(mesh, P(*spec))
    return jax.device_put(arr, sharding), orig


def shard_frames_axis(arr):
    """Device placement for a (frames, particles, dims) analysis block:
    particle axis over the mesh when active, plain device_put otherwise.

    Returns only the (possibly padded) array; zero-padded particles
    contribute zero rows that callers drop by slicing to the original
    particle count.
    """
    arr = jnp.asarray(arr)
    mesh = current_mesh()
    if mesh is None:
        return arr
    out, _ = shard_particles(arr, axis=1)
    return out
