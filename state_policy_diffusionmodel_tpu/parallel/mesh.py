"""Device mesh and sharding utilities.

The reference trains on exactly one GPU (`pl.Trainer(accelerator='gpu',
devices=[0])`, `/root/reference/train.py:104`) with no collectives; this
framework introduces parallelism as a first-class component: a named
`jax.sharding.Mesh` with a `data` axis for batch/env sharding (gradients
reduce over ICI inside jit) and a `model` axis reserved for tensor-parallel
layouts of larger nets.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(shape: Optional[Sequence[int]] = None,
              axis_names: Sequence[str] = ("data", "model")) -> Mesh:
    """Mesh over all visible devices; default layout puts every device on the
    `data` axis."""
    devices = np.asarray(jax.devices())
    if shape is None:
        shape = (len(devices), 1)
    return Mesh(devices.reshape(*shape), axis_names=tuple(axis_names))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Batch-dim sharding: leading axis split over `data`."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    """Place a host batch with its leading dim sharded over `data`."""
    sh = data_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)


def replicate(tree, mesh: Mesh):
    sh = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)


def pad_to_multiple(batch, multiple: int):
    """Pad the leading dim so it divides the mesh (repeat-last padding);
    returns (padded_batch, real_size)."""
    sizes = {x.shape[0] for x in jax.tree.leaves(batch)}
    assert len(sizes) == 1, sizes
    n = sizes.pop()
    rem = (-n) % multiple
    if rem == 0:
        return batch, n
    pad = lambda x: np.concatenate([x, np.repeat(x[-1:], rem, 0)], 0)
    return jax.tree.map(pad, batch), n
