"""Mesh construction helpers."""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


LM_AXIS = "lm"   # landmark-shard axis (data-parallel over map blocks)


def make_mesh(n_devices: int | None = None, axis: str = LM_AXIS) -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.array(devs[:n]), (axis,))


def landmark_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(LM_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
