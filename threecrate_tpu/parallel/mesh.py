"""Device-mesh construction for sharded point-cloud pipelines.

The reference's parallelism is rayon thread pools + single-GPU wgpu
(SURVEY §2.10); the TPU replacement is a 1-D ``jax.sharding.Mesh``
over the *points axis* — a point cloud's N axis is its "sequence", and
sharding it across chips with ring-permuted partner shards is the
structural analog of ring attention (SURVEY §5 "long-context").
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

POINTS_AXIS = "points"


def make_mesh(n_devices: Optional[int] = None,
              axis_name: str = POINTS_AXIS,
              devices: Optional[Sequence] = None) -> Mesh:
    """1-D mesh over the points axis (the point-cloud 'DP/SP' axis)."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        if len(devices) < n_devices:
            raise ValueError(
                f"requested a {n_devices}-device mesh but only "
                f"{len(devices)} device(s) are available; for host-side "
                "testing set XLA_FLAGS=--xla_force_host_platform_device_"
                f"count={n_devices} with JAX_PLATFORMS=cpu before jax "
                "initialises")
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def shard_cloud_spec(axis_name: str = POINTS_AXIS) -> P:
    """PartitionSpec sharding leading (points) axis."""
    return P(axis_name)


def replicated_spec() -> P:
    return P()


def put_sharded(x, mesh: Mesh, axis_name: str = POINTS_AXIS):
    """Place an array with its leading axis sharded over the mesh."""
    return jax.device_put(x, NamedSharding(mesh, P(axis_name)))


def put_replicated(x, mesh: Mesh):
    return jax.device_put(x, NamedSharding(mesh, P()))
