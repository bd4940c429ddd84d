"""Device-mesh helpers.

The model is ~0.7M params, so the only parallel axis that matters is
``data`` (SURVEY.md §2.3): batches, corpora and gradients shard over it;
XLA inserts the ICI collectives.  These helpers keep mesh construction
in one place so pipelines work identically on 1 TPU chip, a v5e-8 slice,
or the 8-device CPU test mesh.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_data_mesh(n_devices: int | None = None) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), axis_names=("data",))


def shard_rows(mesh: Mesh) -> NamedSharding:
    """Rows sharded over the data axis."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
