"""ginfinity_tpu — TPU-native RNA secondary-structure embedding framework.

A from-scratch JAX/XLA/Pallas rebuild with the capabilities of the
GINFINITY reference package (RNA graph embedding via GINE encoders,
window scanning, similarity search, embedding-space alignment and MSA),
re-designed TPU-first:

- graphs as flat arrays (no networkx objects on the hot path),
- length-bucketed padded batches feeding a jit-compiled encoder,
- segment-sum message passing on device,
- pjit/shard_map data-parallel inference, search and training over a
  ``jax.sharding.Mesh``,
- anti-diagonal ``lax.scan`` / Pallas wavefront kernels for alignment DP.
"""

__version__ = "0.1.0"

from ginfinity_tpu.utils.jaxinit import init_jax_defaults as _init_jax_defaults

_init_jax_defaults()

from ginfinity_tpu.graphs.dotbracket import is_valid_dot_bracket, pair_table
from ginfinity_tpu.graphs.build import GraphArrays, build_graph_arrays
from ginfinity_tpu.models.gine import GINConfig, GINModel

__all__ = [
    "is_valid_dot_bracket",
    "pair_table",
    "GraphArrays",
    "build_graph_arrays",
    "GINConfig",
    "GINModel",
]
