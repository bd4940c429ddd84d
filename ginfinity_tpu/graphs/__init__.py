from ginfinity_tpu.graphs.dotbracket import is_valid_dot_bracket, pair_table, loop_features
from ginfinity_tpu.graphs.build import GraphArrays, build_graph_arrays
from ginfinity_tpu.graphs.batching import GraphBatch, batch_graphs, bucket_sizes

__all__ = [
    "is_valid_dot_bracket",
    "pair_table",
    "loop_features",
    "GraphArrays",
    "build_graph_arrays",
    "GraphBatch",
    "batch_graphs",
    "bucket_sizes",
]
