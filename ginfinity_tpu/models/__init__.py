from ginfinity_tpu.models.gine import GINConfig, GINModel, init_params, forward_once, encode_nodes
from ginfinity_tpu.models.checkpoint import (
    load_checkpoint,
    save_checkpoint,
    import_torch_checkpoint,
    export_torch_checkpoint,
)

__all__ = [
    "GINConfig",
    "GINModel",
    "init_params",
    "forward_once",
    "encode_nodes",
    "load_checkpoint",
    "save_checkpoint",
    "import_torch_checkpoint",
    "export_torch_checkpoint",
]
