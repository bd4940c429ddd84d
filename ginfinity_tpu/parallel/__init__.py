from ginfinity_tpu.parallel.mesh import make_data_mesh
from ginfinity_tpu.parallel.search import TopKSearcher

__all__ = ["make_data_mesh", "TopKSearcher"]
