from .mesh import make_mesh, edge_sharding, replicated, EDGE_AXIS
from .sharded import (make_sharded_fa_step, sharded_force_atlas,
                      pad_graph_for_mesh)
from .sharded_ml import prepare_refine_sharded, refine_level_sharded
from . import multihost
