from .mesh import make_mesh, data_sharding, replicated, shard_params_tp
from .sharded_train import ShardedTrainer
from .grid import GridCell, GridResult, grid_train, build_grid
from .distributed import init_distributed, is_multihost, process_summary
