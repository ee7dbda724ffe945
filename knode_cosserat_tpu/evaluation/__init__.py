from .metrics import dtw, fastdtw, tip_dtw, pose_mse, pct_error, traj_mse
from ..ops.dtw import batch_dtw_device, dtw_device, tip_dtw_device
from .tables import (EvalRecord, aggregate_seeds, evaluate_cells,
                     format_table, make_eval_data)
