from .metrics import dtw, fastdtw, tip_dtw, pose_mse, pct_error, traj_mse
from .tables import (EvalRecord, aggregate_seeds, evaluate_cells,
                     format_table, make_eval_data)
