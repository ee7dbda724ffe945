from .metrics import dtw, fastdtw, tip_dtw, pose_mse, pct_error, traj_mse
