from .quaternion import (quat_to_rotmat, quat_spatial_derivative,
                         quaternion_to_euler, pairwise_angular_velocity)
from .dtw import batch_dtw_device, dtw_device, tip_dtw_device
from .linalg import solve_small, solve_spd_small
from .pallas_sweep import make_sweep_kernel
from .pallas_step import make_step_kernel
from .pallas_train import (fused_state_from_optax, fused_trainer_supported,
                           make_fused_grid_training_run,
                           make_fused_training_run, optax_state_from_fused)
