from .quaternion import (quat_to_rotmat, quat_spatial_derivative,
                         quaternion_to_euler, pairwise_angular_velocity)
