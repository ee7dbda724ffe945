from .params import (RodParams, make_rod, derive, experimental_rod,
                     original_rod, apply_mod, MODS, MODS_ORIGINAL)
from .rhs import rhs, nn_input_features
from .spatial import (integrate_euler, integrate_rk4, residual_euler,
                      residual_rk4, next_segment_euler, base_state,
                      tip_residual)
from .shooting import newton_solve, implicit_root, NewtonStats
from .stepper import simulate, simulate_scan, initial_state, SimOutput
from .fast_rollout import make_fast_rollout, make_fast_step
from .assembly import (RodAssembly, PlateParams, make_ring_assembly,
                       stack_rods, simulate_assembly, assembly_solve_step,
                       AssemblySimOutput)
