from .mlp import (MLPSpec, init_mlp, mlp_apply, clamp_nonnegative,
                  count_params, bind, ACTIVATIONS)
from .io import load_reference_pth, params_from_torch_modules
