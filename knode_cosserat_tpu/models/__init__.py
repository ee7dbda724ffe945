from .mlp import (MLPSpec, init_mlp, mlp_apply, clamp_nonnegative,
                  count_params, bind, ACTIVATIONS)
