from .data import (make_training_data, make_validation_reference,
                   parse_traj_specs)
from .loss import (teacher_forced_loss, grow_predictions,
                   DEFAULT_KEYPOINTS_FAST, DEFAULT_KEYPOINTS_SLOW,
                   DEFAULT_KEYPOINTS_REAL)
from .online import (OnlineAdapter, OnlineConfig, OnlineSysId,
                     OnlineSysIdConfig)
from .sysid import (SysIdResult, fit_rod_params, apply_theta, theta_init,
                    theta_values, FITTABLE_FIELDS, IdentifiabilityReport,
                    identifiability, DesignResult, design_experiment,
                    LaplacePosterior, laplace_posterior, sample_posterior)
from .train import (TrainConfig, TrainResult, train_knode, make_train_step,
                    make_epoch_scan, make_optimizer, rollout_with_nn)
