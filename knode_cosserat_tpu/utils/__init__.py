from .data_processing import normalize_data, denormalize_data
from .logging import MetricsLogger
from .profiling import Timer, annotate, timed, trace
from .health import GuardedTraining, RolloutReport, check_rollout
