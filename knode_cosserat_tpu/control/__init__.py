"""Control: gradient-based MPC through the differentiable rollout."""
from .mpc import MPCController, PlanResult, PlanState, make_planner, rollout_tips

__all__ = ["MPCController", "PlanResult", "PlanState", "make_planner",
           "rollout_tips"]
