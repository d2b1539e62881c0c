from .model import RobotModel, build_xbot_model
from .step import PhysicsState, physics_step, make_physics_step

__all__ = [
    "RobotModel",
    "build_xbot_model",
    "PhysicsState",
    "physics_step",
    "make_physics_step",
]
