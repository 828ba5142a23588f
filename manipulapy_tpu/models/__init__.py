"""Robot model PyTree and bundled-robot catalog."""

from .robot import RobotModel, make_robot_model

__all__ = ["RobotModel", "make_robot_model"]
