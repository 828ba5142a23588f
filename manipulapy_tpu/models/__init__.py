"""Robot model PyTree and bundled-robot catalog.

``catalog`` holds programmatic factories (textbook screw parameters,
always available); ``data`` holds the 25+-robot DH-table catalog that
generates full URDF documents (the counterpart of the reference's
``ManipulaPy_data/`` bundle — ``get_robot_urdf``, ``list_robots``,
``get_robots_by_dof``, ``print_robot_catalog``).
"""

from . import catalog, data, robot_data
from .data import get_robots_by_dof, load_robot, print_robot_catalog
from .robot import RobotModel, make_robot_model
from .robot_data import get_robot_urdf

__all__ = [
    "RobotModel",
    "make_robot_model",
    "catalog",
    "data",
    "robot_data",
    "get_robot_urdf",
    "get_robots_by_dof",
    "load_robot",
    "print_robot_catalog",
]
