"""Native URDF subsystem: parser, kinematic tree, model export.

Counterpart of the reference's ``ManipulaPy/urdf/`` package (SURVEY.md
section 2.5). ``URDF.load(path).to_robot_model()`` is the pipeline from a
robot description file to the device-side PyTree.
"""

from .core import URDF
from .parser import PackageResolver, URDFParser
from .types import (
    Box,
    Collision,
    Cylinder,
    Inertial,
    Joint,
    JointDynamics,
    JointLimit,
    JointMimic,
    JointType,
    Link,
    Mesh,
    Origin,
    Sphere,
    Visual,
)

__all__ = [
    "URDF",
    "URDFParser",
    "PackageResolver",
    "Origin",
    "Inertial",
    "Link",
    "Joint",
    "JointType",
    "JointLimit",
    "JointDynamics",
    "JointMimic",
    "Box",
    "Cylinder",
    "Sphere",
    "Mesh",
    "Visual",
    "Collision",
]
