"""Locate and import the actual reference package (boelnasr/ManipulaPy).

The parity harness (``benchmarks/reference_parity.py`` and
``tests/test_reference_parity.py``) compares this framework's outputs
against the *real* reference implementation — not a re-derivation — so
every "parity" number in the repo is grounded in the reference's own code
(``ManipulaPy/dynamics.py:313-369`` via the accurate
``urdf_processor.py:287-302`` path).

Lookup: an importable ``ManipulaPy`` on ``sys.path``, else a checkout at
``$MANIPULAPY_REFERENCE`` (default ``/root/reference``). Returns None when
unavailable (tests skip, benchmarks abort with a message).
"""

from __future__ import annotations

import importlib
import os
import sys
from typing import Optional

_DEFAULT_CHECKOUT = "/root/reference"


def load_reference() -> Optional[object]:
    """Import and return the ``ManipulaPy`` package, or None."""
    os.environ.setdefault("MANIPULAPY_QUIET", "1")
    try:
        return importlib.import_module("ManipulaPy")
    except ImportError:
        pass
    checkout = os.environ.get("MANIPULAPY_REFERENCE", _DEFAULT_CHECKOUT)
    if os.path.isdir(os.path.join(checkout, "ManipulaPy")):
        if checkout not in sys.path:
            sys.path.insert(0, checkout)
        try:
            return importlib.import_module("ManipulaPy")
        except ImportError:
            return None
    return None


def reference_stack(urdf_path: str):
    """Reference ``(SerialManipulator, ManipulatorDynamics, robot_data,
    tip_link)`` for a URDF, through the facade path that wires the accurate
    ``Mlist_per_link`` mass matrix (``urdf_processor.py:287-302``).

    ``tip_link`` is the end-effector link the reference picked IN THIS
    PROCESS: its default tip is ``end_links[0]`` where ``end_links`` comes
    from ``list(set_difference)`` (``urdf/core.py:449``) — i.e. Python
    string-hash order, which varies per process under hash randomization
    when a robot has several leaf links. Comparisons must pin this same
    tip on our side or FK/B-list parity fails spuriously."""
    from ManipulaPy.urdf_processor import URDFToSerialManipulator

    proc = URDFToSerialManipulator(urdf_path)
    tip = proc.robot.end_effector_link.name
    return proc.serial_manipulator, proc.dynamics, proc.robot_data, tip


def reference_available() -> bool:
    return load_reference() is not None
