#!/usr/bin/env python3
"""Vendor the reference's calibrated robot URDF XMLs into the package.

Copies every ``*.urdf`` under the reference data tree
(``ManipulaPy/ManipulaPy_data`` in boelnasr/ManipulaPy) into
``manipulapy_tpu/data/robots/`` preserving relative paths, and writes a
PROVENANCE.md with per-file SHA-256 sums. Only the URDF XML (robot
calibration data: kinematics, inertials, limits) is vendored — the ~143 MB
of visual meshes are NOT copied; geometry loading is lazy and dynamics
never needs meshes (reference ``urdf/types.py:314-428``).

Run: ``python tools/vendor_robot_data.py [reference_data_dir]``
"""

from __future__ import annotations

import hashlib
import sys
from pathlib import Path

DEFAULT_SRC = Path("/root/reference/ManipulaPy/ManipulaPy_data")
DEST = Path(__file__).resolve().parent.parent / "manipulapy_tpu" / "data" / "robots"


def main() -> int:
    src = Path(sys.argv[1]) if len(sys.argv) > 1 else DEFAULT_SRC
    if not src.is_dir():
        print(f"reference data dir not found: {src}", file=sys.stderr)
        return 1
    DEST.mkdir(parents=True, exist_ok=True)
    rows = []
    for urdf in sorted(src.rglob("*.urdf")):
        rel = urdf.relative_to(src)
        out = DEST / rel
        out.parent.mkdir(parents=True, exist_ok=True)
        data = urdf.read_bytes()
        out.write_bytes(data)
        rows.append((str(rel), hashlib.sha256(data).hexdigest(), len(data)))
        print(f"vendored {rel} ({len(data)} bytes)")

    prov = DEST / "PROVENANCE.md"
    with prov.open("w") as f:
        f.write(
            "# Vendored robot URDF data\n\n"
            "These URDF XML files are **data** (robot kinematic/inertial\n"
            "calibration), vendored verbatim from the reference package\n"
            "`boelnasr/ManipulaPy` (`ManipulaPy/ManipulaPy_data/`, AGPL-3.0,\n"
            "(c) 2025 Mohamed Aboelnasr) so the framework ships a standalone\n"
            "robot catalog whose dynamics match the reference exactly.\n"
            "Meshes referenced by the XML are intentionally not vendored;\n"
            "geometry loading is lazy and dynamics never touches meshes.\n\n"
            "| file | sha256 | bytes |\n|---|---|---|\n"
        )
        for rel, sha, n in rows:
            f.write(f"| {rel} | {sha} | {n} |\n")
    print(f"wrote {prov} ({len(rows)} files)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
