"""Basic URDF: catalog → parse → validate → RobotModel → FK/IK, fleet-wide.

Twin of the reference's ``urdf_processing_basic_demo.py``, widened to the
whole bundled catalog. Four phases:

1. **The catalog** — every bundled robot, grouped by DoF, with specs.
2. **One robot end-to-end** — parse, kinematic tree, limits table,
   validation report, screw extraction.
3. **FK → IK round trip** — on the extracted model.
4. **Fleet sweep** — parse + validate + FK EVERY catalog robot; reach
   chart saved to ``examples/out/urdf_catalog.png``.

Run: ``python examples/basic/urdf_demo.py [--robot ur5] [--cpu] [--quick]``.
"""

import sys, os; sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
from _bootstrap import parse_args

args = parse_args(__doc__)
QUICK = "--quick" in sys.argv

import jax.numpy as jnp
import numpy as np

from manipulapy_tpu import ik as ik_mod
from manipulapy_tpu.kinematics import forward_kinematics
from manipulapy_tpu.models import data as robot_data
from manipulapy_tpu.urdf import URDF, URDFParser, validate

OUT_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "out")
os.makedirs(OUT_DIR, exist_ok=True)

# -- Phase 1: the catalog -----------------------------------------------------
print("=" * 72)
print("Phase 1: the bundled robot catalog")
print("=" * 72)
names = robot_data.list_robots()
by_dof = {}
for nm in names:
    by_dof.setdefault(robot_data.get_robot_info(nm).dof, []).append(nm)
for dof in sorted(by_dof):
    print(f"  {dof} DoF ({len(by_dof[dof])}): {', '.join(by_dof[dof])}")
print(f"total: {len(names)} robots, all vendored as calibrated URDFs")

# -- Phase 2: one robot end-to-end -------------------------------------------
print("\n" + "=" * 72)
print(f"Phase 2: {args.robot} through the full pipeline")
print("=" * 72)
urdf_path = robot_data.get_robot_urdf(args.robot)
parsed = URDFParser().parse_file(urdf_path)
robot = URDF.load(urdf_path)
print(f"parsed {urdf_path}:")
print(f"  {len(robot.links)} links, {len(robot.joints)} joints "
      f"({len(robot.actuated_joints)} actuated), base link {robot.base_link!r}")
print(f"  kinematic chain: {' -> '.join(robot.get_chain())}")

res = validate(parsed)
print(f"validation: {'CLEAN' if res.is_valid else 'ERRORS'} "
      f"({len(res.errors)} errors, {len(res.warnings)} warnings)")
for issue in list(res.warnings)[:3]:
    print(f"    warn[{issue.code}]: {issue.message}")

print("\njoint limits (from the URDF, honored by IK/trajectory clamps):")
print(f"  {'joint':<24} {'lower':>8} {'upper':>8} {'effort':>8} {'vel':>6}")
for j in robot.actuated_joints:
    lo = j.limit.lower if j.limit and j.limit.lower is not None else -np.inf
    hi = j.limit.upper if j.limit and j.limit.upper is not None else np.inf
    ef = j.limit.effort if j.limit and j.limit.effort is not None else np.inf
    ve = j.limit.velocity if j.limit and j.limit.velocity is not None else np.inf
    print(f"  {j.name:<24} {lo:>8.2f} {hi:>8.2f} {ef:>8.1f} {ve:>6.2f}")

model = robot.to_robot_model()
print(f"\nextracted RobotModel: {model.num_joints} DoF; screw axes |w| = "
      f"{np.round(np.linalg.norm(np.asarray(model.screws_space[:, :3]), axis=1), 1)}")
print(f"home EE position: {np.round(np.asarray(model.home[:3, 3]), 4)}")

# -- Phase 3: FK -> IK round trip --------------------------------------------
print("\n" + "=" * 72)
print("Phase 3: FK -> IK round trip on the extracted model")
print("=" * 72)
q = jnp.asarray(np.linspace(0.2, 0.7, model.num_joints))
T = forward_kinematics(model, q)
res_ik = ik_mod.solve_ik(model, T, q + 0.25, max_iterations=200)
print(f"target from q = {np.round(np.asarray(q), 3)}")
print(f"IK from a perturbed guess: success={bool(res_ik.success)}, "
      f"pos err {float(res_ik.trans_err):.2e} m, rot err {float(res_ik.rot_err):.2e} rad, "
      f"{int(res_ik.iterations)} iterations")

# -- Phase 4: fleet sweep -----------------------------------------------------
print("\n" + "=" * 72)
print("Phase 4: parse + validate + FK across the whole catalog")
print("=" * 72)
sweep = names[:8] if QUICK else names
rows = []
print(f"  {'robot':<16} {'links':>5} {'joints':>6} {'valid':>5} {'reach spec':>10} {'FK |p| home':>11}")
for nm in sweep:
    try:
        u = URDF.from_string(robot_data.robot_urdf_string(nm))
        v = validate(URDFParser().parse_string(robot_data.robot_urdf_string(nm)))
        spec = robot_data.get_robot_info(nm)
        m = u.to_robot_model(tip_link="tool0")
        p_home = float(np.linalg.norm(np.asarray(m.home[:3, 3])))
        rows.append((nm, spec.reach, p_home, v.is_valid))
        print(f"  {nm:<16} {len(u.links):>5} {len(u.joints):>6} "
              f"{'yes' if v.is_valid else 'NO':>5} {spec.reach:>9.2f}m {p_home:>10.3f}m")
    except Exception as e:  # keep the sweep going; report the failure
        print(f"  {nm:<16} FAILED: {type(e).__name__}: {e}")
ok = sum(1 for r in rows if r[3])
print(f"\n{ok}/{len(sweep)} robots parse + validate clean")

try:
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    rows.sort(key=lambda r: r[1])
    labels = [r[0] for r in rows]
    reach = [r[1] for r in rows]
    home = [r[2] for r in rows]
    x = np.arange(len(rows))
    fig, ax = plt.subplots(figsize=(9, 4.5))
    ax.bar(x - 0.2, reach, width=0.4, color="#1f77b4", label="spec reach")
    ax.bar(x + 0.2, home, width=0.4, color="#ff7f0e", label="|home EE| (extracted)")
    ax.set_xticks(x)
    ax.set_xticklabels(labels, rotation=60, ha="right", fontsize=7)
    ax.set_ylabel("meters")
    ax.set_title("catalog: datasheet reach vs extracted home-pose extent")
    ax.legend(frameon=False)
    ax.grid(axis="y", alpha=0.2)
    out = os.path.join(OUT_DIR, "urdf_catalog.png")
    fig.tight_layout()
    fig.savefig(out, dpi=120)
    print(f"saved catalog chart -> {out}")
except ImportError:
    print("(matplotlib unavailable — plot skipped)")
