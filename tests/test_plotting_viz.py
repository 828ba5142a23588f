"""Tests for the plotting layer and URDF visualization.

Reference counterparts: trajectory/step-response/workspace plots
(``path_planning.py:1928-2232``, ``control.py:680-847``,
``singularity.py:186-214``) and ``urdf/visualization/``.
All run headless on the Agg backend.
"""

import matplotlib

matplotlib.use("Agg")

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from manipulapy_tpu import plotting
from manipulapy_tpu.models import catalog
from manipulapy_tpu.models.data import get_robot_urdf
from manipulapy_tpu.singularity import manipulability_ellipsoid, monte_carlo_workspace
from manipulapy_tpu.trajectory import joint_trajectory
from manipulapy_tpu.urdf import URDF, animate_robot, show_robot


@pytest.fixture(scope="module")
def ur5():
    return catalog.ur5(dtype=jnp.float64)


@pytest.fixture(scope="module")
def ur5_urdf():
    return URDF.load(get_robot_urdf("ur5"))


def _close(fig):
    import matplotlib.pyplot as plt

    plt.close(fig)


class TestPlotting:
    def test_plot_trajectory(self, ur5):
        traj = joint_trajectory(ur5, jnp.zeros(6), jnp.ones(6), Tf=2.0, N=32, method=5)
        fig = plotting.plot_trajectory(traj, Tf=2.0)
        assert len(fig.axes) == 3
        _close(fig)

    def test_plot_ee_trajectory(self):
        p = np.stack([np.linspace(0, 1, 20)] * 3, axis=1)
        fig = plotting.plot_ee_trajectory(p)
        assert fig.axes
        _close(fig)

    def test_plot_step_response_computes_metrics(self):
        t = np.linspace(0, 5, 200)
        y = 1 - np.exp(-2 * t) * np.cos(3 * t)
        fig = plotting.plot_step_response(t, y, 1.0)
        assert "overshoot" in fig.axes[0].get_title()
        _close(fig)

    def test_plot_manipulability_ellipsoid(self, ur5):
        q = jnp.asarray([0.1, -0.4, 0.6, 0.2, 0.3, -0.2], dtype=jnp.float64)
        lin, ang = manipulability_ellipsoid(ur5, q)
        fig = plotting.plot_manipulability_ellipsoid(lin)
        assert fig.axes
        _close(fig)

    def test_plot_workspace_subsamples(self, ur5):
        pts = monte_carlo_workspace(ur5, jax.random.PRNGKey(0), num_samples=500)
        fig = plotting.plot_workspace(pts, max_points=100)
        assert "100 samples" in fig.axes[0].get_title()
        _close(fig)


class TestURDFVisualization:
    def test_show_robot_matplotlib(self, ur5_urdf):
        fig = show_robot(ur5_urdf, show_names=True)
        assert fig.axes
        # skeleton drew one line per joint and a scatter of link origins
        assert len(fig.axes[0].lines) >= len(ur5_urdf.joints)
        _close(fig)

    def test_urdf_show_method(self, ur5_urdf):
        fig = ur5_urdf.show(cfg={ur5_urdf.joints[0].name: 0.5})
        assert fig.axes
        _close(fig)

    def test_animate_robot_frames(self, ur5_urdf):
        jname = ur5_urdf.joints[0].name
        cfgs = [{jname: v} for v in np.linspace(0, 1, 4)]
        anim = animate_robot(ur5_urdf, cfgs, interval_ms=10)
        # drawing frame 2 must not raise
        anim._func(2)
        _close(anim._fig)

    def test_pybullet_backend_gated(self, ur5_urdf):
        try:
            import pybullet  # noqa: F401

            pytest.skip("pybullet installed; gate not exercised")
        except ImportError:
            pass
        with pytest.raises(ImportError, match="pybullet"):
            show_robot(ur5_urdf, backend="pybullet")
