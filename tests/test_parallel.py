"""Distributed-layer tests on the 8-device virtual CPU mesh (the
multi-chip testing strategy: xla_force_host_platform_device_count in
conftest — SURVEY.md section 4's 'GPU-without-GPU' analogue)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from manipulapy_tpu import parallel
from manipulapy_tpu.models import catalog

pytestmark = pytest.mark.multichip


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= 8, "conftest must provide 8 virtual devices"
    return parallel.make_mesh(8)


@pytest.fixture(scope="module")
def ur5_f32():
    return catalog.ur5(dtype=jnp.float32)


class TestMeshBasics:
    def test_mesh_shape(self, mesh):
        assert mesh.devices.size == 8
        assert mesh.axis_names == ("scenario",)

    def test_shard_batch_placement(self, mesh):
        x = jnp.arange(32.0).reshape(16, 2)
        xs = parallel.shard_batch(x, mesh)
        assert xs.sharding.num_devices == 8
        np.testing.assert_allclose(np.asarray(xs), np.asarray(x))

    def test_replicate_model(self, mesh, ur5_f32):
        m = parallel.replicate_model(ur5_f32, mesh)
        assert m.screws_space.sharding.is_fully_replicated


class TestShardedCompute:
    def test_sharded_vmap_matches_local(self, mesh, ur5_f32):
        from manipulapy_tpu.kinematics import forward_kinematics

        rng = np.random.default_rng(0)
        qs = jnp.asarray(rng.uniform(-1, 1, (16, 6)), dtype=jnp.float32)
        f = parallel.sharded_vmap(forward_kinematics, mesh)
        out = f(ur5_f32, qs)
        local = jax.vmap(lambda q: forward_kinematics(ur5_f32, q))(qs)
        np.testing.assert_allclose(np.asarray(out), np.asarray(local), atol=1e-6)

    def test_sharded_vmap_ragged_batch(self, mesh, ur5_f32):
        """Batch not divisible by device count: padded internally,
        un-padded on return."""
        from manipulapy_tpu.kinematics import forward_kinematics

        qs = jnp.asarray(np.random.default_rng(1).uniform(-1, 1, (13, 6)), dtype=jnp.float32)
        out = parallel.sharded_vmap(forward_kinematics, mesh)(ur5_f32, qs)
        assert out.shape == (13, 4, 4)

    @pytest.mark.slow
    def test_distributed_rollout(self, mesh, ur5_f32):
        B, N = 16, 5
        rng = np.random.default_rng(2)
        q0 = jnp.asarray(rng.uniform(-0.5, 0.5, (B, 6)), dtype=jnp.float32)
        dq0 = jnp.zeros((B, 6), dtype=jnp.float32)
        taus = jnp.asarray(rng.uniform(-5, 5, (B, N, 6)), dtype=jnp.float32)
        qs, dqs, dds = parallel.distributed_rollout(ur5_f32, mesh, q0, dq0, taus, dt=0.01)
        assert qs.shape == (B, N, 6)
        assert np.all(np.isfinite(np.asarray(qs)))

    @pytest.mark.slow
    def test_distributed_ik(self, mesh, ur5_f32):
        from manipulapy_tpu.kinematics import forward_kinematics

        rng = np.random.default_rng(3)
        q_true = jnp.asarray(rng.uniform(-1.0, 1.0, (8, 6)), dtype=jnp.float32)
        targets = jax.vmap(lambda q: forward_kinematics(ur5_f32, q))(q_true)
        res = parallel.distributed_ik(
            ur5_f32, mesh, targets, q_true + 0.1, max_iterations=60, eomg=1e-3, ev=1e-3
        )
        assert np.asarray(res.success).mean() >= 0.75


class TestGraftEntry:
    def test_entry_compiles(self):
        import importlib.util, os

        spec = importlib.util.spec_from_file_location(
            "graft_entry", os.path.join(os.path.dirname(__file__), "..", "__graft_entry__.py")
        )
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        fn, args = mod.entry()
        out = jax.jit(fn)(*args)
        jax.block_until_ready(out)
        assert out[0].shape == args[0].shape

    @pytest.mark.slow
    def test_dryrun_multichip(self):
        import importlib.util, os

        spec = importlib.util.spec_from_file_location(
            "graft_entry2", os.path.join(os.path.dirname(__file__), "..", "__graft_entry__.py")
        )
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        mod.dryrun_multichip(8)


class TestScalingReport:
    def test_scaling_efficiency(self):
        eff = parallel.scaling_efficiency({1: 10.0, 2: 10.5, 4: 11.0})
        assert eff[1] == pytest.approx(1.0)
        assert 0.9 < eff[2] < 1.0


class TestShardedFusedMPC:
    """The flagship composition (parallel/fused_fleet.py): the batched
    fused Pallas solver under shard_map on the scenario axis, proven in
    Pallas interpret mode on the 8-device virtual mesh. Parity bar: the
    sharded solve matches the unsharded fused solver per scenario (f32
    fusion-order drift only), and the psum fleet cost matches the mean."""

    def test_sharded_matches_unsharded(self, mesh):
        from manipulapy_tpu.mpc.fused_batch import build_batch_tracking_mpc
        from manipulapy_tpu.parallel import build_sharded_batch_mpc

        model = catalog.two_link_planar(dtype=jnp.float32)
        B, H, n = 16, 10, 2
        rng = np.random.default_rng(0)
        x0 = jnp.asarray(rng.uniform(-0.3, 0.3, (B, 4)), jnp.float32)
        goals = jnp.asarray(rng.uniform(-0.8, 0.8, (B, n)), jnp.float32)
        us0 = jnp.zeros((B, H, n), jnp.float32)

        smpc = build_sharded_batch_mpc(
            model, mesh, goals, B, H, 0.02, iterations=3, interpret=True
        )
        us_s, xs_s, cost_s, fleet = smpc.solve(x0, us0)
        assert us_s.shape == (B, H, n) and xs_s.shape == (B, H + 1, 2 * n)

        ref = build_batch_tracking_mpc(model, goals, B, H, 0.02, iterations=3, interpret=True)
        us_r, xs_r, cost_r = ref.solve(x0, us0)
        np.testing.assert_allclose(np.asarray(cost_s), np.asarray(cost_r), rtol=1e-4)
        np.testing.assert_allclose(np.asarray(us_s), np.asarray(us_r), atol=5e-3)
        np.testing.assert_allclose(float(fleet), float(jnp.mean(cost_r)), rtol=1e-5)

    def test_runtime_retarget_under_sharding(self, mesh):
        from manipulapy_tpu.parallel import build_sharded_batch_mpc

        model = catalog.two_link_planar(dtype=jnp.float32)
        B, H, n = 8, 8, 2
        g1 = jnp.zeros((B, n), jnp.float32)
        g2 = jnp.full((B, n), 0.5, jnp.float32)
        smpc = build_sharded_batch_mpc(
            model, mesh, g1, B, H, 0.02, iterations=2, interpret=True
        )
        x0 = jnp.zeros((B, 2 * n), jnp.float32)
        us0 = jnp.zeros((B, H, n), jnp.float32)
        us_a, _, _, _ = smpc.solve(x0, us0)          # goal = origin, at origin
        us_b, _, _, _ = smpc.solve(x0, us0, g2)      # re-targeted, same compile
        assert float(jnp.max(jnp.abs(us_a))) < 1e-5  # already at goal
        assert float(jnp.max(jnp.abs(us_b))) > 1e-3  # re-target drives torque

    def test_batch_divisibility_validation(self, mesh):
        from manipulapy_tpu.parallel import build_sharded_batch_mpc

        model = catalog.two_link_planar(dtype=jnp.float32)
        with pytest.raises(ValueError, match="divide"):
            build_sharded_batch_mpc(
                model, mesh, jnp.zeros(2), 12, 8, 0.02, interpret=True
            )

    @pytest.mark.slow
    def test_fleet_mpc_round_fused_matches_ilqr(self, mesh):
        """fleet_mpc_round(solver='fused_batch'): heterogeneous fleet on
        the fused sharded solver matches the generic distributed round."""
        from manipulapy_tpu.mpc import ILQRParams
        from manipulapy_tpu.parallel import fleet_mpc_round, stack_models

        models = [
            catalog.two_link_planar(dtype=jnp.float32),
            catalog.serial_chain(3, dtype=jnp.float32),
        ]
        fl = stack_models(models)
        R, S, n_max, H = 2, 8, fl.num_joints, 8
        rng = np.random.default_rng(0)
        x0 = jnp.zeros((R, S, 2 * n_max), jnp.float32)
        us0 = jnp.zeros((R, S, H, n_max), jnp.float32)
        q_goals = jnp.asarray(
            rng.uniform(-0.5, 0.5, (R, S, n_max)), jnp.float32
        ) * jnp.asarray(np.asarray(fl.mask))[:, None, :]
        params = ILQRParams(horizon=H, dt=0.02, iterations=2, line_search_steps=4)

        us_f, costs_f, fc_f = fleet_mpc_round(
            fl, mesh, x0, us0, q_goals, params, solver="fused_batch"
        )
        assert us_f.shape == (R, S, H, n_max)
        # Padded joints exactly zero (two_link has n=2, fleet n_max=3).
        assert float(jnp.max(jnp.abs(us_f[0, :, :, 2:]))) == 0.0

        us_g, costs_g, fc_g = fleet_mpc_round(
            fl, mesh, x0, us0, q_goals, params, solver="ilqr"
        )
        np.testing.assert_allclose(np.asarray(costs_f), np.asarray(costs_g), rtol=0.05)
        np.testing.assert_allclose(float(fc_f), float(fc_g), rtol=0.05)
