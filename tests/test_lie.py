"""Unit tests for the core Lie/screw math layer (parity with the behavior
of the reference's ``utils.py`` free functions, SURVEY.md section 2.1).

Checks are batched — one device call per property over a whole sample set —
both for speed and because batched execution is exactly how the framework
runs in production (and it exercises the accurate vectorized
transcendental paths; see core/lie.py::_wide).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from manipulapy_tpu.core import lie


def rand_rotvecs(rng, n, scale=np.pi * 0.95):
    v = rng.standard_normal((n, 3))
    v /= np.linalg.norm(v, axis=-1, keepdims=True)
    return v * rng.uniform(0.01, scale, size=(n, 1))


class TestSO3:
    def test_exp_log_roundtrip(self):
        rng = np.random.default_rng(0)
        w = jnp.asarray(rand_rotvecs(rng, 64))
        w2 = lie.so3_log(lie.so3_exp(w))
        np.testing.assert_allclose(np.asarray(w2), np.asarray(w), atol=1e-12)

    def test_exp_is_rotation(self):
        rng = np.random.default_rng(1)
        R = np.asarray(lie.so3_exp(jnp.asarray(rng.standard_normal((32, 3)))))
        np.testing.assert_allclose(
            R @ np.swapaxes(R, -1, -2), np.broadcast_to(np.eye(3), R.shape), atol=1e-12
        )
        assert np.all(np.linalg.det(R) > 0.99)

    def test_log_near_identity(self):
        w = jnp.asarray([[1e-8, -2e-8, 1.5e-8], [0.0, 0.0, 0.0]])
        out = np.asarray(lie.so3_log(lie.so3_exp(w)))
        np.testing.assert_allclose(out, np.asarray(w), atol=1e-14)

    def test_log_near_pi(self):
        """theta ~ pi branch (reference utils.py:305-326): compare the
        reconstructed rotation, since the axis sign is ambiguous at pi."""
        rng = np.random.default_rng(2)
        axes = rng.standard_normal((25, 3))
        axes /= np.linalg.norm(axes, axis=-1, keepdims=True)
        ws = []
        for theta in (np.pi, np.pi - 1e-7, np.pi - 1e-5, np.pi - 1e-3):
            ws.append(axes * theta)
        w = jnp.asarray(np.concatenate(ws))
        R = lie.so3_exp(w)
        R2 = lie.so3_exp(lie.so3_log(R))
        np.testing.assert_allclose(np.asarray(R2), np.asarray(R), atol=1e-6)

    def test_log_moderate_angles_tight(self):
        """Away from 0 and pi the roundtrip must be ~machine precision."""
        rng = np.random.default_rng(3)
        w = jnp.asarray(rand_rotvecs(rng, 128, scale=np.pi - 0.05))
        w2 = lie.so3_log(lie.so3_exp(w))
        np.testing.assert_allclose(np.asarray(w2), np.asarray(w), atol=1e-11)


class TestSE3:
    def test_exp_log_roundtrip(self):
        rng = np.random.default_rng(4)
        V = jnp.asarray(
            np.concatenate([rand_rotvecs(rng, 64), rng.standard_normal((64, 3))], axis=-1)
        )
        V2 = lie.se3_log(lie.se3_exp(V))
        np.testing.assert_allclose(np.asarray(V2), np.asarray(V), atol=1e-11)

    def test_pure_translation(self):
        V = jnp.asarray([0.0, 0.0, 0.0, 1.0, -2.0, 0.5])
        T = np.asarray(lie.se3_exp(V))
        np.testing.assert_allclose(T[:3, :3], np.eye(3), atol=1e-15)
        np.testing.assert_allclose(T[:3, 3], [1.0, -2.0, 0.5], atol=1e-15)
        np.testing.assert_allclose(
            np.asarray(lie.se3_log(jnp.asarray(T))), np.asarray(V), atol=1e-12
        )

    def test_trans_inv(self):
        rng = np.random.default_rng(5)
        T = lie.se3_exp(jnp.asarray(rng.standard_normal((16, 6))))
        prod = np.asarray(T @ lie.trans_inv(T))
        np.testing.assert_allclose(prod, np.broadcast_to(np.eye(4), prod.shape), atol=1e-12)


class TestTwists:
    def test_exp_twist_revolute_matches_se3_exp(self):
        rng = np.random.default_rng(6)
        w = rng.standard_normal((32, 3))
        w /= np.linalg.norm(w, axis=-1, keepdims=True)
        S = jnp.asarray(np.concatenate([w, rng.standard_normal((32, 3))], axis=-1))
        theta = jnp.asarray(rng.uniform(-np.pi, np.pi, 32))
        T1 = lie.exp_twist(S, theta)
        T2 = lie.se3_exp(S * theta[:, None])
        np.testing.assert_allclose(np.asarray(T1), np.asarray(T2), atol=1e-12)

    def test_exp_twist_prismatic(self):
        S = jnp.asarray([0.0, 0.0, 0.0, 0.0, 0.0, 1.0])
        T = np.asarray(lie.exp_twist(S, jnp.asarray(0.7)))
        expected = np.eye(4)
        expected[2, 3] = 0.7
        np.testing.assert_allclose(T, expected, atol=1e-15)

    def test_adjoint_composition(self):
        """Ad(T1 T2) = Ad(T1) Ad(T2), batched."""
        rng = np.random.default_rng(7)
        T1 = lie.se3_exp(jnp.asarray(rng.standard_normal((8, 6))))
        T2 = lie.se3_exp(jnp.asarray(rng.standard_normal((8, 6))))
        np.testing.assert_allclose(
            np.asarray(lie.adjoint(T1 @ T2)),
            np.asarray(lie.adjoint(T1) @ lie.adjoint(T2)),
            atol=1e-10,
        )

    def test_adjoint_inverse(self):
        rng = np.random.default_rng(8)
        T = lie.se3_exp(jnp.asarray(rng.standard_normal((8, 6))))
        np.testing.assert_allclose(
            np.asarray(lie.adjoint(lie.trans_inv(T))),
            np.linalg.inv(np.asarray(lie.adjoint(T))),
            atol=1e-10,
        )

    def test_ad_twist_bracket(self):
        """ad_V W == unhat([V^][W^] - [W^][V^]) via the se(3) commutator."""
        rng = np.random.default_rng(9)
        V = rng.standard_normal(6)
        W = rng.standard_normal(6)

        def hat(X):
            H = np.zeros((4, 4))
            H[:3, :3] = np.asarray(lie.skew(jnp.asarray(X[:3])))
            H[:3, 3] = X[3:]
            return H

        comm = hat(V) @ hat(W) - hat(W) @ hat(V)
        expected = np.concatenate([[comm[2, 1], comm[0, 2], comm[1, 0]], comm[:3, 3]])
        got = np.asarray(lie.ad_twist(jnp.asarray(V)) @ jnp.asarray(W))
        np.testing.assert_allclose(got, expected, atol=1e-12)


class TestEuler:
    def test_rpy_roundtrip(self):
        rng = np.random.default_rng(10)
        rpy = jnp.asarray(
            rng.uniform(
                [-np.pi, -np.pi / 2 + 0.05, -np.pi],
                [np.pi, np.pi / 2 - 0.05, np.pi],
                size=(64, 3),
            )
        )
        out = lie.rotation_to_rpy(lie.rpy_to_rotation(rpy))
        np.testing.assert_allclose(np.asarray(out), np.asarray(rpy), atol=1e-10)

    def test_quat_identity(self):
        np.testing.assert_allclose(
            np.asarray(lie.quat_to_rotation(jnp.asarray([0.0, 0.0, 0.0, 1.0]))),
            np.eye(3),
            atol=1e-15,
        )

    def test_quat_matches_exp(self):
        rng = np.random.default_rng(11)
        w = rand_rotvecs(rng, 32)
        theta = np.linalg.norm(w, axis=-1, keepdims=True)
        axis = w / theta
        q = np.concatenate([axis * np.sin(theta / 2), np.cos(theta / 2)], axis=-1)
        np.testing.assert_allclose(
            np.asarray(lie.quat_to_rotation(jnp.asarray(q))),
            np.asarray(lie.so3_exp(jnp.asarray(w))),
            atol=1e-12,
        )


@pytest.mark.slow
class TestJitGrad:
    def test_jit_compiles(self):
        f = jax.jit(lie.se3_log)
        T = lie.se3_exp(jnp.asarray([0.1, 0.2, 0.3, 0.4, 0.5, 0.6]))
        np.testing.assert_allclose(
            np.asarray(f(T)), [0.1, 0.2, 0.3, 0.4, 0.5, 0.6], atol=1e-10
        )

    def test_gradients_finite_at_zero(self):
        """Branchless small-angle paths must not emit NaN gradients — the
        MPC linearization differentiates through these maps at the
        identity (zero pose error) constantly."""
        g = jax.grad(lambda w: jnp.sum(lie.so3_exp(w)))(jnp.zeros(3))
        assert np.all(np.isfinite(np.asarray(g)))
        g2 = jax.grad(lambda V: jnp.sum(lie.se3_exp(V)))(jnp.zeros(6))
        assert np.all(np.isfinite(np.asarray(g2)))
        g3 = jax.grad(lambda V: jnp.sum(lie.se3_log(lie.se3_exp(V))))(jnp.zeros(6))
        assert np.all(np.isfinite(np.asarray(g3)))

    def test_grad_matches_fd(self):
        """Autodiff through exp/log agrees with finite differences away
        from the branch points."""
        w0 = jnp.asarray([0.3, -0.5, 0.7])
        C = jnp.asarray(np.arange(9.0).reshape(3, 3))

        def f(w):
            return jnp.sum(lie.so3_exp(w) * C)

        g = np.asarray(jax.grad(f)(w0))
        h = 1e-6
        for i in range(3):
            e = np.zeros(3)
            e[i] = h
            fd = (float(f(w0 + e)) - float(f(w0 - e))) / (2 * h)
            np.testing.assert_allclose(g[i], fd, rtol=1e-4)
