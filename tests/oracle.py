"""Independent NumPy float64 oracle for parity testing.

A deliberately simple, loop-based re-derivation of the math contract the
reference implements (PoE FK, incremental-adjoint Jacobians, per-link-CoM
mass matrix, finite-difference Christoffel Coriolis, per-link gravity
wrenches — ``/root/reference/ManipulaPy/kinematics.py``, ``dynamics.py``).
Written from the textbook formulas, NOT imported from or copied out of the
reference: agreement between this oracle and the JAX framework at
float64 tolerance is the parity evidence (SURVEY.md section 7, stage 0).

The Coriolis term intentionally uses *central finite differences* with the
reference's epsilon (1e-6, ``dynamics.py:166``) so the tolerance between
the framework's exact autodiff Christoffels and this oracle bounds the
reference's own FD noise floor.
"""

import numpy as np


def skew(v):
    return np.array([[0, -v[2], v[1]], [v[2], 0, -v[0]], [-v[1], v[0], 0]], dtype=float)


def exp_twist(S, theta):
    w, v = S[:3], S[3:]
    if np.linalg.norm(w) < 1e-12:
        T = np.eye(4)
        T[:3, 3] = v * theta
        return T
    W = skew(w)
    R = np.eye(3) + np.sin(theta) * W + (1 - np.cos(theta)) * (W @ W)
    G = np.eye(3) * theta + (1 - np.cos(theta)) * W + (theta - np.sin(theta)) * (W @ W)
    T = np.eye(4)
    T[:3, :3] = R
    T[:3, 3] = G @ v
    return T


def adjoint(T):
    R, p = T[:3, :3], T[:3, 3]
    A = np.zeros((6, 6))
    A[:3, :3] = R
    A[3:, :3] = skew(p) @ R
    A[3:, 3:] = R
    return A


def fk_space(S_rows, M, q):
    T = np.eye(4)
    for S, th in zip(S_rows, q):
        T = T @ exp_twist(S, th)
    return T @ M


def jacobian_space(S_rows, q):
    n = len(q)
    J = np.zeros((6, n))
    T = np.eye(4)
    for i in range(n):
        J[:, i] = adjoint(T) @ S_rows[i]
        T = T @ exp_twist(S_rows[i], q[i])
    return J


def com_pose(S_rows, Mc, q, k):
    """Base -> link-k CoM at configuration q (prefix product up to joint k)."""
    T = np.eye(4)
    for i in range(k + 1):
        T = T @ exp_twist(S_rows[i], q[i])
    return T @ Mc[k]


def mass_matrix(S_rows, Mc, G, q):
    n = len(q)
    Js = jacobian_space(S_rows, q)
    M = np.zeros((n, n))
    for k in range(n):
        Tk = com_pose(S_rows, Mc, q, k)
        Jk = np.zeros((6, n))
        Jk[:, : k + 1] = adjoint(np.linalg.inv(Tk)) @ Js[:, : k + 1]
        M += Jk.T @ G[k] @ Jk
    return 0.5 * (M + M.T)


def gravity_forces(S_rows, Mc, G, q, g):
    n = len(q)
    Js = jacobian_space(S_rows, q)
    grav = np.zeros(n)
    for k in range(n):
        Tk = com_pose(S_rows, Mc, q, k)
        Jk = np.zeros((6, n))
        Jk[:, : k + 1] = adjoint(np.linalg.inv(Tk)) @ Js[:, : k + 1]
        F = np.zeros(6)
        F[3:] = G[k][3, 3] * (Tk[:3, :3].T @ (-np.asarray(g)))
        grav += Jk.T @ F
    return grav


def coriolis_fd(S_rows, Mc, G, q, dq, eps=1e-6):
    """Christoffel Coriolis from central-FD dM/dq (reference eps = 1e-6)."""
    n = len(q)
    dM = np.zeros((n, n, n))
    for k in range(n):
        qp, qm = np.array(q, float), np.array(q, float)
        qp[k] += eps
        qm[k] -= eps
        dM[:, :, k] = (mass_matrix(S_rows, Mc, G, qp) - mass_matrix(S_rows, Mc, G, qm)) / (
            2 * eps
        )
    c = np.zeros(n)
    for i in range(n):
        for j in range(n):
            for k in range(n):
                gamma = 0.5 * (dM[i, j, k] + dM[i, k, j] - dM[j, k, i])
                c[i] += gamma * dq[j] * dq[k]
    return c


def inverse_dynamics(S_rows, Mc, G, q, dq, ddq, g, f_tip=None):
    tau = mass_matrix(S_rows, Mc, G, q) @ ddq
    tau = tau + coriolis_fd(S_rows, Mc, G, q, dq)
    tau = tau + gravity_forces(S_rows, Mc, G, q, g)
    if f_tip is not None:
        tau = tau + jacobian_space(S_rows, q).T @ f_tip
    return tau


def model_arrays(model):
    """Pull float64 NumPy copies of a RobotModel's fields for the oracle."""
    return (
        np.asarray(model.screws_space, dtype=np.float64),
        np.asarray(model.com_home, dtype=np.float64),
        np.asarray(model.inertias, dtype=np.float64),
        np.asarray(model.home, dtype=np.float64),
    )
