"""Independent plain-numpy oracle for the 6-DoF aircraft dynamics.

Formalises the role the reference's unused `numpydynamics.py` hinted at
(reference src/aircraft/dynamics/numpydynamics.py, SURVEY §4): a second,
deliberately-naive implementation of the same physics used only by the test
suite to cross-check the JAX kernels.  Written with explicit quaternion
matrix products (NOT the Rodrigues shortcut used in ops/quaternion.py) so an
algebra error in one implementation cannot hide in the other.
"""

from __future__ import annotations

import numpy as np

RHO = 1.225
DEG2RAD = np.pi / 180.0


def quat_mult(q1: np.ndarray, q2: np.ndarray) -> np.ndarray:
    """Hamilton product, xyzw storage, via the left-multiplication matrix."""
    x, y, z, w = q1
    L = np.array(
        [
            [w, -z, y, x],
            [z, w, -x, y],
            [-y, x, w, z],
            [-x, -y, -z, w],
        ]
    )
    return L @ q2


def quat_rotate(q: np.ndarray, v: np.ndarray) -> np.ndarray:
    """q * (v,0) * q^-1 by literal quaternion sandwich."""
    qv = np.array([v[0], v[1], v[2], 0.0])
    qinv = np.array([-q[0], -q[1], -q[2], q[3]]) / np.dot(q, q)
    return quat_mult(quat_mult(q, qv), qinv)[:3]


def quat_rotate_inv(q: np.ndarray, v: np.ndarray) -> np.ndarray:
    qinv = np.array([-q[0], -q[1], -q[2], q[3]]) / np.dot(q, q)
    return quat_rotate(qinv, v)


def default_coefficients(alpha, beta, aileron, elevator, rudder, omega):
    p, q, r = omega
    CD = 0.02 + 0.3 * alpha**2
    CL = 5.0 * alpha
    CY = -0.98 * beta
    Cl = 0.08 * 4 * aileron * DEG2RAD - 0.05 * p
    Cm = -1.2 * 5 * elevator * DEG2RAD - 0.5 * q
    Cn = -0.1 * 6 * rudder * DEG2RAD - 0.05 * r
    return np.array([-CD, CY, -CL, Cl, Cm, Cn])


def aircraft_state_derivative(
    x: np.ndarray,
    u: np.ndarray,
    *,
    mass: float,
    S: float,
    b: float,
    c: float,
    com: np.ndarray,
    static_inertia: np.ndarray,
    wind: np.ndarray | None = None,
    epsilon: float = 1e-6,
) -> np.ndarray:
    """13-state derivative with the default coefficient model."""
    p_ned, v_ned, q, omega = x[0:3], x[3:6], x[6:10], x[10:13]
    aileron, elevator, rudder, flaps = u[0], u[1], u[2], u[6]

    vel = v_ned if wind is None else v_ned + wind
    v_rel = quat_rotate_inv(q, vel) + epsilon
    uu, vv, ww = v_rel
    airspeed = np.sqrt(np.dot(v_rel, v_rel) + epsilon)
    alpha = np.arctan2(ww, uu + epsilon)
    beta = np.arcsin(vv / airspeed)
    qbar = 0.5 * RHO * np.dot(v_rel, v_rel)

    coeffs = default_coefficients(alpha, beta, aileron, elevator, rudder, omega)
    coeffs[0] += -0.1 * flaps
    coeffs[2] += -0.6 * flaps

    forces = coeffs[:3] * qbar * S
    forces[0] *= np.sign(uu)
    moments = coeffs[3:] * qbar * S * np.array([b, c, b])
    moments = moments + np.cross(com, forces)

    cx, cy, cz = com
    com_term = np.array(
        [
            [cy**2 + cz**2, -cx * cy, -cx * cz],
            [-cy * cx, cx**2 + cz**2, -cy * cz],
            [-cz * cx, -cz * cy, cx**2 + cy**2],
        ]
    )
    J = static_inertia + mass * com_term

    p_dot = v_ned
    v_dot = quat_rotate(q, forces) / mass + np.array([0.0, 0.0, 9.81])
    q_dot = 0.5 * quat_mult(q, np.array([omega[0], omega[1], omega[2], 0.0]))
    omega_dot = np.linalg.solve(J, moments - np.cross(omega, J @ omega))

    return np.concatenate([p_dot, v_dot, q_dot, omega_dot])


def rk4_step(f, x, u, dt):
    k1 = f(x, u)
    k2 = f(x + 0.5 * dt * k1, u)
    k3 = f(x + 0.5 * dt * k2, u)
    k4 = f(x + dt * k3, u)
    return x + dt / 6.0 * (k1 + 2 * k2 + 2 * k3 + k4)
