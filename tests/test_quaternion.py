"""Unit tests for the xyzw quaternion library against scipy and closed forms."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation as R

from aircraft_tpu.ops import quaternion as quat

RNG = np.random.default_rng(0)


def random_unit_quats(n):
    q = RNG.standard_normal((n, 4)).astype(np.float32)
    return q / np.linalg.norm(q, axis=-1, keepdims=True)


class TestAlgebra:
    def test_multiply_matches_scipy(self):
        # scipy Rotation uses xyzw too; R(q1)*R(q2) composes rotations
        q1, q2 = random_unit_quats(2)
        ours = np.asarray(quat.multiply(q1, q2))
        theirs = (R.from_quat(q1) * R.from_quat(q2)).as_quat()
        # rotation quaternions are defined up to sign
        sign = np.sign(np.dot(ours, theirs))
        np.testing.assert_allclose(ours, sign * theirs, atol=1e-6)

    def test_identity_and_inverse(self):
        q = random_unit_quats(8)
        e = np.tile(np.asarray(quat.identity()), (8, 1))
        np.testing.assert_allclose(np.asarray(quat.multiply(q, e)), q, atol=1e-6)
        prod = np.asarray(quat.multiply(q, np.asarray(quat.inverse(q))))
        np.testing.assert_allclose(prod, e, atol=1e-6)

    def test_rotate_matches_scipy(self):
        q = random_unit_quats(16)
        v = RNG.standard_normal((16, 3))
        ours = np.asarray(quat.rotate(q, v))
        theirs = R.from_quat(q).apply(v)
        np.testing.assert_allclose(ours, theirs, atol=1e-5)

    def test_rotate_inv_roundtrip(self):
        q = random_unit_quats(16)
        v = RNG.standard_normal((16, 3))
        back = np.asarray(quat.rotate_inv(q, np.asarray(quat.rotate(q, v))))
        np.testing.assert_allclose(back, v, atol=1e-5)

    def test_rotation_matrix_consistent(self):
        q = random_unit_quats(8)
        v = RNG.standard_normal((8, 3))
        Rm = np.asarray(quat.to_rotation_matrix(q))
        np.testing.assert_allclose(
            np.einsum("bij,bj->bi", Rm, v), np.asarray(quat.rotate(q, v)), atol=1e-5
        )


class TestEuler:
    def test_euler_roundtrip(self):
        angles = RNG.uniform(-1.0, 1.0, (32, 3))
        q = np.asarray(quat.from_euler(angles[:, 0], angles[:, 1], angles[:, 2]))
        back = np.asarray(quat.to_euler(q))
        np.testing.assert_allclose(back, angles, atol=1e-5)

    def test_euler_matches_scipy(self):
        q = random_unit_quats(16)
        ours = np.asarray(quat.to_euler(q))
        theirs = R.from_quat(q).as_euler("ZYX")[:, ::-1]  # -> [roll, pitch, yaw]
        np.testing.assert_allclose(ours, theirs, atol=1e-5)


class TestIntegration:
    def test_expmap_unit_norm(self):
        phi = RNG.standard_normal((64, 3)) * 3.0
        q = np.asarray(quat.expmap(phi))
        np.testing.assert_allclose(np.linalg.norm(q, axis=-1), 1.0, atol=1e-6)

    def test_expmap_zero_is_identity(self):
        q = np.asarray(quat.expmap(jnp.zeros(3)))
        np.testing.assert_allclose(q, [0, 0, 0, 1], atol=1e-7)

    def test_expmap_matches_scipy_rotvec(self):
        phi = RNG.standard_normal((16, 3))
        ours = np.asarray(quat.expmap(phi))
        theirs = R.from_rotvec(phi).as_quat()
        sign = np.sign(np.sum(ours * theirs, axis=-1, keepdims=True))
        np.testing.assert_allclose(ours, sign * theirs, atol=1e-5)

    def test_expmap_differentiable_at_zero(self):
        g = jax.jacfwd(quat.expmap)(jnp.zeros(3))
        assert np.all(np.isfinite(np.asarray(g)))
        # d(vec part)/d(phi) at 0 is I/2
        np.testing.assert_allclose(np.asarray(g)[:3], 0.5 * np.eye(3), atol=1e-6)

    def test_integrate_constant_rate(self):
        # spinning about z at 1 rad/s for 0.5 s == rotation of 0.5 rad
        q0 = np.asarray(quat.identity())
        omega = jnp.array([0.0, 0.0, 1.0])
        q1 = np.asarray(quat.integrate_expmap(q0, omega, 0.5))
        expected = R.from_rotvec([0, 0, 0.5]).as_quat()
        sign = np.sign(np.dot(q1, expected))
        np.testing.assert_allclose(q1, sign * expected, atol=1e-6)

    def test_derivative_zero_omega(self):
        q = random_unit_quats(4)
        qdot = np.asarray(quat.derivative(q, jnp.zeros((4, 3))))
        np.testing.assert_allclose(qdot, 0.0, atol=1e-7)


class TestSlerp:
    def test_slerp_endpoints(self):
        q0, q1 = random_unit_quats(2)
        np.testing.assert_allclose(np.asarray(quat.slerp(q0, q1, 0.0)), q0, atol=1e-5)
        s1 = np.asarray(quat.slerp(q0, q1, 1.0))
        sign = np.sign(np.dot(s1, q1))
        np.testing.assert_allclose(s1, sign * q1, atol=1e-5)
