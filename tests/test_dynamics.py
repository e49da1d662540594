"""Dynamics parity tests: JAX plant vs the independent numpy oracle, plus the
physical invariants the reference test suite intended to cover
(reference src/aircraft/tests/test_dynamics.py — stale there, live here)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aircraft_tpu.config import glider_config
from aircraft_tpu.dynamics import aircraft as ac
from aircraft_tpu.dynamics import base, oracle
from aircraft_tpu.dynamics.aircraft import AircraftParams
from aircraft_tpu.dynamics.quadrotor import QuadrotorParams
from aircraft_tpu.dynamics import quadrotor
from aircraft_tpu.solvers import integrators

RNG = np.random.default_rng(1)
CFG = glider_config()


@pytest.fixture(scope="module")
def params():
    return AircraftParams.from_config(CFG.aircraft)


def trim_state(dtype=np.float32):
    # canonical initial state of the glider problem
    return np.array([0, 0, -200, 50, 0, 0, 0, 0, 0, 1, 0, 0, 0], dtype=dtype)


def random_states(n):
    xs = np.zeros((n, 13), dtype=np.float32)
    xs[:, 0:3] = RNG.uniform(-100, 100, (n, 3))
    xs[:, 3:6] = RNG.uniform(30, 60, (n, 1)) * np.array([1.0, 0.0, 0.0]) + RNG.normal(
        0, 3, (n, 3)
    )
    q = RNG.normal(0, 1, (n, 4)) * 0.1 + np.array([0, 0, 0, 1.0])
    xs[:, 6:10] = q / np.linalg.norm(q, axis=-1, keepdims=True)
    xs[:, 10:13] = RNG.normal(0, 0.3, (n, 3))
    return xs


def random_controls(n):
    us = np.zeros((n, 7), dtype=np.float32)
    us[:, 0:3] = RNG.uniform(-3, 3, (n, 3))
    us[:, 6] = RNG.uniform(0, 1, n)
    return us


class TestOracleParity:
    def test_state_derivative_matches_oracle(self, params):
        xs, us = random_states(32), random_controls(32)
        ours = np.asarray(ac.state_derivative(params, jnp.asarray(xs), jnp.asarray(us)))
        for i in range(32):
            theirs = oracle.aircraft_state_derivative(
                xs[i].astype(np.float64),
                us[i].astype(np.float64),
                mass=CFG.aircraft.mass,
                S=CFG.aircraft.reference_area,
                b=CFG.aircraft.span,
                c=CFG.aircraft.chord,
                com=np.array(CFG.aircraft.aero_centre_offset),
                static_inertia=CFG.aircraft.static_inertia,
            )
            np.testing.assert_allclose(ours[i], theirs, rtol=2e-4, atol=2e-4)

    def test_rk4_step_matches_oracle(self, params):
        x, u = trim_state(), random_controls(1)[0]

        def f_np(x_, u_):
            return oracle.aircraft_state_derivative(
                x_,
                u_,
                mass=CFG.aircraft.mass,
                S=CFG.aircraft.reference_area,
                b=CFG.aircraft.span,
                c=CFG.aircraft.chord,
                com=np.array(CFG.aircraft.aero_centre_offset),
                static_inertia=CFG.aircraft.static_inertia,
            )

        ours = np.asarray(
            integrators.step(params, jnp.asarray(x), jnp.asarray(u), 0.01)
        )
        theirs = oracle.rk4_step(f_np, x.astype(np.float64), u.astype(np.float64), 0.01)
        np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-4)


class TestInvariants:
    def test_zero_omega_keeps_quaternion(self, params):
        """Quaternion derivative vanishes at zero body rate."""
        x = jnp.asarray(trim_state())
        u = jnp.zeros(7)
        xdot = ac.state_derivative(params, x, u)
        np.testing.assert_allclose(np.asarray(xdot[6:10]), 0.0, atol=1e-6)

    def test_wind_shifts_relative_velocity(self, params):
        x = jnp.asarray(trim_state())
        u = jnp.zeros(7)
        v0 = np.asarray(ac.v_frd_rel(params, x, u))
        v_wind = jnp.array([5.0, -2.0, 1.0])
        v1 = np.asarray(ac.v_frd_rel(params, x, u, wind=v_wind))
        # identity attitude: FRD == NED axes, so the shift is the wind itself
        np.testing.assert_allclose(v1 - v0, np.asarray(v_wind), atol=1e-5)

    def test_gravity_only_free_fall(self):
        """With zero aero output the plant accelerates at g in +z (NED down)."""
        qp = QuadrotorParams.default()
        x = jnp.asarray(trim_state())
        xdot = quadrotor.state_derivative(qp, x, jnp.zeros(4))
        np.testing.assert_allclose(np.asarray(xdot[3:6]), [0, 0, 9.81], atol=1e-6)
        np.testing.assert_allclose(np.asarray(xdot[0:3]), [50, 0, 0], atol=1e-6)

    def test_expmap_integration_preserves_norm(self, params):
        x = jnp.asarray(trim_state())
        x = x.at[10:13].set(jnp.array([0.5, -0.8, 0.3]))
        u = jnp.zeros(7)
        step = integrators.make_step_fn(params, substeps=5, normalize="expmap")
        for _ in range(20):
            x = step(x, u, 0.02)
        assert abs(float(jnp.linalg.norm(x[6:10])) - 1.0) < 1e-5

    def test_quadrotor_hover(self):
        """Total thrust = m g, symmetric mixer -> zero acceleration, zero moments."""
        qp = QuadrotorParams.default()
        x = np.zeros(13, dtype=np.float32)
        x[9] = 1.0
        # thrust acts along +z body; to cancel +9.81 NED gravity flip attitude
        # (rotate pi about x so body z points up)
        x[6] = 1.0  # q = [1,0,0,0] xyzw: 180deg about x
        x[9] = 0.0
        u = jnp.full(4, 9.81 / 4.0)
        xdot = quadrotor.state_derivative(qp, jnp.asarray(x), u)
        np.testing.assert_allclose(np.asarray(xdot[3:6]), 0.0, atol=1e-5)
        np.testing.assert_allclose(np.asarray(xdot[10:13]), 0.0, atol=1e-6)


class TestCoefficientModels:
    def test_linear_model_affine(self, params):
        from aircraft_tpu.dynamics.coefficients import LinearCoeffParams

        M = RNG.normal(0, 0.1, (6, 6)).astype(np.float32)
        cp = LinearCoeffParams(matrix=jnp.asarray(M))
        p = params.replace(coeff=cp)
        x, u = jnp.asarray(trim_state()), jnp.zeros(7)
        aero = ac.aero_state(p, x, u)
        inp = np.array(
            [float(aero.qbar), float(aero.alpha), float(aero.beta), 0.0, 0.0, 1.0]
        )
        expected = M @ inp
        got = np.asarray(ac.coefficients(p, x, u))
        np.testing.assert_allclose(got, expected, rtol=2e-4, atol=2e-4)

    def test_mlp_model_runs_and_differentiates(self, params):
        from aircraft_tpu.dynamics.coefficients import MLPCoeffParams

        cp = MLPCoeffParams.init(jax.random.PRNGKey(0))
        p = params.replace(coeff=cp)
        x, u = jnp.asarray(trim_state()), jnp.zeros(7)
        xdot = ac.state_derivative(p, x, u)
        assert np.all(np.isfinite(np.asarray(xdot)))
        A = jax.jacfwd(lambda xx: ac.state_derivative(p, xx, u))(x)
        assert np.all(np.isfinite(np.asarray(A)))

    def test_poly_model_constant_term(self, params):
        from aircraft_tpu.dynamics.coefficients import PolyCoeffParams, polynomial_exponents

        F = polynomial_exponents(5, 3).shape[0]
        cp = PolyCoeffParams.make(
            weights=np.zeros((6, F), dtype=np.float32),
            intercept=np.arange(6, dtype=np.float32) * 0.01,
            span=float(CFG.aircraft.span),
        )
        p = params.replace(coeff=cp)
        x, u = jnp.asarray(trim_state()), jnp.zeros(7)
        got = np.asarray(ac.coefficients(p, x, u))
        # zero weights -> every surface evaluation returns the intercept; the
        # wing-asymmetry roll correction cancels (rw == lw)
        np.testing.assert_allclose(got, np.arange(6) * 0.01, atol=1e-6)

    def test_flaps_increment(self, params):
        x = jnp.asarray(trim_state())
        u0 = jnp.zeros(7)
        u1 = u0.at[6].set(1.0)
        c0 = np.asarray(ac.coefficients(params, x, u0))
        c1 = np.asarray(ac.coefficients(params, x, u1))
        np.testing.assert_allclose(c1[0] - c0[0], -0.1, atol=1e-6)
        np.testing.assert_allclose(c1[2] - c0[2], -0.6, atol=1e-6)


class TestBatchingAndJit:
    def test_vmap_consistency(self, params):
        xs, us = jnp.asarray(random_states(8)), jnp.asarray(random_controls(8))
        batched = np.asarray(ac.state_derivative(params, xs, us))
        single = np.stack(
            [np.asarray(ac.state_derivative(params, xs[i], us[i])) for i in range(8)]
        )
        np.testing.assert_allclose(batched, single, rtol=1e-5, atol=1e-5)

    def test_jit_substeps(self, params):
        step = jax.jit(integrators.make_step_fn(params, substeps=10, normalize="step"))
        x = step(jnp.asarray(trim_state()), jnp.zeros(7), 0.05)
        assert np.all(np.isfinite(np.asarray(x)))
