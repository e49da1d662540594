"""Solution parity against an independent NLP solver (SURVEY §7 hard
part 2: "matching IPOPT solutions to <1e-3 control deviation").

IPOPT/CasADi are not in this environment, so the stand-in oracle is
scipy's SLSQP on the reference's own direct multiple-shooting
transcription (`solvers/reference_nlp.py`) — a dense SQP, the same
algorithmic family as IPOPT, sharing nothing with the AL-iLQR but the
problem callables.  Measured at full size (N=30 quadrotor, see
docs/DESIGN.md): max |Δu| = 5.5e-4, relative cost diff 6e-7.  The suite
runs reduced horizons to keep the dense host solve fast.
"""

import numpy as np
import jax
import jax.numpy as jnp

from aircraft_tpu.config import (AircraftConfig, SolverConfig,
                                 TrajectoryConfig, glider_config)
from aircraft_tpu.dynamics import quadrotor
from aircraft_tpu.dynamics.quadrotor import QuadrotorParams
from aircraft_tpu.solvers import ilqr, integrators
from aircraft_tpu.solvers.ocp import OCPFunctions
from aircraft_tpu.solvers.reference_nlp import solve_reference_nlp


def _lqr_ocp(dt=0.1):
    A = jnp.asarray([[1.0, dt], [0.0, 1.0]], dtype=jnp.float32)
    B = jnp.asarray([[0.5 * dt**2], [dt]], dtype=jnp.float32)
    Q = jnp.asarray(np.diag([1.0, 0.1]), dtype=jnp.float32)
    R = jnp.asarray([[0.01]], dtype=jnp.float32)
    Qf = jnp.asarray(np.diag([100.0, 10.0]), dtype=jnp.float32)
    return OCPFunctions(
        step=lambda x, u, k: A @ x + B @ u,
        stage_cost=lambda x, u, k: 0.5 * x @ Q @ x + 0.5 * u @ R @ u,
        terminal_cost=lambda x: 0.5 * x @ Qf @ x,
    )


class TestOracleValidation:
    """The NLP transcription itself is validated against the exact
    finite-horizon Riccati solution before being trusted as a parity
    oracle."""

    def test_lqr_matches_riccati(self):
        dt, N = 0.1, 20
        ocp = _lqr_ocp(dt)
        x0 = np.array([1.0, 0.0], dtype=np.float32)

        nlp = solve_reference_nlp(ocp, x0, np.zeros((N, 1), np.float32))
        assert nlp.success, nlp.message
        assert nlp.violation < 1e-10

        A = np.array([[1.0, dt], [0.0, 1.0]])
        B = np.array([[0.5 * dt**2], [dt]])
        Q, R = np.diag([1.0, 0.1]), np.array([[0.01]])
        P = np.diag([100.0, 10.0]).astype(np.float64)
        Ks = []
        for _ in range(N):
            K = np.linalg.solve(R + B.T @ P @ B, B.T @ P @ A)
            P = Q + A.T @ P @ A - A.T @ P @ B @ K
            Ks.append(K)
        Ks = Ks[::-1]
        xs = [x0.astype(np.float64)]
        us_ref = []
        for k in range(N):
            u = -Ks[k] @ xs[-1]
            us_ref.append(u)
            xs.append(A @ xs[-1] + B @ u)
        np.testing.assert_allclose(nlp.us, np.stack(us_ref), atol=1e-5)


def _quad_ocp(target, dt, thrust_max=10.0):
    """The reference quadrotor OCP (reference control/quadrotor.py:14-41),
    from the package module."""
    from aircraft_tpu.control.quadrotor import build_quadrotor_ocp

    return build_quadrotor_ocp(target, dt=dt, thrust_max=thrust_max)


class TestSolverParity:
    """AL-iLQR and the independent SQP must agree on the constrained
    6-DoF quadrotor point-to-point problem — same stationary point from
    different algorithms."""

    def test_quadrotor_control_parity_f32(self):
        """Device-precision solve: cost parity to ~1e-7; control deviation
        sits at the float32 conditioning floor (~1e-3 in near-flat
        directions — measured 1.3e-3 here, 5.5e-4 at N=30)."""
        N, dt = 16, 0.08
        target = np.array([2.0, 1.0, -4.0], dtype=np.float32)
        ocp = _quad_ocp(target, dt)
        x0 = jnp.zeros(13).at[6].set(1.0)  # rolled 180°: body +z thrust up
        us0 = jnp.full((N, 4), 9.81 / 4.0)

        sol = ilqr.solve(
            ocp, x0, us0,
            SolverConfig(max_al_iters=14, max_inner_iters=60, tol=1e-8,
                         penalty_scale=20.0),
        )
        assert bool(sol.converged)

        nlp = solve_reference_nlp(ocp, x0, us0, maxiter=250)
        assert nlp.success, nlp.message
        assert nlp.violation < 1e-8

        max_du = np.abs(np.asarray(sol.us) - nlp.us).max()
        rel_cost = abs(float(sol.cost) - nlp.cost) / abs(nlp.cost)
        assert max_du < 2e-3, max_du
        assert rel_cost < 1e-6, rel_cost

    def test_quadrotor_control_parity_f64(self):
        """At matched (double) precision the two solvers agree to ~1e-5 in
        controls (measured 6.4e-6) — the BASELINE <1e-3 target with two
        orders of margin.  The iLQR is dtype-generic: the same jitted
        program solves in float64 under `jax.enable_x64`."""
        N, dt = 16, 0.08
        target = np.array([2.0, 1.0, -4.0], dtype=np.float32)
        ocp = _quad_ocp(target, dt)

        x0 = np.zeros(13, np.float32)
        x0[6] = 1.0
        us0 = np.full((N, 4), 9.81 / 4.0, np.float32)
        nlp = solve_reference_nlp(ocp, x0, us0, maxiter=250)
        assert nlp.success, nlp.message

        with jax.enable_x64():
            sol = ilqr.solve(
                ocp,
                jnp.asarray(x0, jnp.float64),
                jnp.asarray(us0, jnp.float64),
                SolverConfig(max_al_iters=14, max_inner_iters=60, tol=1e-10,
                             penalty_scale=20.0),
            )
            max_du = np.abs(np.asarray(sol.us) - nlp.us).max()
            rel_cost = abs(float(sol.cost) - nlp.cost) / abs(nlp.cost)
        assert max_du < 1e-4, max_du
        assert rel_cost < 1e-9, rel_cost


class TestGliderParity:
    """Solution parity on the FLAGSHIP plant — the problems the reference
    actually hands to IPOPT (reference control/base.py:455-477): the full
    N=50 MHTT tracking window with the hard-coded reference envelope, and a
    waypoint-complementarity OCP (reference control/waypoints.py:58-80).
    This is the BASELINE north-star deviation target (<1e-3 max control
    deviation at equal horizon) demonstrated on the 6-DoF glider itself,
    not just the quadrotor."""

    def test_mhtt_window_parity_f64(self):
        """N=50 MHTT window OCP (the headline-bench problem shape,
        bench.py:_build_problem) solved by the dtype-generic AL-iLQR in
        float64 vs the independent SLSQP transcription.  Measured here:
        max |Δu| ≈ 3e-8, relative cost diff ≈ 9e-8 — five orders of margin
        on the <1e-3 target."""
        from aircraft_tpu.control.aircraft import REFERENCE_ENVELOPE
        from aircraft_tpu.control.initialisation import DubinsInitialiser
        from aircraft_tpu.control.mhtt import build_mhtt_ocp
        from aircraft_tpu.dynamics.aircraft import AircraftParams

        N, dt = 50, 0.01
        cfg = glider_config()
        params = AircraftParams.from_config(cfg.aircraft)
        track = DubinsInitialiser(cfg)
        ocp = build_mhtt_ocp(params, cfg, track.track_points, track.length(),
                             dt=dt, envelope_overrides=REFERENCE_ENVELOPE)

        x0 = np.concatenate(
            [np.asarray(cfg.waypoints.initial_state, np.float64), [0.0]])
        us0 = np.zeros((N, 7), np.float64)

        with jax.enable_x64():
            sol = ilqr.solve(
                ocp,
                jnp.asarray(x0, jnp.float64),
                jnp.asarray(us0, jnp.float64),
                SolverConfig(max_al_iters=8, max_inner_iters=60, tol=1e-12,
                             hessian="exact"),
            )
            sol.xs.block_until_ready()

        nlp = solve_reference_nlp(ocp, x0, us0, maxiter=400)
        assert nlp.success, nlp.message
        assert nlp.violation < 1e-10

        max_du = np.abs(np.asarray(sol.us) - nlp.us).max()
        rel_cost = abs(float(sol.cost) - nlp.cost) / abs(nlp.cost)
        assert max_du < 1e-3, max_du
        assert rel_cost < 1e-5, rel_cost

    def test_waypoint_complementarity_parity_f64(self):
        """Small waypoint-complementarity instance (Foehn progress scheme:
        λ/μ augmented channels, passage inequality, λ(T)=0) from the trim
        glide, vs the SLSQP oracle.  The instance is regularised with a tiny
        effort term on the otherwise-costless channels (thrust, flaps) —
        without it the final knot's flaps are exactly flat (zero gradient,
        any value in [0,1] is optimal) and 'parity' in that direction is
        meaningless.

        COMPLEMENTARITY DEGENERACY (measured, round 3): MPCC constraints
        violate MFCQ at every feasible point, so this instance has a
        near-flat primal valley around its optimum — curvature ~3e-4 along
        the solver-difference direction (both solvers feasible to 1e-8 and
        cost-matched to 2e-9 relative while 3.4e-3 apart in u).  The SLSQP
        oracle cannot localise the optimum along that valley: warm-started
        AT the iLQR point it wanders |Δu| ≈ 0.1 to a point 3e-6 relative
        WORSE in cost before stalling.  Control parity at the BASELINE
        <1e-3 level is therefore asserted on the well-posed flagship
        instances (the N=50 MHTT window above: 3e-8; quadrotor: 6.4e-6);
        here the provable statements are feasibility at solver precision,
        cost parity, and that the iLQR point is at least as optimal as the
        oracle's — plus a 5e-3 valley-width bound on the controls."""
        from aircraft_tpu.control import waypoints as wp_mod
        from aircraft_tpu.dynamics.aircraft import AircraftParams
        from aircraft_tpu.solvers.rollout import rollout as _rollout
        from aircraft_tpu.solvers.trim import multistart_trim

        N, dt, substeps = 24, 0.05, 5
        acfg = dict(mass=4.0, span=2.0, length=1.2, chord=0.124605,
                    reference_area=0.238, aero_centre_offset=[0.133, 0, 0.003],
                    Ixx=0.155, Iyy=0.114, Izz=0.262, Ixz=0.01,
                    glide_ratio=3.0, r_min=1.0)
        params = AircraftParams.from_config(AircraftConfig(**acfg))
        trim = multistart_trim(params, jax.random.PRNGKey(0), n_starts=32,
                               target_airspeed=45.0)
        x0 = np.asarray(trim.state, np.float32).copy()
        x0[:3] = [0.0, 0.0, -200.0]

        step13 = integrators.make_step_fn(params, substeps=substeps,
                                          normalize="step")
        us_trim = jnp.tile(jnp.asarray(trim.control, jnp.float32)[None, :7],
                           (N, 1))
        xs_t = np.asarray(_rollout(step13, jnp.asarray(x0), us_trim, dt))
        k_wp = 16
        wp = (xs_t[k_wp, :3] + np.array([0.0, 2.0, 0.0])).tolist()

        cfg = TrajectoryConfig.from_dict({
            "waypoints": {
                "waypoints": [wp],
                "initial_state": x0.tolist(),
                "default_velocity": 45,
                "waypoint_indices": [0, 1, 2],
                "waypoint_tolerance": 4.0,
            },
            "aircraft": acfg,
            "state": {"alpha": [-15, 15], "beta": [-15, 15],
                      "airspeed": [30, 100]},
            "control": {
                "aileron_limit": [-10, 10], "elevator_limit": [-10, 10],
                "rudder_limit": [-10, 10],
                "throttle_limit": [[0, 0, 0], [0, 0, 0]],
                "centre_of_mass_limit": [[-0.5, -0.1, -0.1],
                                         [0.5, 0.1, 0.1]]},
        })
        ocp = wp_mod.build_waypoint_ocp(params, cfg, dt=dt, num_nodes=N,
                                        substeps=substeps, time_mode="fixed")
        base_stage = ocp.stage_cost
        ocp = ocp.replace(stage_cost=lambda z, v, k: (
            base_stage(z, v, k) + 1e-4 * jnp.sum(v[..., 3:7] ** 2)))

        z0, vs = wp_mod.initial_guess(cfg, N, time_mode="fixed", dt=dt)
        vs_np = np.array(vs)
        vs_np[:, :7] = np.asarray(us_trim)
        vs_np[:, 7:] = 0.0
        vs_np[k_wp, 7] = 1.0

        with jax.enable_x64():
            sol = ilqr.solve(
                ocp,
                jnp.asarray(np.asarray(z0), jnp.float64),
                jnp.asarray(vs_np, jnp.float64),
                SolverConfig(max_al_iters=12, max_inner_iters=50, tol=1e-12,
                             hessian="exact"),
            )
            sol.xs.block_until_ready()
        assert bool(sol.converged), float(sol.violation)

        nlp = solve_reference_nlp(ocp, np.asarray(z0, np.float64),
                                  vs_np.astype(np.float64), maxiter=600)
        # SLSQP sometimes spends its whole budget crawling along the
        # regularised near-flat directions after the solution has stopped
        # moving — converged-in-practice is feasibility at solver precision
        assert nlp.success or nlp.violation < 1e-8, nlp.message
        assert nlp.violation < 1e-8

        # both must actually pass the waypoint and consume λ
        wpa = np.asarray(wp)
        for xs in (np.asarray(sol.xs), nlp.xs):
            assert np.linalg.norm(xs[:, :3] - wpa, axis=1).min() < 4.0
            assert abs(xs[-1, 13]) < 1e-6

        max_du = np.abs(np.asarray(sol.us)[:, :7] - nlp.us[:, :7]).max()
        max_dmu = np.abs(np.asarray(sol.us)[:, 7:] - nlp.us[:, 7:]).max()
        rel_cost = abs(float(sol.cost) - nlp.cost) / abs(nlp.cost)
        # flat-valley bound, not a point-match (see docstring); measured
        # 3.44e-3 / 9.2e-4 / 1.9e-7
        assert max_du < 5e-3, max_du
        assert max_dmu < 5e-3, max_dmu
        assert rel_cost < 1e-5, rel_cost
        # the iLQR point must be AT LEAST as optimal as the oracle's
        # (both feasible at <=1e-8): cost no worse than oracle + tolerance
        assert float(sol.cost) <= nlp.cost + 1e-5 * abs(nlp.cost)


class TestWellPosedWaypointParity:
    """A waypoint-class instance carrying the BASELINE <1e-3 control-parity
    gate (round-3 verdict #8): the flat-valley instance above proves the
    MPCC degeneracy is real, THIS instance removes it — a strictly convex
    control anchor (‖v − v_trim‖² over every channel, μ included) pins the
    optimum so both solvers can localise it, while the complementarity
    machinery (λ consumption, passage inequality, μ ≥ 0) stays fully
    active.  Reference: control/waypoints.py:58-80 + config.py:23-50
    (IPOPT at tol 1e-6; BASELINE.json <1e-3 deviation gate)."""

    def test_single_waypoint_parity_1e3(self):
        from aircraft_tpu.control import waypoints as wp_mod
        from aircraft_tpu.dynamics.aircraft import AircraftParams
        from aircraft_tpu.solvers.rollout import rollout as _rollout
        from aircraft_tpu.solvers.trim import multistart_trim

        N, dt, substeps = 20, 0.05, 5
        acfg = dict(mass=4.0, span=2.0, length=1.2, chord=0.124605,
                    reference_area=0.238, aero_centre_offset=[0.133, 0, 0.003],
                    Ixx=0.155, Iyy=0.114, Izz=0.262, Ixz=0.01,
                    glide_ratio=3.0, r_min=1.0)
        params = AircraftParams.from_config(AircraftConfig(**acfg))
        trim = multistart_trim(params, jax.random.PRNGKey(0), n_starts=32,
                               target_airspeed=45.0)
        x0 = np.asarray(trim.state, np.float32).copy()
        x0[:3] = [0.0, 0.0, -200.0]
        u_trim = jnp.asarray(trim.control, jnp.float32)[:7]

        step13 = integrators.make_step_fn(params, substeps=substeps,
                                          normalize="step")
        us_trim = jnp.tile(u_trim[None], (N, 1))
        xs_t = np.asarray(_rollout(step13, jnp.asarray(x0), us_trim, dt))
        k_wp = 13
        # waypoint 3 m starboard of the free rollout with a 2.5 m tolerance:
        # passage requires a REAL maneuver (the trim rollout misses), and the
        # tight tolerance keeps the passage window to a few knots
        wp = (xs_t[k_wp, :3] + np.array([0.0, 3.0, 0.0])).tolist()

        cfg = TrajectoryConfig.from_dict({
            "waypoints": {
                "waypoints": [wp],
                "initial_state": x0.tolist(),
                "default_velocity": 45,
                "waypoint_indices": [0, 1, 2],
                "waypoint_tolerance": 2.5,
            },
            "aircraft": acfg,
            "state": {"alpha": [-15, 15], "beta": [-15, 15],
                      "airspeed": [30, 100]},
            "control": {
                "aileron_limit": [-10, 10], "elevator_limit": [-10, 10],
                "rudder_limit": [-10, 10],
                "throttle_limit": [[0, 0, 0], [0, 0, 0]],
                "centre_of_mass_limit": [[-0.5, -0.1, -0.1],
                                         [0.5, 0.1, 0.1]]},
        })
        ocp = wp_mod.build_waypoint_ocp(params, cfg, dt=dt, num_nodes=N,
                                        substeps=substeps, time_mode="fixed")
        # STRICT CONVEXITY in every control direction: anchor the physical
        # channels to trim and price the μ channel quadratically — unit
        # curvature everywhere (vs the flat instance's ~3e-4 valley), so
        # the optimum is a point, not a valley
        base_stage = ocp.stage_cost

        def stage(z, v, k):
            du = v[..., :7] - u_trim
            return (base_stage(z, v, k)
                    + 0.5 * jnp.sum(du * du)
                    + 0.5 * jnp.sum(v[..., 7:] ** 2))

        ocp = ocp.replace(stage_cost=stage)

        z0, vs = wp_mod.initial_guess(cfg, N, time_mode="fixed", dt=dt)
        vs_np = np.array(vs)
        vs_np[:, :7] = np.asarray(us_trim)
        vs_np[:, 7:] = 0.0
        vs_np[k_wp, 7] = 1.0

        with jax.enable_x64():
            sol = ilqr.solve(
                ocp,
                jnp.asarray(np.asarray(z0), jnp.float64),
                jnp.asarray(vs_np, jnp.float64),
                SolverConfig(max_al_iters=12, max_inner_iters=50, tol=1e-12,
                             hessian="exact"),
            )
            sol.xs.block_until_ready()
        assert bool(sol.converged), float(sol.violation)

        nlp = solve_reference_nlp(ocp, np.asarray(z0, np.float64),
                                  vs_np.astype(np.float64), maxiter=600)
        assert nlp.success or nlp.violation < 1e-8, nlp.message
        assert nlp.violation < 1e-8

        wpa = np.asarray(wp)
        for xs in (np.asarray(sol.xs), nlp.xs):
            assert np.linalg.norm(xs[:, :3] - wpa, axis=1).min() < 2.5
            assert abs(xs[-1, 13]) < 1e-6  # lambda consumed

        max_du = np.abs(np.asarray(sol.us)[:, :7] - nlp.us[:, :7]).max()
        rel_cost = abs(float(sol.cost) - nlp.cost) / abs(nlp.cost)
        # THE BASELINE GATE, carried by a waypoint-class instance
        assert max_du < 1e-3, max_du
        assert rel_cost < 1e-6, rel_cost
