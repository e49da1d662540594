"""Tests for the auxiliary subsystems: PID, DDPG RL, inverse dynamics,
observability, trajectory IO, plotting."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aircraft_tpu.config import SolverConfig, glider_config
from aircraft_tpu.dynamics.aircraft import AircraftParams

CFG = glider_config()


class TestPID:
    def test_scalar_pid_converges_on_first_order_plant(self):
        from aircraft_tpu.control.pid import PIDGains, pid_init, pid_step

        gains = PIDGains(kp=2.0, ki=0.5, kd=0.05, limit=10.0)
        y, s = 0.0, pid_init()
        target, dt = 1.0, 0.05
        for _ in range(200):
            u, s = pid_step(gains, s, jnp.atleast_1d(target - y), dt)
            y = y + dt * (-y + float(u[0]))  # first-order plant
        assert abs(y - target) < 0.1

    def test_attitude_pid_episode(self):
        from aircraft_tpu.control.pid import simulate_pid

        params = AircraftParams.from_config(CFG.aircraft)
        x0 = jnp.asarray(CFG.waypoints.initial_state, dtype=jnp.float32)
        T = 50
        roll_t = jnp.full((T,), 0.2)
        pitch_t = jnp.zeros((T,))
        xs, us = simulate_pid(params, x0, roll_t, pitch_t, dt=0.02)
        assert xs.shape == (T + 1, 13) and us.shape == (T, 7)
        assert np.all(np.isfinite(np.asarray(xs)))
        from aircraft_tpu.ops import quaternion as quat

        eul = np.asarray(quat.to_euler(xs[:, 6:10]))
        # roll moves toward the setpoint
        assert eul[-1, 0] > eul[0, 0]


class TestDDPG:
    def test_update_step_improves_critic(self):
        from aircraft_tpu.rl.ddpg import DDPGAgent, ReplayBuffer, Transition

        rng = np.random.default_rng(0)
        agent = DDPGAgent(obs_dim=4, act_dim=2, seed=0)
        buf = ReplayBuffer(1000, 4, 2)
        # toy MDP: reward = -|obs|²; transitions random
        for _ in range(300):
            o = rng.standard_normal(4).astype(np.float32)
            a = agent.act(o, noise=rng.standard_normal(2) * 0.5)
            no = o + 0.1 * rng.standard_normal(4).astype(np.float32)
            buf.add(o, a, -float(np.sum(o**2)), no, False)
        losses = [agent.train_step(buf.sample(rng, 64))[0] for _ in range(60)]
        assert np.isfinite(losses).all()
        assert np.mean(losses[-10:]) < np.mean(losses[:10])

    def test_curriculum_advances(self):
        from aircraft_tpu.rl.ddpg import CurriculumLearning

        cur = CurriculumLearning(window=10)
        advanced = False
        for _ in range(12):
            advanced |= cur.record(True)
        assert advanced and cur.stage_idx == 1


class TestInverseDynamics:
    def test_force_matching_solve(self):
        from aircraft_tpu.control.inverse_dynamics import solve_inverse_dynamics

        params = AircraftParams.from_config(CFG.aircraft)
        x0 = np.asarray(CFG.waypoints.initial_state)
        goal = x0[:3] + np.array([60.0, 5.0, 5.0])
        sol = solve_inverse_dynamics(
            params, CFG, goal, num_nodes=30, dt=0.05, substeps=5,
            solver_config=SolverConfig(max_al_iters=4, max_inner_iters=15),
        )
        xs = np.asarray(sol.xs)
        assert np.all(np.isfinite(xs))
        # reaches the neighbourhood of the goal
        assert np.linalg.norm(xs[-1, :3] - goal) < 25.0
        # force/moment matching residual (the eq constraint) is small
        assert float(sol.violation) < 0.5


class TestObservability:
    def test_solver_metrics_and_registry(self):
        from aircraft_tpu.observability import ConstraintRegistry, solver_metrics

        class FakeSol:
            cost = jnp.asarray([1.0, 2.0])
            violation = jnp.asarray([1e-7, 3e-3])
            converged = jnp.asarray([True, False])
            iterations = jnp.asarray([10, 25])
            grad_norm = jnp.asarray([1e-5, 1e-2])

        m = solver_metrics(FakeSol(), wall_time=0.5)
        assert m["n_scenarios"] == 2 and m["success_rate"] == 0.5
        assert m["solves_per_s"] == 4.0

        reg = ConstraintRegistry()
        reg.register("control_ub", 7)
        reg.register("airspeed_low", 1)
        assert reg.describe(7) == "airspeed_low"
        rep = reg.report_violations(np.array([0.0] * 7 + [0.5]))
        assert rep == ["airspeed_low: 5.000e-01"]

    def test_diagnose_reports_active_sets_with_duals(self):
        """`diagnose` (the reference AircraftControl.log analogue,
        reference control/aircraft.py:81-147) must surface the active
        constraint set WITH dual estimates, Quu conditioning, and the
        worst-knot defect from a finished constrained solve."""
        from aircraft_tpu.config import SolverConfig
        from aircraft_tpu.control.quadrotor import (
            build_quadrotor_ocp, initial_state_inverted)
        from aircraft_tpu.observability import (
            ConstraintRegistry, diagnose, format_diagnosis)
        from aircraft_tpu.solvers import ilqr

        # aggressive target + tight thrust ceiling → saturated bounds
        N, dt, tmax = 40, 0.05, 6.0
        ocp = build_quadrotor_ocp([6.0, 0.0, -12.0], dt=dt, thrust_max=tmax)
        sol = ilqr.solve(
            ocp, initial_state_inverted(), jnp.full((N, 4), 9.81 / 4.0),
            SolverConfig(max_al_iters=6, max_inner_iters=25),
        )
        reg = ConstraintRegistry()
        for i in range(4):
            reg.register(f"thrust{i}_upper", 1)
        for i in range(4):
            reg.register(f"thrust{i}_lower", 1)

        rep = diagnose(sol, ocp, registry=reg)
        # the AL multipliers came back with the solution
        assert rep["mu"] > 0
        # thrust ceiling is genuinely active on this problem, with duals
        names = [r["name"] for r in rep["active_constraints"]]
        assert any("upper" in n for n in names), names
        assert max(r["max_dual"] for r in rep["active_constraints"]) > 0
        # single-shooting defects vanish by construction
        assert rep["worst_defect"] < 1e-5
        # GN Riccati replay produced finite conditioning numbers
        assert rep["quu_cond"] and np.isfinite(rep["quu_cond"]["max"])
        text = format_diagnosis(rep)
        assert "active constraints" in text and "Quu cond" in text

    def test_nan_locator(self):
        from aircraft_tpu.observability import locate_nan_in_jacobian

        def bad_step(x, u):
            return x / u  # NaN jacobian rows where u == 0

        info = locate_nan_in_jacobian(
            bad_step, jnp.ones(3), jnp.array([1.0, 0.0, 2.0])
        )
        assert 1 in info["B_bad_rows"]


class TestTrajectoryIO:
    def test_npz_and_h5_roundtrip(self, tmp_path):
        from aircraft_tpu.utils import TrajectoryData

        data = TrajectoryData(
            state=np.random.randn(11, 13).astype(np.float32),
            control=np.random.randn(10, 7).astype(np.float32),
            time=np.arange(10, dtype=np.float32) * 0.01,
        )
        p = tmp_path / "t.npz"
        data.save_npz(p)
        back = TrajectoryData.load_npz(p)
        np.testing.assert_allclose(back.state, data.state)

        h = tmp_path / "t.h5"
        data.save_h5(h, iteration=3)
        back = TrajectoryData.load_h5(h)
        np.testing.assert_allclose(back.state, data.state)
        np.testing.assert_allclose(back.control, data.control)

    def test_plotter_renders(self, tmp_path):
        from aircraft_tpu.plotting import TrajectoryPlotter
        from aircraft_tpu.utils import TrajectoryData

        xs = np.zeros((30, 13), dtype=np.float32)
        xs[:, 0] = np.linspace(0, 100, 30)
        xs[:, 2] = -200
        xs[:, 9] = 1.0
        xs[:, 3] = 50.0
        data = TrajectoryData(state=xs, control=np.zeros((29, 7), np.float32))
        out = tmp_path / "dash.png"
        TrajectoryPlotter(waypoints=np.array([[50.0, 0, -200]])).save(data, out)
        assert out.exists() and out.stat().st_size > 10000

    def test_aero_polars(self, tmp_path):
        """α-sweep polars (role of reference figures/alpha_vs_c{x,z}.svg):
        lift coefficient must grow (CZ more negative, FRD z-down) with α in
        the linear range, and the figure must render."""
        from aircraft_tpu.config import glider_config
        from aircraft_tpu.dynamics.aircraft import AircraftParams
        from aircraft_tpu.plotting import aero_polars, plot_polars

        cfg = glider_config()
        params = AircraftParams.from_config(cfg.aircraft)
        alphas = np.linspace(-5.0, 10.0, 16)
        C = aero_polars(params, alphas, airspeed=50.0)
        assert C.shape == (16, 6)
        assert np.all(np.isfinite(C))
        # CZ monotone decreasing in the linear-α range (lift up = -z in FRD)
        assert np.all(np.diff(C[:, 2]) < 0.0), C[:, 2]
        # drag grows away from minimum-drag α: CX at the extremes is more
        # negative (drag opposes +x flight) than at the sweep minimum
        out = tmp_path / "polars.png"
        plot_polars({"default": params}, out, alpha_range_deg=(-5, 10), n=16)
        assert out.exists() and out.stat().st_size > 5000


class TestSurrogateExtras:
    """Net2D/ControlNet + GP surrogate parity (reference
    surrogates/models.py:20-51,171-250)."""

    def test_weighted_mse_constraint_zero_anchor(self):
        from aircraft_tpu.surrogates.models import (
            weighted_mse,
            weighted_mse_constraint,
        )

        pred = jnp.ones((4, 6))
        target = jnp.zeros((4, 6))
        w = jnp.ones(6)
        base = weighted_mse(pred, target, w)
        # zero response at zero input -> no extra penalty
        same = weighted_mse_constraint(pred, target, w, jnp.zeros(6))
        np.testing.assert_allclose(float(same), float(base), rtol=1e-6)
        # nonzero zero-input response is penalised
        more = weighted_mse_constraint(pred, target, w, jnp.ones(6), 2.0)
        assert float(more) > float(base)

    def test_batchnorm_mlp_fits_linear_map(self):
        from aircraft_tpu.surrogates.extras import (
            batchnorm_mlp_apply,
            train_batchnorm_mlp,
        )

        rng = np.random.default_rng(0)
        x = rng.normal(0, 1, (512, 3)).astype(np.float32)
        A = np.array([[1.0, -2.0], [0.5, 0.0], [0.0, 1.0]], np.float32)
        y = x @ A
        params, loss = train_batchnorm_mlp(
            x, y, hidden=(32,), epochs=200, batch_size=128, learning_rate=3e-3
        )
        pred = batchnorm_mlp_apply(params, jnp.asarray(x[:64]))
        assert pred.shape == (64, 2)
        # eval-mode (running-moment) accuracy is the deliverable; the
        # train-mode loss additionally carries batch-statistic noise
        assert float(jnp.mean((pred - y[:64]) ** 2)) < 0.05

    def test_gp_surrogate_interpolates(self):
        from aircraft_tpu.surrogates.extras import GPSurrogate

        x = np.linspace(-2, 2, 30)[:, None]
        y = np.sin(2 * x[:, 0])
        gp = GPSurrogate.fit(x, y, iters=150)
        mean, std = gp.predict(x)
        np.testing.assert_allclose(np.asarray(mean), y, atol=0.1)
        xq = np.array([[0.5], [5.0]])
        _, stdq = gp.predict(xq)
        # far from data the predictive std grows
        assert float(stdq[1]) > float(stdq[0])


class TestExplorationNoise:
    def test_parameter_space_noise_perturbs_and_adapts(self):
        from aircraft_tpu.rl.ddpg import MLPParams, ParameterSpaceNoise, mlp_apply

        p = MLPParams.init(jax.random.PRNGKey(0), [4, 16, 2])
        noise = ParameterSpaceNoise(initial_std=0.05)
        p2 = noise.perturb(p)
        x = jnp.ones((3, 4))
        d = float(jnp.mean(jnp.abs(mlp_apply(p, x) - mlp_apply(p2, x))))
        assert d > 0.0
        s0 = noise.std
        noise.update(action_distance=0.0)  # too little exploration -> grow
        assert noise.std > s0
        noise.update(action_distance=10.0)  # too much -> shrink
        assert noise.std < s0 * 1.011

    def test_epsilon_greedy_decays(self):
        from aircraft_tpu.rl.ddpg import EpsilonGreedy

        eg = EpsilonGreedy(eps=1.0, eps_min=0.1, decay=0.5)
        a = np.zeros(2)
        out = eg.select(a, -5.0, 5.0)
        assert out.shape == (2,) and np.all(np.abs(out) <= 5.0)
        for _ in range(10):
            eg.select(a, -5.0, 5.0)
        assert abs(eg.eps - 0.1) < 1e-9
        eg.eps = 0.0
        np.testing.assert_array_equal(eg.select(a, -5.0, 5.0), a)


class TestFDJacobian:
    """AD-vs-finite-difference cross-check (reference trim.py:139-215
    finite_differences option)."""

    def test_dynamics_jacobian_matches_fd(self):
        from aircraft_tpu.config import glider_config
        from aircraft_tpu.dynamics.aircraft import AircraftParams, state_derivative
        from aircraft_tpu.observability import check_jacobian

        cfg = glider_config()
        params = AircraftParams.from_config(cfg.aircraft)
        x = jnp.asarray(cfg.waypoints.initial_state, dtype=jnp.float32)
        u = jnp.zeros(7, dtype=jnp.float32)
        rep = check_jacobian(lambda xx: state_derivative(params, xx, u), x)
        assert rep["ok"], rep

    def test_detects_wrong_jacobian(self):
        from aircraft_tpu.observability import check_jacobian, fd_jacobian

        # fn whose AD and FD disagree only if the check actually works
        rep = check_jacobian(lambda x: jnp.where(x > 0, x, 0.0) ** 0.5 + x,
                             jnp.asarray([1e-9, 2e-9]))
        # sqrt kink at 0: AD gives huge derivative, FD a finite slope
        assert not rep["ok"]


class TestPlantTruePlotting:
    """The dashboard's aero panel must use the PLANT'S own wind-aware α/β
    and include forces/moments panels from forces_frd/moments_frd when
    params are given (reference plotting.py:283-478)."""

    def test_plant_panels_wind_aware(self):
        from aircraft_tpu.config import glider_config
        from aircraft_tpu.dynamics.aircraft import AircraftParams
        from aircraft_tpu.plotting.plotting import TrajectoryPlotter
        from aircraft_tpu.solvers import integrators
        from aircraft_tpu.solvers.rollout import rollout
        from aircraft_tpu.utils import TrajectoryData

        cfg = glider_config()
        params = AircraftParams.from_config(cfg.aircraft)
        x0 = jnp.asarray(cfg.waypoints.initial_state, jnp.float32)
        us = jnp.zeros((20, 7), jnp.float32)
        step = integrators.make_step_fn(params, substeps=2, normalize="step")
        xs = np.asarray(rollout(step, x0, us, 0.01))

        windy = TrajectoryPlotter(params=params,
                                  wind=jnp.asarray([5.0, 0.0, 0.0]))
        calm = TrajectoryPlotter(params=params)
        a_w, b_w, F_w, M_w = windy._plant_panels(xs, np.asarray(us))
        a_0, b_0, F_0, M_0 = calm._plant_panels(xs, np.asarray(us))
        # wind shifts the plant-true alpha (the old inertial-velocity
        # approximation could not see wind at all)
        assert np.abs(a_w - a_0).max() > 1e-4
        assert F_w.shape == (20, 3) and M_w.shape == (20, 3)
        # gravity-free moments at zero rates/deflections stay bounded
        assert np.all(np.isfinite(F_w)) and np.all(np.isfinite(M_w))

        # the full dashboard renders with forces/moments panels present
        data = TrajectoryData(state=xs, control=np.asarray(us), time=None,
                              lam=np.linspace(1, 0, 21)[:, None])
        fig = windy.plot(data)
        titles = {ax.get_title() for ax in fig.axes}
        assert "forces FRD [N]" in titles and "moments FRD [N·m]" in titles
        assert any("wind-aware" in t for t in titles)
        import matplotlib.pyplot as plt

        plt.close(fig)
