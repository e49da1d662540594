"""Trim search and stability analysis.

Replaces the reference's raw-IPOPT trim NLP (reference main/stability/trim.py:
218-445: minimise ‖v̇‖² + ‖ω̇‖² s.t. unit quaternion, airspeed envelope,
|ω| small, CoM box) with a batched Levenberg–Marquardt Gauss–Newton solve.

TPU-first design choices:
  * orientation is parameterised by a rotation vector (tangent-space chart),
    so the unit-quaternion constraint vanishes instead of being enforced;
  * body rates are pinned to the trim condition ω = 0 exactly rather than
    bounded (the reference bounds |ω| ≤ 1e-2);
  * box constraints (controls, CoM) are handled by projection;
  * the whole solve is jit + vmap — multi-start trim from hundreds of
    initial guesses costs one program launch.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from aircraft_tpu.dynamics import aircraft as ac
from aircraft_tpu.dynamics.aircraft import AircraftParams
from aircraft_tpu.ops import quaternion as quat


class TrimResult(NamedTuple):
    state: jax.Array     # (13,) trimmed state
    control: jax.Array   # (10,) trimmed control incl. CoM
    residual: jax.Array  # ‖[v̇, ω̇]‖ at the trim point
    converged: jax.Array


# decision vector z = [v_ned(3), rotvec(3), aileron, elevator, rudder, com(3)]
_NZ = 12


def _unpack(z, base_pos):
    v = z[0:3]
    q = quat.expmap(z[3:6])
    controls = jnp.concatenate(
        [z[6:9], jnp.zeros(3, dtype=z.dtype), jnp.zeros(1, dtype=z.dtype), z[9:12]]
    )
    state = jnp.concatenate([base_pos, v, q, jnp.zeros(3, dtype=z.dtype)])
    return state, controls


def _residual(params: AircraftParams, z, base_pos, target_airspeed, w_speed):
    state, controls = _unpack(z, base_pos)
    xdot = ac.state_derivative(params, state, controls)
    r = jnp.concatenate([xdot[3:6], xdot[10:13]])  # v̇, ω̇
    if target_airspeed is not None:
        speed = jnp.linalg.norm(state[3:6])
        r = jnp.concatenate([r, jnp.atleast_1d(w_speed * (speed - target_airspeed))])
    return r


@partial(jax.jit, static_argnums=(3,), static_argnames=("iters",))
def solve_trim(
    params: AircraftParams,
    z0: jax.Array,
    bounds: tuple[jax.Array, jax.Array],
    target_airspeed: Optional[float] = None,
    *,
    base_pos: Optional[jax.Array] = None,
    iters: int = 60,
    w_speed: float = 1.0,
    tol: float = 1e-8,
) -> TrimResult:
    """Projected Levenberg–Marquardt from one initial guess."""
    if base_pos is None:
        base_pos = jnp.array([0.0, 0.0, -200.0], dtype=z0.dtype)
    lb, ub = bounds

    def res(z):
        return _residual(params, z, base_pos, target_airspeed, w_speed)

    def lm_step(carry, _):
        z, lam = carry
        r = res(z)
        J = jax.jacfwd(res)(z)
        H = J.T @ J + lam * jnp.eye(_NZ, dtype=z.dtype)
        dz = -jnp.linalg.solve(H, J.T @ r)
        z_new = jnp.clip(z + dz, lb, ub)
        r_new = res(z_new)
        improved = jnp.sum(r_new * r_new) < jnp.sum(r * r)
        z = jnp.where(improved, z_new, z)
        lam = jnp.where(improved, jnp.maximum(lam * 0.5, 1e-10), lam * 4.0)
        return (z, lam), None

    (z, _), _ = jax.lax.scan(lm_step, (z0, jnp.asarray(1e-3, z0.dtype)), None, length=iters)
    r = res(z)
    rnorm = jnp.linalg.norm(r[:6])
    state, control = _unpack(z, base_pos)
    return TrimResult(state=state, control=control, residual=rnorm, converged=rnorm < 1e-3)


def default_trim_bounds(control_envelope=None, dtype=jnp.float32):
    """Bounds on the trim decision vector (reference trim.py:278-416:
    airspeed [30,100] handled via the velocity box, CoM box from config)."""
    lb = jnp.array(
        [5.0, -20.0, -20.0, -1.0, -1.0, -np.pi, -5.0, -5.0, -5.0, -0.5, -0.1, -0.1],
        dtype=dtype,
    )
    ub = jnp.array(
        [100.0, 20.0, 20.0, 1.0, 1.0, np.pi, 5.0, 5.0, 5.0, 0.5, 0.1, 0.1],
        dtype=dtype,
    )
    if control_envelope is not None:
        clb, cub = control_envelope.bounds(10)
        lb = lb.at[6:9].set(jnp.asarray(clb[:3], dtype)).at[9:12].set(jnp.asarray(clb[7:10], dtype))
        ub = ub.at[6:9].set(jnp.asarray(cub[:3], dtype)).at[9:12].set(jnp.asarray(cub[7:10], dtype))
    return lb, ub


def multistart_trim(
    params: AircraftParams,
    key: jax.Array,
    n_starts: int = 64,
    target_airspeed: Optional[float] = 50.0,
    bounds=None,
    prefer_coordinated: bool = False,
) -> TrimResult:
    """vmap multi-start; returns the best trim found.

    ``prefer_coordinated``: among CONVERGED starts, pick the minimum
    |sideslip| trim instead of the minimum residual.  Fitted surrogate
    models can have nearly-flat yaw stiffness, so the residual-argmin trim
    may carry 10–16° of β — legal by ‖v̇,ω̇‖ but parked against the |β|≤10°
    flight envelope, which poisons any serving loop seeded from it
    (measured: bench fleet at a β=−15.9° 'trim' spends its whole first
    window fighting the AL beta rows)."""
    if bounds is None:
        bounds = default_trim_bounds()
    lb, ub = bounds
    mid = jnp.array(
        [50.0, 0.0, 2.0, 0.0, 0.05, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0]
    )
    spread = jnp.array([10.0, 1.0, 3.0, 0.05, 0.1, 0.05, 1.0, 1.0, 1.0, 0.1, 0.02, 0.02])
    z0s = mid + spread * jax.random.normal(key, (n_starts, _NZ))
    z0s = jnp.clip(z0s, lb, ub)

    sols = jax.vmap(lambda z0: solve_trim(params, z0, bounds, target_airspeed))(z0s)

    def lat(state):
        v_body = quat.rotate_inv(state[6:10], state[3:6])
        return jnp.abs(v_body[1])

    if prefer_coordinated:
        lat_v = jax.vmap(lat)(sols.state)
        score = jnp.where(sols.residual < 1e-3, lat_v, 1e6 + sols.residual)
    else:
        score = sols.residual
    if not bool(jnp.any(sols.residual < 1e-3)):
        # RESCUE tier, entered only when the speed-penalized random
        # multistart found NO equilibrium (the round-3 linear/poly failure:
        # residual 1.6–46 on every start).  Two reasons it fails, two
        # fixes — both gated here so well-behaved plants (default, nn) keep
        # the path above bit-identical (the downstream waypoint warm-start
        # basins are sensitive to the exact trim point):
        #
        # 1. Structured glide-ladder seeds: the random spread explores only
        #    ~±0.1 rad of pitch around level, but fitted models can trim
        #    ONLY in steep corners — measured on the affine plant (the
        #    reference's own data/glider/linearised.csv coefficients): its
        #    sole longitudinal equilibrium inside the ±5 elevator box is a
        #    γ≈30–40° dive at L/D < 2, which every near-level start misses
        #    (LM parks at a clipped-elevator corner, residual ~1).  Seeds
        #    pair a descent angle γ with the matching attitude θ = α − γ,
        #    at SEVERAL speeds: the equilibrium manifold may not pass near
        #    the requested airspeed at all (the poly plant's symmetric
        #    equilibria sit near v≈50).
        # 2. Speed-penalty-free polish: when no equilibrium exists AT the
        #    target speed, the penalized LM stalls at a compromise point
        #    with genuine force residual; re-solving the pure trim system
        #    from each found point (the reference treats airspeed as a
        #    box, not a penalty — reference trim.py:278-416) lands on the
        #    true equilibrium, and selection then prefers the converged
        #    point nearest the requested speed.
        v_seed = 30.0 if target_airspeed is None else float(target_airspeed)
        glide = []
        for v_s in dict.fromkeys((v_seed, 35.0, 50.0)):
            for g_deg in (2.0, 6.0, 10.0, 15.0, 20.0, 26.0, 32.0, 38.0):
                g = np.deg2rad(g_deg)
                for a0, de0 in ((0.0, 0.0), (0.08, -1.0), (0.0, 3.0)):
                    glide.append([v_s * np.cos(g), 0.0, v_s * np.sin(g),
                                  0.0, a0 - g, 0.0, 0.0, de0, 0.0,
                                  0.0, 0.0, 0.0])
        z0s_g = jnp.clip(jnp.asarray(glide, dtype=z0s.dtype), lb, ub)
        sols_g = jax.vmap(
            lambda z0: solve_trim(params, z0, bounds, target_airspeed))(z0s_g)
        sols = jax.tree.map(
            lambda a, b: jnp.concatenate([a, b], axis=0), sols, sols_g)
        z_found = jax.vmap(
            lambda s, c: jnp.concatenate(
                [s[3:6], quat.logmap(s[6:10]), c[0:3], c[7:10]]))(
                sols.state, sols.control)
        polished = jax.vmap(
            lambda z0: solve_trim(params, z0, bounds, None))(z_found)
        sols = jax.tree.map(
            lambda p, s: jnp.where(
                (polished.residual < sols.residual).reshape(
                    (-1,) + (1,) * (p.ndim - 1)), p, s),
            polished, sols)
        speeds = jnp.linalg.norm(sols.state[:, 3:6], axis=-1)
        dv = (jnp.abs(speeds - target_airspeed)
              if target_airspeed is not None else jnp.zeros_like(speeds))
        if prefer_coordinated:
            lat_v = jax.vmap(lat)(sols.state)
            score = jnp.where(sols.residual < 1e-3, lat_v + 0.01 * dv,
                              1e6 + sols.residual)
        else:
            score = jnp.where(sols.residual < 1e-3, dv, 1e6 + sols.residual)
    best = jnp.argmin(score)
    return TrimResult(
        state=sols.state[best],
        control=sols.control[best],
        residual=sols.residual[best],
        converged=sols.converged[best],
    )


# ---------------------------------------------------------------------------
# stability analysis (reference main/stability/stability.py:47-116,
# main/stability/dynamics_trimming.py:70-130)
# ---------------------------------------------------------------------------


def continuous_jacobians(params: AircraftParams, state, control):
    """A = ∂f/∂x, B = ∂f/∂u of the continuous dynamics at a point."""
    A = jax.jacfwd(lambda x: ac.state_derivative(params, x, control))(state)
    B = jax.jacfwd(lambda u: ac.state_derivative(params, state, u))(control)
    return A, B


def stability_eigenvalues(params: AircraftParams, state, control):
    """Eigenvalues of the continuous-time Jacobian at (state, control).
    Eigendecomposition runs host-side (tiny, not a device op)."""
    A, _ = continuous_jacobians(params, state, control)
    return np.linalg.eigvals(np.asarray(A, dtype=np.float64))


def discrete_jacobians(params: AircraftParams, state, control, dt,
                       substeps: int = 1):
    """A_d = ∂F/∂x, B_d = ∂F/∂u of the RK4 step map F(x, u, dt)
    (reference main/stability/stability.py:50-55 takes the same Jacobian of
    `state_update`).  Broadcasts over leading batch axes under vmap."""
    from aircraft_tpu.solvers import integrators

    step = partial(integrators.step, params, substeps=substeps)
    A = jax.jacfwd(lambda x: step(x, control, dt))(state)
    B = jax.jacfwd(lambda u: step(state, u, dt))(control)
    return A, B


class DiscreteStabilityReport(NamedTuple):
    """Spectral analysis of the discrete step map around an operating point
    (reference main/stability/stability.py:62-116, recomputed per
    perturbation there in a Python loop; one vmapped program here)."""

    eigenvalues: np.ndarray        # (n_perturb, 13) complex
    spectral_radius: np.ndarray    # (n_perturb,) max |eig| per perturbed point
    condition_numbers: np.ndarray  # (n_perturb,) cond(A_d) per perturbed point
    dt_sweep: np.ndarray           # (n_dt,) timesteps of the dt sweep
    dt_spectral_radius: np.ndarray # (n_dt,) max |eig| at the nominal point


def discrete_stability_analysis(
    params: AircraftParams,
    state,
    control,
    dt: float = 0.01,
    n_perturb: int = 25,
    state_delta: float = 0.1,
    quat_delta: float = 0.01,
    dt_sweep=None,
    seed: int = 0,
) -> DiscreteStabilityReport:
    """Eigenvalue / condition-number study of the discrete dynamics under a
    cloud of state perturbations plus a log-spaced dt sweep.

    The reference evaluates the CasADi Jacobian in a double Python loop over
    perturbations (stability.py:66-83) and again over timesteps (:139-148);
    here both clouds are vmapped so the whole study is two XLA launches,
    with only the eigendecompositions host-side (13×13, not a device op).
    """
    from aircraft_tpu.utils import perturb_quaternion

    rng = np.random.default_rng(seed)
    state = np.asarray(state, dtype=np.float32)
    control = jnp.asarray(control)

    deltas = np.linspace(-state_delta, state_delta, n_perturb)
    cloud = np.repeat(state[None], n_perturb, axis=0)
    cloud += deltas[:, None]
    for i in range(n_perturb):
        cloud[i, 6:10] = perturb_quaternion(state[6:10], quat_delta, rng=rng)
    cloud_j = jnp.asarray(cloud)

    A_cloud, _ = jax.vmap(
        lambda x: discrete_jacobians(params, x, control, dt))(cloud_j)
    A_cloud = np.asarray(A_cloud, dtype=np.float64)
    eigs = np.linalg.eigvals(A_cloud)
    cond = np.linalg.cond(A_cloud)

    if dt_sweep is None:
        dt_sweep = np.logspace(-4, 0, 20)
    dts_j = jnp.asarray(dt_sweep, dtype=jnp.float32)
    x0 = jnp.asarray(state)
    A_dts, _ = jax.vmap(
        lambda d: discrete_jacobians(params, x0, control, d))(dts_j)
    dt_radius = np.abs(
        np.linalg.eigvals(np.asarray(A_dts, dtype=np.float64))).max(axis=-1)

    return DiscreteStabilityReport(
        eigenvalues=eigs,
        spectral_radius=np.abs(eigs).max(axis=-1),
        condition_numbers=cond,
        dt_sweep=np.asarray(dt_sweep),
        dt_spectral_radius=dt_radius,
    )
