"""Dubins-based trajectory initialisation and reference tracks.

Re-designs the reference `DubinsInitialiser` (reference
control/initialisation.py:569-880): host-side numpy builds the geometric
path through the waypoint sequence (3D Dubins per segment, straight-line
fallback), and the resulting track is exposed to the device-side solver as
**uniformly-resampled Catmull–Rom spline functions** `eval(s)` /
`eval_tangent(s)` — pure JAX gather + FMA, no `if_else` chains (the
reference builds piecewise CasADi Hermite interpolants instead,
initialisation.py:782-851).

The full state guess (position, velocity along the tangent, attitude from
heading/climb/coordinated-turn roll, body rates from attitude differences)
mirrors initialisation.py:277-348,613-651.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from aircraft_tpu.config import TrajectoryConfig
from aircraft_tpu.dubins.dubins3d import maneuver3d, straight_line_fallback
from aircraft_tpu.ops import quaternion as quat


# ---------------------------------------------------------------------------
# JAX track: uniform Catmull-Rom spline over resampled points
# ---------------------------------------------------------------------------


def catmull_rom_eval(points: jax.Array, s: jax.Array) -> jax.Array:
    """Evaluate a uniform Catmull-Rom spline through `points` (M, d) at
    normalised parameter s ∈ [0, 1]. Broadcasts over leading axes of s."""
    M = points.shape[0]
    u = jnp.clip(s, 0.0, 1.0) * (M - 1)
    i = jnp.clip(jnp.floor(u).astype(jnp.int32), 0, M - 2)
    t = (u - i.astype(u.dtype))[..., None]

    idx0 = jnp.clip(i - 1, 0, M - 1)
    idx1 = i
    idx2 = jnp.clip(i + 1, 0, M - 1)
    idx3 = jnp.clip(i + 2, 0, M - 1)
    p0, p1, p2, p3 = points[idx0], points[idx1], points[idx2], points[idx3]

    t2 = t * t
    t3 = t2 * t
    return 0.5 * (
        (2.0 * p1)
        + (-p0 + p2) * t
        + (2.0 * p0 - 5.0 * p1 + 4.0 * p2 - p3) * t2
        + (-p0 + 3.0 * p1 - 3.0 * p2 + p3) * t3
    )


def catmull_rom_tangent(points: jax.Array, s: jax.Array) -> jax.Array:
    """d(eval)/ds — analytic derivative of the spline basis (the reference
    differentiates its Hermite track with `ca.jacobian`,
    initialisation.py:845-851)."""
    M = points.shape[0]
    u = jnp.clip(s, 0.0, 1.0) * (M - 1)
    i = jnp.clip(jnp.floor(u).astype(jnp.int32), 0, M - 2)
    t = (u - i.astype(u.dtype))[..., None]

    idx0 = jnp.clip(i - 1, 0, M - 1)
    idx2 = jnp.clip(i + 1, 0, M - 1)
    idx3 = jnp.clip(i + 2, 0, M - 1)
    p0, p1, p2, p3 = points[idx0], points[i], points[idx2], points[idx3]

    t2 = t * t
    dp_du = 0.5 * (
        (-p0 + p2)
        + 2.0 * (2.0 * p0 - 5.0 * p1 + 4.0 * p2 - p3) * t
        + 3.0 * (-p0 + 3.0 * p1 - 3.0 * p2 + p3) * t2
    )
    return dp_du * (M - 1)


class DubinsInitialiser:
    """Builds the geometric reference path through the problem's waypoints
    and produces warm-start state trajectories + JAX track functions."""

    def __init__(
        self,
        config: TrajectoryConfig,
        *,
        n_track_points: int = 256,
        pitch_limit_deg: float = 15.0,
        r_min: Optional[float] = None,
        z_mode: str = "waypoints",   # 'waypoints' | 'glide'
        glide_ld: float = 12.0,
        r_min_per_segment: Optional[list] = None,
        extend: float = 0.0,
    ):
        """``z_mode='glide'`` replaces the waypoint-interpolated altitude
        profile with one the PLANT can actually fly: the xy geometry is
        built on a flat plane, then z descends along the track's arc length
        at slope 1/``glide_ld`` (the achievable lift-to-drag ratio at the
        flight speed, NOT the problem JSON's course-design ``glide_ratio``).
        For 2D-objective courses (reference ``waypoint_indices`` [0,1]) the
        declared glide_ratio=3 backfill demands an 18.4° dive that
        overspeeds the plant and blows up its turn radius; a feasible slope
        keeps the tracked flight near trim, which is the stable regime."""
        self.config = config
        wps = config.waypoints.all_points()          # (n+1, 3) incl. start
        if z_mode == "glide":
            wps = wps.copy()
            wps[:, 2] = wps[0, 2]                    # flat for the xy geometry
        speed = config.waypoints.default_velocity
        r_min = r_min if r_min is not None else max(
            config.aircraft.r_min, speed**2 / (9.81 * np.tan(np.deg2rad(45.0)))
        )
        lim = np.deg2rad(pitch_limit_deg)

        # headings/pitch at each waypoint: direction of travel
        # (reference setup_waypoints_3d, initialisation.py:350-410)
        diffs = np.diff(wps, axis=0)
        seg_psi = np.arctan2(diffs[:, 1], diffs[:, 0])
        seg_gamma = np.clip(
            np.arctan2(diffs[:, 2], np.hypot(diffs[:, 0], diffs[:, 1])), -lim, lim
        )
        psi = np.concatenate([seg_psi[:1], seg_psi])
        gamma = np.concatenate([seg_gamma[:1], seg_gamma])
        # interior waypoints: average in/out directions for gentle turns, but
        # keep the OUTGOING direction at reversals (>90° course change) — a
        # there-and-back course should fly THROUGH the waypoint and turn
        # around inside the next segment, not arrive sideways
        for i in range(1, len(wps) - 1):
            turn = np.arctan2(
                np.sin(seg_psi[i] - seg_psi[i - 1]),
                np.cos(seg_psi[i] - seg_psi[i - 1]),
            )
            if abs(turn) > np.pi / 2:
                # INCOMING heading at reversals: the track flies straight
                # THROUGH the waypoint and turns around inside the NEXT
                # segment, so every waypoint is approached on a straight
                # (accurately trackable) leg and the Dubins loop's
                # accumulated tracking error lands mid-segment, not at the
                # scored point.  (Using the outgoing heading instead puts a
                # full turnaround loop BEFORE each waypoint — observed
                # 65-90 m closed-loop misses.)
                psi[i] = seg_psi[i - 1]
            else:
                psi[i] = np.arctan2(
                    np.sin(seg_psi[i - 1]) + np.sin(seg_psi[i]),
                    np.cos(seg_psi[i - 1]) + np.cos(seg_psi[i]),
                )
            gamma[i] = 0.5 * (seg_gamma[i - 1] + seg_gamma[i])

        # initial heading from the initial velocity if it is nonzero
        v0 = np.array(config.waypoints.initial_state[3:6])
        if np.linalg.norm(v0[:2]) > 1e-6:
            psi[0] = np.arctan2(v0[1], v0[0])
            gamma[0] = np.clip(
                np.arctan2(v0[2], np.linalg.norm(v0[:2])), -lim, lim
            )

        # per-segment 3D Dubins with straight-line fallback
        # (reference generate_3d_dubins_path_native, initialisation.py:412-477)
        sample_blocks = []
        self.segment_lengths = []
        for i in range(len(wps) - 1):
            qi = np.array([*wps[i], psi[i], gamma[i]])
            qf = np.array([*wps[i + 1], psi[i + 1], gamma[i + 1]])
            # per-segment radius: a glider bleeds energy along the course,
            # so late segments are flown slower and can turn much tighter
            # than the entry speed demands
            r_i = (
                float(r_min_per_segment[min(i, len(r_min_per_segment) - 1)])
                if r_min_per_segment else r_min
            )
            m = maneuver3d(qi, qf, r_i, pitch_limits=(-lim, lim))
            if m is not None:
                samples = m.sample_many(96)
                self.segment_lengths.append(m.length)
            else:
                samples = straight_line_fallback(qi, qf, 96)
                self.segment_lengths.append(float(np.linalg.norm(wps[i + 1] - wps[i])))
            sample_blocks.append(samples if i == 0 else samples[1:])
        if extend > 0.0:
            # straight run-out past the final waypoint: receding-horizon
            # tracking needs the carrot to survive the goal — a track that
            # ENDS at the scored point leaves the last ~commit-horizon of
            # flight without a target and the progress cutoff stops the
            # controller short of it (observed: 17 m miss at the final
            # waypoint with everything earlier passing <4 m)
            last = sample_blocks[-1][-1]
            n_ext = max(4, int(extend / 10.0))
            t_ext = np.linspace(0.0, extend, n_ext + 1)[1:]
            dxy = np.array([np.cos(last[3]), np.sin(last[3])])
            ext = np.stack(
                [
                    last[0] + t_ext * dxy[0],
                    last[1] + t_ext * dxy[1],
                    np.full_like(t_ext, last[2]),
                    np.full_like(t_ext, last[3]),
                    np.zeros_like(t_ext),
                ],
                axis=1,
            )
            sample_blocks.append(ext)
            self.segment_lengths.append(float(extend))
        raw = np.concatenate(sample_blocks, axis=0)   # (M_raw, 5)

        # arc-length resample to a uniform grid (trapezoid arc length,
        # reference initialisation.py:738-760)
        seg = np.linalg.norm(np.diff(raw[:, :3], axis=0), axis=1)
        s_raw = np.concatenate([[0.0], np.cumsum(seg)])
        self.total_length = float(s_raw[-1])
        s_uniform = np.linspace(0.0, self.total_length, n_track_points)
        resampled = np.stack(
            [np.interp(s_uniform, s_raw, raw[:, j]) for j in range(3)], axis=1
        )
        psi_u = np.interp(s_uniform, s_raw, np.unwrap(raw[:, 3]))
        gamma_u = np.interp(s_uniform, s_raw, raw[:, 4])
        if z_mode == "glide":
            # z rides the achievable glide slope along arc length (NED:
            # +z down, so descending means z increasing toward 0)
            resampled[:, 2] = wps[0, 2] + s_uniform / glide_ld
            gamma_u = np.full_like(gamma_u, np.arctan2(1.0, glide_ld))

        self.track_points = jnp.asarray(resampled, dtype=jnp.float32)  # (M, 3)
        self._psi = psi_u
        self._gamma = gamma_u
        self._s_uniform = s_uniform
        self.speed = float(speed)

    # -- track functions consumed by MHTT (device-side) ---------------------

    def length(self) -> float:
        return self.total_length

    def eval(self, s) -> jax.Array:
        """Track position at normalised progress s ∈ [0, 1]."""
        return catmull_rom_eval(self.track_points, jnp.asarray(s))

    def eval_tangent(self, s) -> jax.Array:
        """d position / d s (normalised) — magnitude ≈ total_length."""
        return catmull_rom_tangent(self.track_points, jnp.asarray(s))

    # -- state guess (host-side) --------------------------------------------

    def state_guess(self, num_nodes: int) -> np.ndarray:
        """(num_nodes + 1, 13) full-state warm start along the track:
        coordinated-turn attitude and finite-difference body rates
        (reference initialisation.py:277-348, 613-651)."""
        s = np.linspace(0.0, 1.0, num_nodes + 1)
        pos = np.asarray(self.eval(jnp.asarray(s, dtype=jnp.float32)))
        tan = np.asarray(self.eval_tangent(jnp.asarray(s, dtype=jnp.float32)))
        tan_norm = tan / np.maximum(np.linalg.norm(tan, axis=-1, keepdims=True), 1e-9)

        psi = np.interp(s, self._s_uniform / max(self.total_length, 1e-9), self._psi)
        gamma = np.interp(s, self._s_uniform / max(self.total_length, 1e-9), self._gamma)

        # coordinated-turn roll from lateral curvature: tan(phi) = v^2 kappa / g
        ds = self.total_length / num_nodes
        dpsi = np.gradient(np.unwrap(psi), s * max(self.total_length, 1e-9) + 1e-12)
        kappa = dpsi
        phi = np.arctan(self.speed**2 * kappa / 9.81)
        phi = np.clip(phi, -np.deg2rad(60), np.deg2rad(60))

        theta = -gamma  # z-down slope -> nose attitude
        q = np.asarray(quat.from_euler(phi, theta, psi))

        vel = self.speed * tan_norm
        dt = ds / max(self.speed, 1e-9)

        # body rates from attitude differences: omega = 2 vec(q_k^-1 q_{k+1})/dt
        omega = np.zeros((num_nodes + 1, 3))
        q_j = jnp.asarray(q, dtype=jnp.float32)
        dq = np.asarray(quat.multiply(quat.conjugate(q_j[:-1]), q_j[1:]))
        omega[:-1] = 2.0 * dq[:, :3] / max(dt, 1e-9)
        omega[-1] = omega[-2]

        return np.concatenate([pos, vel, q, omega], axis=1).astype(np.float32)
