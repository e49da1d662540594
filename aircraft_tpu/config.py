"""Typed configuration tree for aircraft_tpu.

One dataclass tree covers what the reference spreads over three tiers
(module constants, SixDOFOpts/AircraftOpts dataclasses, and a stringly-typed
controller opts dict — reference src/aircraft/config.py,
src/aircraft/utils.py:159-347, src/aircraft/control/base.py:182-320).

`TrajectoryConfig.from_json` ingests the reference problem files unmodified
(e.g. reference data/glider/problem_definition.json).
"""

from __future__ import annotations

import json
import os
from typing import Optional
from dataclasses import dataclass, field
from pathlib import Path
from typing import Sequence

import numpy as np

# ---------------------------------------------------------------------------
# Paths
# ---------------------------------------------------------------------------

BASEPATH = Path(os.path.dirname(os.path.abspath(__file__))).parent
DATAPATH = BASEPATH / "data"
NETWORKPATH = DATAPATH / "networks"
VISUPATH = DATAPATH / "visualisation"

RHO = 1.225  # air density used throughout the aero pipeline [kg/m^3]


# ---------------------------------------------------------------------------
# Problem-definition tree (JSON-compatible with the reference schema)
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class AircraftConfig:
    """Geometry + inertia of the plant (reference utils.py:201-215)."""

    mass: float = 1.0
    span: float = 1.0
    length: float = 1.2
    chord: float = 1.0
    reference_area: float = 0.238
    aero_centre_offset: tuple[float, float, float] = (0.133, 0.0, 0.003)
    Ixx: float = 0.155
    Iyy: float = 0.114
    Izz: float = 0.262
    Ixz: float = 0.01
    r_min: float = 10.0
    glide_ratio: float = 10.0
    rudder_moment_arm: float = 0.5

    @classmethod
    def from_dict(cls, d: dict) -> "AircraftConfig":
        known = {f: d[f] for f in d if f in cls.__dataclass_fields__}
        if "aero_centre_offset" in known:
            known["aero_centre_offset"] = tuple(known["aero_centre_offset"])
        return cls(**known)

    @property
    def static_inertia(self) -> np.ndarray:
        """Body inertia tensor with the Ixz cross term (reference aircraft.py:137-141)."""
        return np.array(
            [
                [self.Ixx, 0.0, self.Ixz],
                [0.0, self.Iyy, 0.0],
                [self.Ixz, 0.0, self.Izz],
            ]
        )


@dataclass(frozen=True)
class StateEnvelope:
    """Aero-angle / airspeed flight envelope in degrees & m/s (reference utils.py:159-173)."""

    alpha: tuple[float, float] = (-15.0, 15.0)
    beta: tuple[float, float] = (-15.0, 15.0)
    airspeed: tuple[float, float] = (30.0, 100.0)

    @classmethod
    def from_dict(cls, d: dict) -> "StateEnvelope":
        return cls(
            alpha=tuple(d.get("alpha", (-15.0, 15.0))),
            beta=tuple(d.get("beta", (-15.0, 15.0))),
            airspeed=tuple(d.get("airspeed", (30.0, 100.0))),
        )


@dataclass(frozen=True)
class ControlEnvelope:
    """Control-surface bounds (reference utils.py:175-199)."""

    aileron: tuple[float, float] = (-5.0, 5.0)
    elevator: tuple[float, float] = (-5.0, 5.0)
    rudder: tuple[float, float] = (-5.0, 5.0)
    throttle: tuple[tuple[float, float, float], tuple[float, float, float]] = (
        (0.0, 0.0, 0.0),
        (0.0, 0.0, 0.0),
    )
    flaps: tuple[float, float] = (0.0, 1.0)
    centre_of_mass: tuple[tuple[float, float, float], tuple[float, float, float]] = (
        (-0.5, -0.1, -0.1),
        (0.5, 0.1, 0.1),
    )

    @classmethod
    def from_dict(cls, d: dict) -> "ControlEnvelope":
        def pair(key, default):
            v = d.get(key, default)
            return tuple(tuple(x) if isinstance(x, (list, tuple)) else x for x in v)

        return cls(
            aileron=pair("aileron_limit", (-5.0, 5.0)),
            elevator=pair("elevator_limit", (-5.0, 5.0)),
            rudder=pair("rudder_limit", (-5.0, 5.0)),
            throttle=pair("throttle_limit", ((0.0, 0.0, 0.0), (0.0, 0.0, 0.0))),
            flaps=pair("flaps_limit", (0.0, 1.0)),
            centre_of_mass=pair(
                "centre_of_mass_limit", ((-0.5, -0.1, -0.1), (0.5, 0.1, 0.1))
            ),
        )

    def bounds(self, dim: int = 7) -> tuple[np.ndarray, np.ndarray]:
        """(lb, ub) for the control vector [da, de, dr, thrust(3), flaps]."""
        lb = np.array(
            [self.aileron[0], self.elevator[0], self.rudder[0], *self.throttle[0], self.flaps[0]]
        )
        ub = np.array(
            [self.aileron[1], self.elevator[1], self.rudder[1], *self.throttle[1], self.flaps[1]]
        )
        if dim == 10:  # trim variant: CoM enters the control vector
            lb = np.concatenate([lb, np.array(self.centre_of_mass[0])])
            ub = np.concatenate([ub, np.array(self.centre_of_mass[1])])
        return lb[:dim], ub[:dim]


@dataclass(frozen=True)
class WaypointsConfig:
    """Waypoint set + initial condition (reference utils.py:247-277).

    ``waypoints`` here EXCLUDES the initial position (the reference prepends
    it internally); ``all_points()`` reproduces the prepended layout.
    Altitude back-fill for 2D waypoint sets follows the glide-ratio rule
    of reference utils.py:264-267.
    """

    waypoints: tuple[tuple[float, ...], ...] = ()
    initial_state: tuple[float, ...] = (0.0,) * 13
    default_velocity: float = 50.0
    waypoint_indices: tuple[int, ...] = (0, 1, 2)
    tolerance: float = 1e-2

    @classmethod
    def from_dict(cls, d: dict, glide_ratio: float = 10.0) -> "WaypointsConfig":
        wps = np.array(d.get("waypoints", [[0.0, 0.0, 0.0]]), dtype=float)
        init = d.get("initial_state")
        if init is None:
            init = np.zeros(13)
            init[:3] = wps[0]
            init[9] = 1.0
        init = np.asarray(init, dtype=float)
        indices = tuple(d.get("waypoint_indices", [0, 1, 2]))

        if len(indices) < 3:
            # 2D objective: altitude follows the glide slope
            pts = np.vstack([init[:3], wps])
            seg = np.linalg.norm(np.diff(pts, axis=0), axis=1)
            cum = np.concatenate([[0.0], np.cumsum(seg)])
            for i in range(len(wps)):
                wps[i, 2] = init[2] + cum[i + 1] / glide_ratio

        return cls(
            waypoints=tuple(tuple(w) for w in wps),
            initial_state=tuple(init),
            default_velocity=float(d.get("default_velocity", 50.0)),
            waypoint_indices=indices,
            tolerance=float(d.get("waypoint_tolerance", 1e-2)),
        )

    @property
    def initial_position(self) -> np.ndarray:
        return np.array(self.initial_state[:3])

    def array(self) -> np.ndarray:
        return np.array(self.waypoints, dtype=float)

    def all_points(self) -> np.ndarray:
        """Initial position + waypoints, shape (n+1, 3)."""
        return np.vstack([self.initial_position, self.array()])

    def cumulative_distances(self) -> np.ndarray:
        pts = self.all_points()
        seg = np.linalg.norm(np.diff(pts, axis=0), axis=1)
        return np.concatenate([[0.0], np.cumsum(seg)])


@dataclass(frozen=True)
class TrajectoryConfig:
    """Top-level problem definition, loadable from the reference JSON schema."""

    aircraft: AircraftConfig = field(default_factory=AircraftConfig)
    state: StateEnvelope = field(default_factory=StateEnvelope)
    control: ControlEnvelope = field(default_factory=ControlEnvelope)
    waypoints: WaypointsConfig = field(default_factory=WaypointsConfig)

    @classmethod
    def from_dict(cls, d: dict) -> "TrajectoryConfig":
        aircraft = AircraftConfig.from_dict(d.get("aircraft", {}))
        return cls(
            aircraft=aircraft,
            state=StateEnvelope.from_dict(d.get("state", {})),
            control=ControlEnvelope.from_dict(d.get("control", {})),
            waypoints=WaypointsConfig.from_dict(
                d.get("waypoints", {}), glide_ratio=aircraft.glide_ratio
            ),
        )

    @classmethod
    def from_json(cls, path: str | Path) -> "TrajectoryConfig":
        with open(path) as f:
            return cls.from_dict(json.load(f))

    def to_dict(self) -> dict:
        """Serialise back to the reference JSON schema (the exact keys
        ``from_dict`` consumes), so configs round-trip:
        ``TrajectoryConfig.from_dict(cfg.to_dict()) == cfg`` for 3D
        waypoint sets.  (2D sets are not invertible: ``from_dict``
        back-fills altitude by the glide-ratio rule on load.)"""
        a = self.aircraft
        return {
            "waypoints": {
                "waypoints": [list(w) for w in self.waypoints.waypoints],
                "initial_state": list(self.waypoints.initial_state),
                "default_velocity": self.waypoints.default_velocity,
                "waypoint_indices": list(self.waypoints.waypoint_indices),
                "waypoint_tolerance": self.waypoints.tolerance,
            },
            "aircraft": {
                "mass": a.mass, "span": a.span, "length": a.length,
                "chord": a.chord, "reference_area": a.reference_area,
                "aero_centre_offset": list(a.aero_centre_offset),
                "Ixx": a.Ixx, "Iyy": a.Iyy, "Izz": a.Izz, "Ixz": a.Ixz,
                "r_min": a.r_min, "glide_ratio": a.glide_ratio,
                "rudder_moment_arm": a.rudder_moment_arm,
            },
            "state": {
                "alpha": list(self.state.alpha),
                "beta": list(self.state.beta),
                "airspeed": list(self.state.airspeed),
            },
            "control": {
                "aileron_limit": list(self.control.aileron),
                "elevator_limit": list(self.control.elevator),
                "rudder_limit": list(self.control.rudder),
                "throttle_limit": [list(t) for t in self.control.throttle],
                "flaps_limit": list(self.control.flaps),
                "centre_of_mass_limit": [
                    list(c) for c in self.control.centre_of_mass
                ],
            },
        }

    def save_json(self, path: str | Path) -> None:
        with open(path, "w") as f:
            json.dump(self.to_dict(), f, indent=2)


# ---------------------------------------------------------------------------
# Transcription / solver option axes
# ---------------------------------------------------------------------------

TIME_MODES = ("fixed", "progress", "variable", "adaptive")
QUATERNION_MODES = ("", "constraint", "baumgarte", "integration")
INTEGRATION_MODES = ("explicit", "implicit")


@dataclass(frozen=True)
class TranscriptionConfig:
    """Option axes of the OCP transcription — the reference's controller opts
    dict made typed (reference control/base.py:182-320, ablation grid
    main/control/ablation.py:62-67)."""

    num_nodes: int = 50
    dt: float = 0.01
    time: str = "fixed"            # fixed | progress | variable | adaptive
    quaternion: str = "integration"  # '' | constraint | baumgarte | integration
    integration: str = "explicit"  # explicit | implicit
    substeps: int = 1
    dt_bounds: tuple[float, float] = (1e-4, 1e-2)

    def __post_init__(self):
        assert self.time in TIME_MODES, self.time
        assert self.quaternion in QUATERNION_MODES, self.quaternion
        assert self.integration in INTEGRATION_MODES, self.integration


@dataclass(frozen=True)
class SolverConfig:
    """Batched AL-iLQR / SQP solver settings (role of the reference's IPOPT
    options dict, reference config.py:23-54)."""

    max_al_iters: int = 12          # outer augmented-Lagrangian updates
    max_inner_iters: int = 30       # inner iLQR iterations per AL step
    tol: float = 1e-6               # stationarity tolerance
    constraint_tol: float = 1e-6    # max constraint violation target
    penalty_init: float = 10.0
    penalty_scale: float = 10.0
    penalty_max: float = 1e8
    # LANCELOT-style per-row penalty adaptation for the STAGE inequalities
    # (solvers/ocp.ALState.mu_row): rows still violated beyond
    # `penalty_row_target` after a multiplier update get their factor
    # escalated; shift_al_state carries the factors across receding-horizon
    # windows.  Off by default (bit-neutral: all-ones factors).  Measured:
    # on a cost-conflicted constraint it prices the violated row 2.6-20x
    # below the uniform schedule while leaving inactive rows untouched
    # (tests/test_ilqr.py::TestPerRowPenalty); on the serving chain it is
    # NOT a default — aggressive factors over-stiffen the multiplier
    # updates on marginal stations (measured: two of eight fleet stations
    # destabilise at scale 3 / cap 30) — use deliberately, per problem.
    penalty_per_row: bool = False
    penalty_row_scale: float = 10.0
    penalty_row_max: float = 1e3
    penalty_row_target: float = 1e-2
    reg_init: float = 1e-6
    reg_max: float = 1e8
    # trust-region adaptation factors: reg *= escalate on a rejected step,
    # reg /= relax on an accepted one.  In a FIXED-trip-count inner loop a
    # rejection streak burns whole iterations relinearising an unchanged
    # iterate, so escalation must be steep enough to re-damp in one or two
    # steps: at x10 the MHTT window solve wastes 4-5 iterations per streak
    # (iterations 5-8 of an 8-iteration budget change NOTHING), while x100
    # reaches a better point in 6 iterations than x10 reaches in 12
    # (mean window cost 709 vs 783; see STATUS.md iteration study).
    # The tracking-window solvers (control/mhtt.py, bench.py) pass 100
    # explicitly; the global default stays 10 because the waypoint
    # complementarity and progress-time formulations are tuned to it
    # (their switching structure is sensitive to the solve path).
    reg_escalate: float = 10.0
    reg_relax: float = 5.0
    line_search_steps: int = 12
    rollout_substeps: int = 1
    # cap on feedback/feedforward gain magnitudes — diverged linearisation
    # knots otherwise emit astronomically large gains whose candidates can
    # never pass the line search (safe: acceptance still requires descent)
    gain_clip: float = 1e4
    # Gauss-Newton curvature source when the OCP carries a least-squares
    # decomposition: None = auto (residual J^T J off-TPU where it is ~1.5x
    # faster; full scalar Hessians on TPU where XLA fuses them ~10% faster
    # -- measured both ways on the N=50 B=256 headline bench), or force
    # with True/False
    use_residual_gn: Optional[bool] = None
    # 'sequential' = O(N) Riccati scan; 'associative' = O(log N)-depth
    # parallel-in-time sweep (wins at long horizons)
    riccati: str = "sequential"
    # unroll factor for the three per-knot scans (rollout, line-search
    # forward, sequential Riccati): >1 trades program size for fewer loop
    # iterations and cross-step fusion; should divide the horizon
    scan_unroll: int = 1
    # 'exact' differentiates the full AL (IPOPT-parity Hessian, reference
    # config.py:29) — needed for complementarity-coupled constraints;
    # 'gauss_newton' builds constraint curvature as μ JᵀJ (PSD by
    # construction, much smaller XLA program) — preferred for MPC windows
    hessian: str = "exact"


# State/control scaling used by the reference solve (reference config.py:58-65)
DEFAULT_STATE_SCALE = np.array(
    [1e2, 1e2, 1e2, 50, 50, 50, 1, 1, 1, 1, np.pi, np.pi, np.pi]
)
DEFAULT_CONTROL_SCALE = np.array([10.0, 10.0, 1.0, 1.0, 1.0, 1.0, 1.0])


# The canonical glider problem (mirrors reference
# data/glider/problem_definition.json; shipped standalone as
# data/glider/problem_definition.json in this repo — regenerate with
# `python -c "from aircraft_tpu.config import write_glider_problem_json;
#             write_glider_problem_json()"`).
GLIDER_PROBLEM: dict = {
            "waypoints": {
                "waypoints": [
                    [150.0, 10.0, -190.0],
                    [0.0, 20.0, -180.0],
                    [150.0, 10.0, -190.0],
                    [0.0, 0.0, -180.0],
                ],
                "initial_state": [0, 0, -200, 50, 0, 0, 0, 0, 0, 1, 0, 0, 0],
                "default_velocity": 30,
                "waypoint_indices": [0, 1],
                "waypoint_tolerance": 1e1,
            },
            "aircraft": {
                "mass": 4.0,
                "span": 2.0,
                "length": 1.2,
                "chord": 0.124605,
                "reference_area": 0.238,
                "aero_centre_offset": [0.133, 0, 0.003],
                "Ixx": 0.155,
                "Iyy": 0.114,
                "Izz": 0.262,
                "Ixz": 0.01,
                "glide_ratio": 3.0,
                "r_min": 1.0,
            },
            "state": {
                "alpha": [-15, 15],
                "beta": [-15, 15],
                "airspeed": [30, 100],
            },
            "control": {
                "aileron_limit": [-10, 10],
                "elevator_limit": [-10, 10],
                "rudder_limit": [-10, 10],
                "throttle_limit": [[0, 0, 0], [0, 0, 0]],
                "centre_of_mass_limit": [[-0.5, -0.1, -0.1], [0.5, 0.1, 0.1]],
            },
}


def glider_config() -> TrajectoryConfig:
    """The canonical glider problem (reference
    data/glider/problem_definition.json)."""
    return TrajectoryConfig.from_dict(GLIDER_PROBLEM)


def write_glider_problem_json(path: str | Path = "data/glider/problem_definition.json"):
    """Ship the canonical problem as a standalone JSON (the raw declared
    dict, NOT a loaded config's to_dict() — the 2D waypoint objective's
    glide-ratio altitude back-fill applies on LOAD and must not be baked
    into the file)."""
    p = Path(path)
    p.parent.mkdir(parents=True, exist_ok=True)
    with open(p, "w") as f:
        json.dump(GLIDER_PROBLEM, f, indent=2)
