"""Containers, conversions, and trajectory checkpoint IO.

Covers the reference's `State`/`Control` convenience containers and the
aero→state conversions (reference src/aircraft/utils.py:43-152), plus the
HDF5/npz trajectory snapshots of `SaveMixin`/`TrajectoryData`
(reference control/base.py:48-114, plotting/plotting.py:62-95).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from pathlib import Path
from typing import Optional

import numpy as np

RHO = 1.225


# ---------------------------------------------------------------------------
# aero-condition -> velocity conversions (reference utils.py:43-69)
# ---------------------------------------------------------------------------


def u_from_aero(qbar, alpha, beta):
    u_sq = ((1 - np.sin(beta) ** 2) * 2 * qbar) / ((1 + np.tan(alpha) ** 2) * RHO)
    return np.sqrt(u_sq)


def v_from_aero(qbar, alpha, beta):
    return np.sin(beta) * np.sqrt(qbar * 2 / RHO)


def w_from_aero(qbar, alpha, beta):
    return u_from_aero(qbar, alpha, beta) * np.tan(alpha)


def state_from_aero(qbar, alpha, beta) -> np.ndarray:
    """13-state with velocity realising the given flow condition at identity
    attitude (reference aero_to_state, utils.py:57-69 — note: our state
    layout is [p, v, q, ω])."""
    x = np.zeros(13, dtype=np.float32)
    x[3] = u_from_aero(qbar, alpha, beta)
    x[4] = v_from_aero(qbar, alpha, beta)
    x[5] = w_from_aero(qbar, alpha, beta)
    x[9] = 1.0
    return x


# ---------------------------------------------------------------------------
# containers (reference utils.py:72-152)
# ---------------------------------------------------------------------------


@dataclass
class State:
    position: np.ndarray = field(default_factory=lambda: np.zeros(3))
    velocity: np.ndarray = field(default_factory=lambda: np.array([50.0, 0, 0]))
    orientation: np.ndarray = field(default_factory=lambda: np.array([0.0, 0, 0, 1]))
    angular_velocity: np.ndarray = field(default_factory=lambda: np.zeros(3))

    def as_vector(self) -> np.ndarray:
        return np.concatenate(
            [self.position, self.velocity, self.orientation, self.angular_velocity]
        ).astype(np.float32)

    @classmethod
    def from_vector(cls, x) -> "State":
        x = np.asarray(x)
        return cls(
            position=x[0:3], velocity=x[3:6],
            orientation=x[6:10], angular_velocity=x[10:13],
        )


@dataclass
class Control:
    aileron: float = 0.0
    elevator: float = 0.0
    rudder: float = 0.0
    throttle: np.ndarray = field(default_factory=lambda: np.zeros(3))
    flaps: float = 0.0
    centre_of_mass: Optional[np.ndarray] = None

    def as_vector(self) -> np.ndarray:
        v = np.concatenate(
            [[self.aileron, self.elevator, self.rudder], self.throttle, [self.flaps]]
        )
        if self.centre_of_mass is not None:
            v = np.concatenate([v, self.centre_of_mass])
        return v.astype(np.float32)


# ---------------------------------------------------------------------------
# trajectory checkpoints (reference SaveMixin / TrajectoryData)
# ---------------------------------------------------------------------------


@dataclass
class TrajectoryData:
    """A solved/simulated trajectory snapshot (reference
    plotting/plotting.py:62-95)."""

    state: np.ndarray                 # (T+1, 13)
    control: Optional[np.ndarray] = None   # (T, m)
    time: Optional[np.ndarray] = None      # (T,) or scalar horizon time
    lam: Optional[np.ndarray] = None       # waypoint progress, if any

    def save_npz(self, path) -> None:
        data = {"state": self.state}
        for k in ("control", "time", "lam"):
            v = getattr(self, k)
            if v is not None:
                data[k] = np.asarray(v)
        np.savez_compressed(path, **data)

    @classmethod
    def load_npz(cls, path) -> "TrajectoryData":
        d = np.load(path)
        return cls(
            state=d["state"],
            control=d["control"] if "control" in d else None,
            time=d["time"] if "time" in d else None,
            lam=d["lam"] if "lam" in d else None,
        )

    def save_h5(self, path, iteration: int = 0) -> None:
        """HDF5 layout compatible with the reference `SaveMixin`
        (control/base.py:89-114: gzip'd `iteration_<k>/{state,control,time}`)."""
        import h5py

        with h5py.File(path, "a") as f:
            grp = f.require_group(f"iteration_{iteration}")
            for name, data in (
                ("state", self.state),
                ("control", self.control),
                ("time", self.time),
            ):
                if data is None:
                    continue
                if name in grp:
                    del grp[name]
                arr = np.asarray(data)
                if arr.size > 1:
                    grp.create_dataset(name, data=arr, compression="gzip")
                else:
                    grp.create_dataset(name, data=arr)

    @classmethod
    def load_h5(cls, path, iteration: Optional[int] = None) -> "TrajectoryData":
        import h5py

        with h5py.File(path, "r") as f:
            keys = sorted(
                (k for k in f.keys() if k.startswith("iteration_")),
                key=lambda k: int(k.split("_")[1]),
            )
            grp = f[keys[-1] if iteration is None else f"iteration_{iteration}"]
            return cls(
                state=np.asarray(grp["state"]),
                control=np.asarray(grp["control"]) if "control" in grp else None,
                time=np.asarray(grp["time"]) if "time" in grp else None,
            )


def perturb_quaternion(q, delta_theta: float = 0.01, rng=None) -> np.ndarray:
    """Perturb a unit quaternion by a small random rotation
    (reference utils.py:349-362)."""
    from scipy.spatial.transform import Rotation as R

    rng = rng if rng is not None else np.random.default_rng()
    axis = rng.standard_normal(3)
    axis /= np.linalg.norm(axis)
    dq = R.from_rotvec(delta_theta * axis)
    return (R.from_quat(np.asarray(q)) * dq).as_quat(canonical=True)
