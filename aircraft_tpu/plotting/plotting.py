"""Host-side trajectory visualisation (never on the solve path).

Parity with the reference `TrajectoryPlotter` dashboard (reference
src/aircraft/plotting/plotting.py): 3D position with orientation quivers and
waypoints, Euler angles, velocities, body rates, aero angles, controls, and
solver-convergence plots.  The reference re-plotted inside the IPOPT
callback every 50 iterations and burned 97% of a solve's wall clock on it
(SURVEY §6 block 1: 411 s of 423 s) — here plotting is strictly post-hoc on
host numpy arrays.
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional

import numpy as np

from aircraft_tpu.ops import quaternion as quat
from aircraft_tpu.utils import TrajectoryData


def _euler(states: np.ndarray) -> np.ndarray:
    import jax.numpy as jnp

    return np.asarray(quat.to_euler(jnp.asarray(states[:, 6:10])))


def plot_convergence(ax, inf_pr, inf_du):
    """Primal/dual infeasibility vs iteration (reference plotting.py:22-32)."""
    ax.plot(inf_pr, label="primal inf")
    ax.plot(inf_du, label="dual inf")
    ax.set_yscale("log")
    ax.set_xlabel("iteration")
    ax.legend()
    return ax


class TrajectoryPlotter:
    """Dashboard over a `TrajectoryData` (reference plotting.py:98-519).

    With ``params`` (an `AircraftParams`) the aero panel shows the PLANT'S
    OWN α/β — `aero_state` over the flown states and controls, wind-aware —
    and two extra panels plot body-frame forces/moments from the plant's
    `forces_frd`/`moments_frd` (the reference plots these from its own
    symbolic functions, reference plotting.py:283-478).  Without params the
    aero panel falls back to the inertial-velocity approximation (wrong
    under wind, and labelled as such)."""

    def __init__(self, waypoints: Optional[np.ndarray] = None, dt: float = 0.01,
                 params=None, wind=None):
        self.waypoints = waypoints
        self.dt = dt
        self.params = params
        self.wind = wind

    def _plant_panels(self, xs: np.ndarray, us: Optional[np.ndarray]):
        """(alpha, beta, forces, moments) from the plant's own functions,
        or None when params/controls are unavailable."""
        if self.params is None or us is None or us.shape[0] == 0:
            return None
        import jax
        import jax.numpy as jnp

        from aircraft_tpu.dynamics import aircraft as ac

        n = min(xs.shape[0], us.shape[0])
        x_j = jnp.asarray(xs[:n, :13])
        u_j = jnp.asarray(us[:n, :7])
        wind = None if self.wind is None else jnp.asarray(self.wind)

        def one(x, u):
            aero = ac.aero_state(self.params, x, u, wind)
            F = ac.forces_frd(self.params, x, u, wind)
            M = ac.moments_frd(self.params, x, u, wind)
            return aero.alpha, aero.beta, F, M

        alpha, beta, F, M = jax.vmap(one)(x_j, u_j)
        return (np.asarray(alpha), np.asarray(beta),
                np.asarray(F), np.asarray(M))

    def plot(self, data: TrajectoryData, show: bool = False):
        import matplotlib

        matplotlib.use("Agg", force=False)
        import matplotlib.pyplot as plt

        xs = np.asarray(data.state)
        us = np.asarray(data.control) if data.control is not None else None
        T = xs.shape[0]
        t = np.arange(T) * self.dt if data.time is None else np.asarray(data.time)
        if np.ndim(t) == 0 or len(np.atleast_1d(t)) != T:
            t = np.arange(T) * self.dt

        fig = plt.figure(figsize=(18, 10))

        ax3d = fig.add_subplot(3, 4, (1, 6), projection="3d")
        ax3d.plot(xs[:, 0], xs[:, 1], -xs[:, 2], "b-", lw=1)
        # orientation quivers every ~10th sample (body x-axis)
        import jax.numpy as jnp

        idx = np.arange(0, T, max(1, T // 25))
        fwd = np.asarray(
            quat.rotate(jnp.asarray(xs[idx, 6:10]), jnp.asarray([1.0, 0.0, 0.0]))
        )
        ax3d.quiver(
            xs[idx, 0], xs[idx, 1], -xs[idx, 2],
            fwd[:, 0], fwd[:, 1], -fwd[:, 2],
            length=8.0, color="r", normalize=True,
        )
        if self.waypoints is not None:
            w = np.asarray(self.waypoints)
            ax3d.scatter(w[:, 0], w[:, 1], -w[:, 2], c="g", s=60, marker="o")
        ax3d.set_xlabel("N [m]"); ax3d.set_ylabel("E [m]"); ax3d.set_zlabel("alt [m]")
        ax3d.set_title("trajectory")

        eul = _euler(xs)
        ax = fig.add_subplot(3, 4, 3)
        for i, n in enumerate(["phi", "theta", "psi"]):
            ax.plot(t, np.rad2deg(eul[:, i]), label=n)
        ax.legend(); ax.set_title("attitude [deg]")

        ax = fig.add_subplot(3, 4, 4)
        for i, n in enumerate(["vx", "vy", "vz"]):
            ax.plot(t, xs[:, 3 + i], label=n)
        ax.plot(t, np.linalg.norm(xs[:, 3:6], axis=1), "k--", label="|v|")
        ax.legend(); ax.set_title("velocity [m/s]")

        ax = fig.add_subplot(3, 4, 7)
        for i, n in enumerate(["p", "q", "r"]):
            ax.plot(t, xs[:, 10 + i], label=n)
        ax.legend(); ax.set_title("body rates [rad/s]")

        plant = self._plant_panels(xs, us)

        ax = fig.add_subplot(3, 4, 8)
        if plant is not None and data.lam is not None:
            # with forces/moments panels occupying slots 10/12, progress
            # takes the altitude slot (altitude is readable off the 3D plot)
            lam = np.asarray(data.lam)
            for j in range(lam.shape[1]):
                ax.plot(lam[:, j], label=f"λ{j}")
            ax.legend(); ax.set_title("waypoint progress")
        else:
            ax.plot(t, -xs[:, 2])
            ax.set_title("altitude [m]")

        if us is not None and us.shape[0] > 0:
            tu = t[: us.shape[0]]
            ax = fig.add_subplot(3, 4, 9)
            for i, n in enumerate(["aileron", "elevator", "rudder"]):
                ax.plot(tu, us[:, i], label=n)
            if us.shape[1] > 6:
                ax.plot(tu, us[:, 6], label="flaps")
            ax.legend(); ax.set_title("surfaces")

        ax = fig.add_subplot(3, 4, 11)
        speed = np.linalg.norm(xs[:, 3:6], axis=1)
        if plant is not None:
            alpha, beta, F, M = plant
            ta = t[: alpha.shape[0]]
            ax.plot(ta, np.rad2deg(alpha), label="alpha")
            ax.plot(ta, np.rad2deg(beta), label="beta")
            ax.plot(t, speed, label="|v|")
            ax.legend(); ax.set_title("aero (plant, wind-aware) [deg, m/s]")

            # body-frame forces/moments from the plant's own functions
            # (reference plotting.py:283-478 forces/moments panels)
            ax = fig.add_subplot(3, 4, 10)
            for i, n in enumerate(["Fx", "Fy", "Fz"]):
                ax.plot(ta, F[:, i], label=n)
            ax.legend(); ax.set_title("forces FRD [N]")
            ax = fig.add_subplot(3, 4, 12)
            for i, n in enumerate(["Mx", "My", "Mz"]):
                ax.plot(ta, M[:, i], label=n)
            ax.legend(); ax.set_title("moments FRD [N·m]")
        else:
            alpha = np.arctan2(xs[:, 5], np.maximum(xs[:, 3], 1e-6))
            ax.plot(t, np.rad2deg(alpha), label="alpha*")
            ax.plot(t, speed, label="|v|")
            ax.legend(); ax.set_title("aero (inertial approx)")

        if data.lam is not None and plant is None:
            ax = fig.add_subplot(3, 4, 12)
            lam = np.asarray(data.lam)
            for j in range(lam.shape[1]):
                ax.plot(lam[:, j], label=f"λ{j}")
            ax.legend(); ax.set_title("waypoint progress")

        fig.tight_layout()
        if show:
            plt.show()
        return fig

    def save(self, data: TrajectoryData, path) -> None:
        fig = self.plot(data)
        fig.savefig(path, dpi=110)
        import matplotlib.pyplot as plt

        plt.close(fig)

    def animation(self, data: TrajectoryData, path, fps: int = 20) -> None:
        """GIF of the 3D trajectory (reference plotting.py:503-517)."""
        import matplotlib

        matplotlib.use("Agg", force=False)
        import matplotlib.pyplot as plt
        from matplotlib.animation import FuncAnimation, PillowWriter

        xs = np.asarray(data.state)
        fig = plt.figure(figsize=(7, 6))
        ax = fig.add_subplot(projection="3d")
        (line,) = ax.plot([], [], [], "b-")
        (dot,) = ax.plot([], [], [], "ro")
        ax.set_xlim(xs[:, 0].min() - 5, xs[:, 0].max() + 5)
        ax.set_ylim(xs[:, 1].min() - 5, xs[:, 1].max() + 5)
        ax.set_zlim((-xs[:, 2]).min() - 5, (-xs[:, 2]).max() + 5)

        def update(i):
            line.set_data(xs[:i, 0], xs[:i, 1])
            line.set_3d_properties(-xs[:i, 2])
            dot.set_data(xs[i : i + 1, 0], xs[i : i + 1, 1])
            dot.set_3d_properties(-xs[i : i + 1, 2])
            return line, dot

        anim = FuncAnimation(fig, update, frames=xs.shape[0], blit=False)
        anim.save(path, writer=PillowWriter(fps=fps))
        plt.close(fig)


def aero_polars(params, alphas_deg, airspeed: float = 50.0):
    """Sweep angle of attack through the coefficient model at fixed airspeed
    and return the 6 aero coefficients, shape (len(alphas), 6).

    Role of the reference's analytic polar figures (figures/alpha_vs_cx.svg,
    alpha_vs_cz.svg, cited by BASELINE config 1): states are built with body
    velocity [V cos α, 0, V sin α] and identity attitude so α is exact.
    """
    import jax
    import jax.numpy as jnp

    from aircraft_tpu.dynamics.aircraft import coefficients

    alphas = jnp.deg2rad(jnp.asarray(alphas_deg, dtype=jnp.float32))

    def one(a):
        x = jnp.concatenate([
            jnp.array([0.0, 0.0, -200.0]),
            airspeed * jnp.array([jnp.cos(a), 0.0, jnp.sin(a)]),
            jnp.array([0.0, 0.0, 0.0, 1.0, 0.0, 0.0, 0.0]),
        ])
        return coefficients(params, x, jnp.zeros(7))

    return np.asarray(jax.vmap(one)(alphas))


def plot_polars(models: dict, path=None, airspeed: float = 50.0,
                alpha_range_deg=(-15.0, 20.0), n: int = 71):
    """α-vs-CX and α-vs-CZ polar comparison across coefficient models.

    ``models``: {label: AircraftParams}.  Saves to ``path`` if given,
    returns the matplotlib figure.
    """
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    alphas = np.linspace(alpha_range_deg[0], alpha_range_deg[1], n)
    fig, axes = plt.subplots(1, 2, figsize=(10, 4))
    for label, params in models.items():
        C = aero_polars(params, alphas, airspeed)
        axes[0].plot(alphas, C[:, 0], label=label)
        axes[1].plot(alphas, C[:, 2], label=label)
    axes[0].set_xlabel("α [deg]"); axes[0].set_ylabel("CX")
    axes[1].set_xlabel("α [deg]"); axes[1].set_ylabel("CZ")
    for ax in axes:
        ax.grid(True, alpha=0.3)
        ax.legend()
    fig.tight_layout()
    if path is not None:
        fig.savefig(path, bbox_inches="tight")
    return fig
