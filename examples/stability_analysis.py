"""Stability analysis around trim: continuous + discrete spectra and the
perturbation/timestep studies.

Parity with the reference stability entry points (reference
main/stability/stability.py:47-170: eigenvalue scatter under quaternion-
perturbed states, max-eigenvalue-vs-timestep sweep, control-surface
spectral-radius surface; main/stability/dynamics_trimming.py:70-130:
continuous-Jacobian modes).  The reference evaluates its CasADi Jacobian
in nested Python loops; here each study is a single vmapped XLA launch
(solvers/trim.py discrete_stability_analysis).

  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python examples/stability_analysis.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from aircraft_tpu.config import glider_config
from aircraft_tpu.dynamics.aircraft import AircraftParams
from aircraft_tpu.solvers import trim as trim_mod

OUTDIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "data", "visualisation")


def main():
    cfg = glider_config()
    params = AircraftParams.from_config(cfg.aircraft, com_in_control=True)

    res = trim_mod.multistart_trim(params, jax.random.PRNGKey(0),
                                   n_starts=64, target_airspeed=50.0)
    print(f"trim residual {float(res.residual):.2e}")

    # continuous modes (dynamics_trimming.py role)
    eig_c = trim_mod.stability_eigenvalues(params, res.state, res.control)
    worst = eig_c[np.argmax(eig_c.real)]
    print(f"continuous spectrum: max Re = {worst.real:.3f} "
          f"(mode {worst:.3f}); {np.sum(np.abs(eig_c) < 1e-4)} neutral")

    # discrete perturbation cloud + dt sweep (stability.py role)
    report = trim_mod.discrete_stability_analysis(
        params, res.state, res.control, dt=0.01, n_perturb=25)
    print(f"discrete dt=0.01: spectral radius "
          f"{report.spectral_radius.min():.4f}..{report.spectral_radius.max():.4f}, "
          f"cond(A_d) median {np.median(report.condition_numbers):.1f}")
    print("dt sweep (dt -> max |eig|):")
    for d, r in list(zip(report.dt_sweep, report.dt_spectral_radius))[::5]:
        print(f"  {d:9.5f} -> {r:.4f}")

    # control-surface spectral-radius surface (stability.py:91-118)
    grid = 9
    defl = jnp.linspace(-5.0, 5.0, grid)
    ail, ele = jnp.meshgrid(defl, defl)
    controls = jnp.tile(res.control[None], (grid * grid, 1))
    controls = controls.at[:, 0].set(ail.ravel()).at[:, 1].set(ele.ravel())
    A_grid, _ = jax.vmap(
        lambda u: trim_mod.discrete_jacobians(params, res.state, u, 0.01)
    )(controls)
    rho_grid = np.abs(np.linalg.eigvals(
        np.asarray(A_grid, dtype=np.float64))).max(axis=-1).reshape(grid, grid)
    print(f"surface-deflection grid: spectral radius "
          f"{rho_grid.min():.4f}..{rho_grid.max():.4f}")

    # figures (host-side, after all device work — never in the hot path)
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, (ax1, ax2, ax3) = plt.subplots(1, 3, figsize=(15, 5))
    ax1.add_patch(plt.Circle((0, 0), 1, color="gray", fill=False,
                             linestyle="dashed"))
    ax1.scatter(report.eigenvalues.real.ravel(),
                report.eigenvalues.imag.ravel(), s=8, alpha=0.5)
    ax1.set_xlabel("Re"), ax1.set_ylabel("Im")
    ax1.set_title("discrete eigenvalues, perturbed states")
    ax1.axis("equal"), ax1.grid(True)

    ax2.loglog(report.dt_sweep, report.dt_spectral_radius, "o-")
    ax2.axhline(1, color="r", linestyle="--")
    ax2.set_xlabel("dt"), ax2.set_ylabel("max |eig|")
    ax2.set_title("spectral radius vs timestep"), ax2.grid(True)

    im = ax3.imshow(rho_grid, origin="lower", extent=[-5, 5, -5, 5],
                    aspect="auto", cmap="viridis")
    ax3.set_xlabel("aileron"), ax3.set_ylabel("elevator")
    ax3.set_title("spectral radius vs surface deflection")
    fig.colorbar(im, ax=ax3)

    os.makedirs(OUTDIR, exist_ok=True)
    out = os.path.join(OUTDIR, "stability_analysis.png")
    fig.tight_layout()
    fig.savefig(out, dpi=110)
    print(f"saved {out}")


if __name__ == "__main__":
    main()
