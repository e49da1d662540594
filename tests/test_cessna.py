"""Second airframe family: the reference's Cessna parameter file.

The reference ships `data/glider/cessna.json` (an `AircraftConfiguration`
block, reference utils.py:159-214) alongside the glider. A user switching
frameworks must be able to load it unmodified, trim it, and fly it — this
exercises the config ingestion path on a 250× heavier airframe with
metre-scale inertias and a negative Ixz.
"""

import json
import pathlib

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aircraft_tpu.config import AircraftConfig
from aircraft_tpu.dynamics import aircraft as ac
from aircraft_tpu.dynamics.aircraft import AircraftParams
from aircraft_tpu.solvers import integrators, trim as trim_mod

CESSNA_JSON = pathlib.Path("/root/reference/data/glider/cessna.json")

pytestmark = pytest.mark.skipif(
    not CESSNA_JSON.exists(), reason="reference cessna.json not present"
)


def cessna_params():
    cfg = AircraftConfig.from_dict(json.loads(CESSNA_JSON.read_text()))
    return cfg, AircraftParams.from_config(cfg, com_in_control=True)


class TestCessna:
    def test_config_loads_unmodified(self):
        cfg, params = cessna_params()
        assert float(params.mass) == 1000.0
        assert float(params.S) == 16.0
        inertia = np.asarray(params.static_inertia)
        assert inertia[0, 0] == pytest.approx(2424.0)
        # negative Ixz cross term lands in the off-diagonal slots
        # (reference aircraft.py:137-141 places Ixz as-is, symmetrically)
        assert inertia[0, 2] == pytest.approx(-161.5)
        assert inertia[2, 0] == inertia[0, 2]

    def test_trims_and_glides(self):
        _, params = cessna_params()
        result = trim_mod.multistart_trim(
            params, jax.random.PRNGKey(0), n_starts=64, target_airspeed=50.0
        )
        assert float(result.residual) < 1e-2, float(result.residual)
        xdot = ac.state_derivative(params, result.state, result.control)
        assert np.linalg.norm(np.asarray(xdot[3:6])) < 5e-2
        assert np.linalg.norm(np.asarray(xdot[10:13])) < 5e-2
        # unpowered: must descend; much heavier wing loading than the
        # glider (625 vs 16.8 kg/m²) → steeper glide
        assert float(result.state[5]) > 0.0

    def test_rollout_from_trim_stays_finite(self):
        _, params = cessna_params()
        result = trim_mod.multistart_trim(
            params, jax.random.PRNGKey(0), n_starts=64, target_airspeed=50.0
        )
        step = integrators.make_step_fn(params, substeps=10, normalize="step")
        u = result.control

        def f(x, _):
            x2 = step(x, u, 0.01)
            return x2, x2

        _, xs = jax.lax.scan(f, result.state, None, length=100)  # 1 s
        xs = np.asarray(xs)
        assert np.all(np.isfinite(xs))
        # near-steady over 1 s: airspeed drifts < 10%
        v0 = np.linalg.norm(np.asarray(result.state[3:6]))
        v1 = np.linalg.norm(xs[-1, 3:6])
        assert abs(v1 - v0) / v0 < 0.1, (v0, v1)
