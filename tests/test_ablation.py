"""Ablation harness smoke tests — the reference's de-facto regression
mechanism (reference main/control/ablation.py:62-110) covered all five
grid axes {time, quaternion, integration, model, substeps}; these pin the
two axes the rest of the suite doesn't already exercise end-to-end."""

import numpy as np

from aircraft_tpu import ablation
from aircraft_tpu.config import SolverConfig, glider_config

TINY = SolverConfig(max_al_iters=1, max_inner_iters=3, line_search_steps=4)


class TestAblationAxes:
    def test_implicit_integration_case_runs(self):
        cfg = glider_config()
        init = np.asarray(cfg.waypoints.initial_state)
        m, sol = ablation.run_case(
            cfg, model="default", quaternion="integration", substeps=1,
            integration="implicit", num_nodes=8, dt=0.05,
            goal=init[:3] + np.array([30.0, 5.0, 2.0]), solver_config=TINY,
        )
        assert m["integration"] == "implicit"
        assert np.all(np.isfinite(np.asarray(sol.xs)))
        # implicit Euler with the in-integrator renormalise keeps |q|=1
        assert m["quaternion_drift"] < 1e-3

    def test_time_mode_case_runs(self):
        m = ablation.run_time_mode_case(
            glider_config(), time_mode="progress", num_nodes=10, dt=0.1,
            substeps=2, solver_config=TINY,
        )
        assert m["time"] == "progress"
        assert np.isfinite(m["final_objective"])
