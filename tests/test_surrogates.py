"""Surrogate fitting/training tests (reference main/surrogates/ scripts)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aircraft_tpu.dynamics.coefficients import mlp_forward
from aircraft_tpu.surrogates import fit_linear, fit_polynomial, train_mlp
from aircraft_tpu.surrogates.models import load_mlp, save_mlp

RNG = np.random.default_rng(5)


def synthetic_inputs(n):
    x = np.zeros((n, 5), dtype=np.float32)
    x[:, 0] = RNG.uniform(200, 4000, n)      # qbar
    x[:, 1] = RNG.uniform(-0.3, 0.3, n)      # alpha
    x[:, 2] = RNG.uniform(-0.3, 0.3, n)      # beta
    x[:, 3] = RNG.uniform(-5, 5, n)          # aileron
    x[:, 4] = RNG.uniform(-5, 5, n)          # elevator
    return x


class TestClassicalFits:
    def test_linear_fit_recovers_affine_map(self):
        M = RNG.normal(0, 0.05, (6, 6)).astype(np.float32)
        x = synthetic_inputs(2000)
        y = np.concatenate([x, np.ones((2000, 1), np.float32)], axis=1) @ M.T
        fit = fit_linear(x, y)
        np.testing.assert_allclose(np.asarray(fit.matrix), M, atol=1e-3)

    def test_poly_fit_recovers_cubic(self):
        x = synthetic_inputs(4000)
        xs = x / np.abs(x).max(axis=0)
        y = np.stack(
            [
                0.1 + 0.5 * xs[:, 1] - 0.2 * xs[:, 1] ** 3,
                0.3 * xs[:, 2],
                -0.5 - 5.0 * xs[:, 1] + xs[:, 1] * xs[:, 2],
                0.08 * xs[:, 3],
                -1.2 * xs[:, 4] + 0.4 * xs[:, 1] ** 2,
                0.01 * xs[:, 2] ** 2,
            ],
            axis=1,
        ).astype(np.float32)
        fit = fit_polynomial(x, y, degree=3)
        from aircraft_tpu.dynamics.coefficients import _poly_eval

        pred = np.asarray(_poly_eval(fit, jnp.asarray(x[:200])))
        np.testing.assert_allclose(pred, y[:200], atol=5e-3)


class TestMLPTraining:
    def test_training_reduces_loss_and_roundtrips(self, tmp_path):
        x = synthetic_inputs(3000)
        # smooth target with the right output scales
        y = np.stack(
            [
                -0.02 - 0.3 * x[:, 1] ** 2,
                -0.98 * x[:, 2],
                -5.0 * x[:, 1],
                0.005 * x[:, 3],
                -0.1 * x[:, 4] + 0.2 * np.tanh(x[:, 1]),
                0.02 * x[:, 2],
            ],
            axis=1,
        ).astype(np.float32)
        result = train_mlp(x, y, epochs=60, patience=15, learning_rate=3e-3)
        assert np.isfinite(result.val_loss)
        assert result.val_loss < 0.05, result.val_loss

        # npz round trip
        p = tmp_path / "mlp.npz"
        save_mlp(p, result.params)
        loaded = load_mlp(p)
        xt = jnp.asarray(x[:8])
        np.testing.assert_allclose(
            np.asarray(mlp_forward(loaded, xt)),
            np.asarray(mlp_forward(result.params, xt)),
            atol=1e-6,
        )


class TestReferenceCheckpoint:
    def test_load_reference_pth(self):
        """Parity loader for the reference torch checkpoint
        (reference utils.py:22-40)."""
        import pathlib

        ref = pathlib.Path("/root/reference/data/networks/model-dynamics.pth")
        if not ref.exists():
            pytest.skip("reference checkpoint not present")
        from aircraft_tpu.dynamics.coefficients import MLPCoeffParams

        params = MLPCoeffParams.from_torch_checkpoint(ref)
        x = jnp.asarray(synthetic_inputs(16))
        out = np.asarray(mlp_forward(params, x))
        assert out.shape == (16, 6)
        assert np.all(np.isfinite(out))

        # cross-check against torch forward
        import torch

        ckpt = torch.load(ref, map_location="cpu", weights_only=True)
        sd = ckpt["model_state_dict"]
        xt = torch.tensor(np.asarray(x))
        h = (xt - ckpt["input_mean"]) / ckpt["input_std"]
        h = h @ sd["core_layers.0.weight"].T + sd["core_layers.0.bias"]
        h = h @ sd["core_layers.1.weight"].T + sd["core_layers.1.bias"]
        h = torch.tanh(h)
        h = h @ sd["core_layers.3.weight"].T + sd["core_layers.3.bias"]
        expected = (h * ckpt["output_std"] + ckpt["output_mean"]).numpy()
        np.testing.assert_allclose(out, expected, atol=1e-5)


class TestTaylorModel:
    """First-order Taylor surrogate mode
    (reference RealTimeL4CasADi, coefficient_models.py:93-104)."""

    def _mlp_and_anchor(self):
        import jax

        from aircraft_tpu.dynamics.coefficients import (
            MLPCoeffParams, TaylorCoeffParams)

        mlp = MLPCoeffParams.init(jax.random.PRNGKey(2))
        anchor = jnp.asarray([1530.0, 0.05, 0.0, 0.0, 0.0])
        return mlp, TaylorCoeffParams.from_model(mlp, anchor), anchor

    def test_exact_at_anchor_first_order_nearby(self):
        from aircraft_tpu.dynamics.coefficients import (
            _taylor_eval, mlp_forward)

        mlp, taylor, anchor = self._mlp_and_anchor()
        np.testing.assert_allclose(
            np.asarray(_taylor_eval(taylor, anchor)),
            np.asarray(mlp_forward(mlp, anchor)), atol=1e-5)

        # quadratic error decay: err(2d) / err(d) ~ 4.  The direction is
        # scaled to each input's physical range so the step actually moves
        # the network out of its linear regime.
        rng = np.random.default_rng(0)
        ranges = jnp.asarray([500.0, 0.2, 0.2, 3.0, 3.0])
        direction = jnp.asarray(rng.normal(0, 1, 5).astype(np.float32)) * ranges
        errs = []
        for scale in (0.5, 1.0):
            x = anchor + scale * direction
            errs.append(float(jnp.max(jnp.abs(
                _taylor_eval(taylor, x) - mlp_forward(mlp, x)))))
        assert errs[1] / max(errs[0], 1e-12) > 2.0  # superlinear growth

    def test_plugs_into_plant(self):
        import jax

        from aircraft_tpu.config import glider_config
        from aircraft_tpu.dynamics import aircraft as ac
        from aircraft_tpu.dynamics.aircraft import AircraftParams

        from aircraft_tpu.dynamics.coefficients import (
            TaylorCoeffParams, model_inputs)

        mlp, _, _ = self._mlp_and_anchor()
        cfg = glider_config()
        p_nn = AircraftParams.from_config(cfg.aircraft, coeff=mlp)
        x = jnp.asarray([0, 0, -200, 50, 0, 0, 0, 0, 0, 1, 0, 0, 0],
                        jnp.float32)
        u = jnp.zeros(7, jnp.float32)
        # anchor at THIS operating point's model inputs (what an MPC loop
        # does between windows)
        aero = ac.aero_state(p_nn, x, u)
        anchor = model_inputs(aero, u[0], u[1])
        taylor = TaylorCoeffParams.from_model(mlp, anchor)
        p_ta = AircraftParams.from_config(cfg.aircraft, coeff=taylor)
        d_nn = np.asarray(ac.state_derivative(p_nn, x, u))
        d_ta = np.asarray(ac.state_derivative(p_ta, x, u))
        np.testing.assert_allclose(d_ta, d_nn, rtol=1e-4, atol=1e-3)

    def test_reanchor_under_jit(self):
        import jax

        from aircraft_tpu.dynamics.coefficients import (
            TaylorCoeffParams, _taylor_eval, mlp_forward)

        mlp, _, _ = self._mlp_and_anchor()

        @jax.jit
        def reanchor(x):
            return TaylorCoeffParams.from_model(mlp, x)

        x2 = jnp.asarray([800.0, -0.1, 0.05, 1.0, -1.0])
        t2 = reanchor(x2)
        np.testing.assert_allclose(
            np.asarray(_taylor_eval(t2, x2)),
            np.asarray(mlp_forward(mlp, x2)), atol=1e-5)

    def test_registry_roundtrip(self):
        from aircraft_tpu.dynamics.coefficients import (
            COEFF_MODEL_REGISTRY, TaylorCoeffParams)

        assert COEFF_MODEL_REGISTRY["nn_taylor"] is TaylorCoeffParams

    def test_poly_anchor_rejected(self):
        """Anchoring the poly model must fail loudly: _apply_poly adds
        per-surface corrections an affine expansion would silently drop."""
        import pytest as _pytest

        from aircraft_tpu.dynamics.coefficients import (PolyCoeffParams,
                                                        TaylorCoeffParams)
        from aircraft_tpu.surrogates.models import fit_polynomial

        rng = np.random.default_rng(0)
        x = rng.normal(0, 1, (64, 5)).astype(np.float32)
        y = rng.normal(0, 1, (64, 6)).astype(np.float32)
        poly = fit_polynomial(x, y)
        with _pytest.raises(TypeError):
            TaylorCoeffParams.from_model(poly, jnp.zeros(5))


class TestReferencePreprocess:
    """The full-fidelity preprocessing pipeline must encode EXACTLY the
    conventions that produced the reference's processed artifact
    (reference main/surrogates/preprocess.py:125-247, 439-511).  The raw
    npz archives are not shipped, so the check is a round trip on
    data_sim.csv itself: invert the pipeline to synthetic raw samples,
    run the forward pipeline, require bit-level reproduction — any wrong
    sign flip, rotation, control centering, or scale breaks it."""

    def test_roundtrip_reproduces_data_sim_csv(self):
        import json
        from pathlib import Path

        import pandas as pd
        import pytest as _pytest

        from aircraft_tpu.surrogates import preprocess as pp

        csv = Path("/root/reference/data/processed/data_sim.csv")
        if not csv.exists():
            _pytest.skip("reference processed CSV not present")
        df = pd.read_csv(csv)
        wt_params = json.load(
            open("/root/reference/data/glider/glider_wt.json"))
        fs_params = json.load(
            open("/root/reference/data/glider/glider_fs.json"))
        # main() overrides the freestream source's reference area
        # (preprocess.py:458-459)
        fs_params_2 = dict(fs_params, reference_area=0.225454)

        for wt_flag, params, axes, body in (
            (True, wt_params, pp.WT_AXES, True),
            (False, fs_params_2, pp.FS_AXES, False),
        ):
            sub = df[df["windtunnel"] == wt_flag]
            assert len(sub) > 1000  # both sources are present in the CSV
            cols = {k: sub[k].to_numpy() for k in sub.columns}
            pre = pp.invert_finalise(cols)
            if wt_flag:
                pre["Cl"] = pre["Cl"] * 4.0  # main()'s data_wt Cl /= 4
            raw = pp.invert_process(pre, params, fs_params,
                                    body=body, axes=axes)
            fwd = pp.process_sim_dataset(raw, params, fs_params, body=body,
                                         axes=axes, augment=False)
            if wt_flag:
                fwd["Cl"] = fwd["Cl"] / 4.0
            fin = pp.finalise_body_frame(fwd)
            for k in ("alpha", "beta", "aileron", "elevator",
                      "CX", "CY", "CZ", "Cl", "Cm", "Cn"):
                np.testing.assert_allclose(
                    fin[k], sub[k].to_numpy(), atol=1e-12, err_msg=k)
            np.testing.assert_allclose(fin["q"], sub["q"].to_numpy(),
                                       rtol=1e-12)

    def test_symmetry_augment_consistent_with_reference_mirror(self):
        """`process_sim_dataset(augment=True)`'s mirror block negates
        exactly {beta, CY, Cl, Cn, aileron} (reference preprocess.py:238-245)."""
        from aircraft_tpu.surrogates import preprocess as pp

        rng = np.random.default_rng(0)
        n = 16
        raw = {k: rng.normal(1.0, 0.2, n) for k in pp.RAW_COLS}
        raw["vel"] = np.abs(raw["vel"]) + 10.0
        params = {"reference_area": 0.238, "span": 2.0, "chord": 0.1246}
        out = pp.process_sim_dataset(raw, params, params, augment=True)
        a, m = {k: v[:n] for k, v in out.items()}, {k: v[n:] for k, v in out.items()}
        for k in ("beta", "CY", "Cl", "Cn", "aileron"):
            np.testing.assert_allclose(m[k], -a[k])
        for k in ("q", "alpha", "elevator", "CX", "CZ", "Cm"):
            np.testing.assert_allclose(m[k], a[k])
