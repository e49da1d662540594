"""Regenerate the aero-surrogate artifacts from wind-tunnel/CFD data.

The reference ships fitted artifacts (data/networks/{model-dynamics.pth,
fitted_models_casadi.pkl, linearised.csv}) produced by its main/surrogates/
scripts; this script produces our equivalents from the same CSV schema
(SURVEY §2.6):

  data/networks/linearised.csv   affine model (same CSV layout as reference)
  data/networks/poly.npz         degree-3 polynomial model params
  data/networks/mlp.npz          trained ScaledModel-architecture surrogate

Usage:
  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python examples/fit_surrogates.py \
      [--data /root/reference/data/processed/data_sim.csv]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--data", default="/root/reference/data/processed/data_sim.csv"
    )
    ap.add_argument("--out", default="data/networks")
    ap.add_argument("--epochs", type=int, default=150)
    args = ap.parse_args()

    from aircraft_tpu.surrogates import (
        fit_linear,
        fit_polynomial,
        load_aero_csv,
        save_mlp,
        train_mlp,
    )

    x, y = load_aero_csv(args.data)
    print(f"loaded {x.shape[0]} samples from {args.data}")
    os.makedirs(args.out, exist_ok=True)

    lin = fit_linear(x, y)
    M = np.asarray(lin.matrix)
    header = "q,alpha,beta,aileron,elevator,intercept"
    np.savetxt(
        os.path.join(args.out, "linearised.csv"), M, delimiter=",",
        header=header, comments="",
    )
    pred = np.concatenate([x, np.ones((x.shape[0], 1), np.float32)], 1) @ M.T
    print(f"linear:  rmse per coeff {np.sqrt(((pred - y) ** 2).mean(0)).round(4)}")

    poly = fit_polynomial(x, y, degree=3, span=2.0)
    from aircraft_tpu.dynamics.coefficients import _poly_eval
    import jax.numpy as jnp

    pred = np.asarray(_poly_eval(poly, jnp.asarray(x)))
    print(f"poly:    rmse per coeff {np.sqrt(((pred - y) ** 2).mean(0)).round(4)}")
    np.savez(
        os.path.join(args.out, "poly.npz"),
        weights=np.asarray(poly.weights),
        intercept=np.asarray(poly.intercept),
        input_scale=np.asarray(poly.input_scale),
        span_over_4=poly.span_over_4,
    )

    result = train_mlp(x, y, epochs=args.epochs, patience=12)
    print(f"mlp:     train {result.train_loss:.4f} val {result.val_loss:.4f} "
          f"({result.epochs_run} epochs)")
    save_mlp(os.path.join(args.out, "mlp.npz"), result.params)
    print(f"artifacts written to {args.out}/")


if __name__ == "__main__":
    main()
