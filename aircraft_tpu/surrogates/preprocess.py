"""Wind-tunnel / CFD aero-data preprocessing.

The role of the reference's preprocessing pipeline (reference
main/surrogates/preprocess.py:1-77, which documents the conventions): bring
raw coefficient tables into the body-frame sign conventions the dynamics
expect, augment by lateral symmetry, and optionally rescale dynamic
pressure between Reynolds conditions.

Conventions produced (matching dynamics/aircraft.py):
  inputs  [qbar, alpha, beta, aileron, elevator]
  outputs [CX, CY, CZ, Cl, Cm, Cn]  — FRD body frame, CX forward-positive
          (drag shows as negative CX), CZ down-positive (lift negative).
"""

from __future__ import annotations

from typing import Optional

import numpy as np

INPUT_COLS = ["q", "alpha", "beta", "aileron", "elevator"]
OUTPUT_COLS = ["CX", "CY", "CZ", "Cl", "Cm", "Cn"]


def wind_to_body(
    CD: np.ndarray, CY_w: np.ndarray, CL: np.ndarray,
    alpha: np.ndarray, beta: np.ndarray,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Wind-frame (drag, side, lift) -> body-frame (CX, CY, CZ).

    Standard stability-axes rotation: the reference documents the resulting
    sign conventions in preprocess.py's header block.
    """
    ca, sa = np.cos(alpha), np.sin(alpha)
    cb, sb = np.cos(beta), np.sin(beta)
    CX = -cb * ca * CD - sb * ca * CY_w + sa * CL
    CY = -sb * CD + cb * CY_w
    CZ = -cb * sa * CD - sb * sa * CY_w - ca * CL
    return CX, CY, CZ


def symmetry_augment(x: np.ndarray, y: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Lateral mirror augmentation: a symmetric airframe's response at
    (β, δa) mirrors at (−β, −δa) with (CY, Cl, Cn) negated
    (reference preprocess.py symmetry block)."""
    x2 = x.copy()
    x2[:, 2] *= -1.0  # beta
    x2[:, 3] *= -1.0  # aileron
    y2 = y.copy()
    y2[:, 1] *= -1.0  # CY
    y2[:, 3] *= -1.0  # Cl
    y2[:, 5] *= -1.0  # Cn
    return np.concatenate([x, x2], axis=0), np.concatenate([y, y2], axis=0)


def reynolds_rescale(qbar: np.ndarray, from_speed: float, to_speed: float) -> np.ndarray:
    """Rescale dynamic pressure between reference airspeeds (coefficients
    are ~Re-invariant over the glider's envelope; qbar carries the speed)."""
    return qbar * (to_speed / from_speed) ** 2


def clean(x: np.ndarray, y: np.ndarray,
          alpha_range=(-0.6, 0.6), beta_range=(-0.6, 0.6),
          coeff_limit: float = 10.0) -> tuple[np.ndarray, np.ndarray]:
    """Drop non-finite rows, out-of-envelope angles, and absurd coefficient
    magnitudes (sensor/CFD spikes)."""
    m = np.all(np.isfinite(x), axis=1) & np.all(np.isfinite(y), axis=1)
    m &= (x[:, 1] >= alpha_range[0]) & (x[:, 1] <= alpha_range[1])
    m &= (x[:, 2] >= beta_range[0]) & (x[:, 2] <= beta_range[1])
    m &= np.all(np.abs(y) < coeff_limit, axis=1)
    return x[m], y[m]


def preprocess_dataframe(df, *, augment: bool = True):
    """Full pipeline on a reference-format dataframe -> (x, y)."""
    x = df[INPUT_COLS].to_numpy(dtype=np.float32)
    y = df[OUTPUT_COLS].to_numpy(dtype=np.float32)
    x, y = clean(x, y)
    if augment:
        x, y = symmetry_augment(x, y)
    return x, y
