"""aircraft_tpu — a TPU-native MPC / trajectory-optimization framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the reference
CasADi/IPOPT stack (wgrosche/AIrcraft): 6-DoF quaternion rigid-body dynamics
with data-driven aerodynamic coefficient models, direct trajectory
optimization with waypoint complementarity constraints, moving-horizon
tracking control, Dubins-path initialisation, trim/stability analysis and
surrogate-model training — built for batched, sharded execution on TPU
device meshes.

Layer map (bottom-up):
  ops/        pure-JAX quaternion + frame algebra
  dynamics/   plant models as pure functions f(x, u, params) -> xdot
  solvers/    integrators, rollouts, linearisation, trim, AL-iLQR/SQP
  control/    transcription, envelopes, waypoints, moving-horizon drivers
  dubins/     host-side geometric initialisation (numpy)
  surrogates/ aero-coefficient model fitting/training (optax)
  parallel/   mesh + sharding utilities for scale-out
  kernels/    Pallas TPU kernels for the hot paths
  plotting/   host-side visualisation (never on the solve path)
"""

__version__ = "0.1.0"
