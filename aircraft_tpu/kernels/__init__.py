from aircraft_tpu.kernels.rollout_kernel import make_fused_rollout

__all__ = ["make_fused_rollout"]
