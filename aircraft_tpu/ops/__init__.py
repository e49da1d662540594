from aircraft_tpu.ops import quaternion

__all__ = ["quaternion"]
