from dustraytracer_tpu.accel.bvh import build_bvh, BvhArrays

__all__ = ["build_bvh", "BvhArrays"]
