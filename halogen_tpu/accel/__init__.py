from halogen_tpu.accel.bvh import BVH, build_bvh, MAX_LEAF_TRIS, MAX_DEPTH

__all__ = ["BVH", "build_bvh", "MAX_LEAF_TRIS", "MAX_DEPTH"]
