from gdpathtracing_tpu.bvh.blas import BLASBuilder, BLASArrays
from gdpathtracing_tpu.bvh.tlas import build_tlas, TLASArrays

__all__ = ["BLASBuilder", "BLASArrays", "build_tlas", "TLASArrays"]
