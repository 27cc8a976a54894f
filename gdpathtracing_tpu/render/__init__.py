from gdpathtracing_tpu.render.camera import Camera
from gdpathtracing_tpu.render.types import Ray, HitInfo, ShadingInfo

__all__ = ["Camera", "Ray", "HitInfo", "ShadingInfo"]
