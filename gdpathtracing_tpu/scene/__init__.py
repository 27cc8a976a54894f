from gdpathtracing_tpu.scene.scene import Scene, SceneBuilder
from gdpathtracing_tpu.scene.materials import Material
from gdpathtracing_tpu.scene.objloader import load_obj

__all__ = ["Scene", "SceneBuilder", "Material", "load_obj"]
