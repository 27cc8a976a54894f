from gdpathtracing_tpu.parallel.sharding import (make_mesh,
                                                 render_radiance_sharded)

__all__ = ["make_mesh", "render_radiance_sharded"]
