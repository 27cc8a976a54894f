"""Small repro hunt for the superchunk-kernel worker crash: low-res grid
frames, then kernel with parked/incoherent rays."""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from gdpathtracing_tpu.config import RenderConfig, Traversal
from gdpathtracing_tpu.render.renderer import render_radiance
from gdpathtracing_tpu.scene.demo import build_sphere_grid, grid_camera


def main():
    print("devices:", jax.devices(), flush=True)
    scene = build_sphere_grid(n=10, sphere_detail=16)

    for res, bounces in ((128, 1), (128, 2), (128, 5), (512, 5)):
        camera = grid_camera(res, res, n=10)
        cfg = RenderConfig(bounces=bounces, spp=1,
                           traversal=Traversal.PALLAS)

        @jax.jit
        def frame(s, c, f, cfg=cfg):
            aovs = render_radiance(s, c, cfg, f)
            return aovs.radiance.sum()

        t0 = time.time()
        v = float(np.asarray(frame(scene, camera, 0)))
        print(f"grid frame {res}x{res} {bounces}b OK "
              f"({time.time()-t0:.1f}s, chk {v:.6g})", flush=True)

    # kernel with parked + incoherent rays
    from gdpathtracing_tpu.ops.intersect_pallas import (
        prepare_trace_inputs, trace_pallas)
    from gdpathtracing_tpu.core.vec import Vec3
    from gdpathtracing_tpu.render.types import Ray

    prep = jax.jit(prepare_trace_inputs)(scene)
    rng_np = np.random.default_rng(0)
    n = 262144
    o = rng_np.uniform(-12, 12, (3, n)).astype(np.float32)
    d = rng_np.normal(size=(3, n)).astype(np.float32)
    d /= np.linalg.norm(d, axis=0, keepdims=True)
    active = jnp.asarray(rng_np.uniform(size=n) < 0.3)
    ray = Ray(Vec3(*(jnp.asarray(a) for a in o)),
              Vec3(*(jnp.asarray(a) for a in d)))

    @jax.jit
    def tr(r, a):
        h = trace_pallas(scene, r, a, prep=prep)
        return h.t.sum()

    t0 = time.time()
    v = float(np.asarray(tr(ray, active)))
    print(f"kernel parked/incoherent OK ({time.time()-t0:.1f}s, "
          f"chk {v:.6g})", flush=True)
    print("done", flush=True)


if __name__ == "__main__":
    main()
