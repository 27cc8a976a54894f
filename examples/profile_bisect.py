"""Bisect the frame regression: time render_radiance variants on TPU."""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from gdpathtracing_tpu.config import RenderConfig, Traversal
from gdpathtracing_tpu.render.renderer import render_radiance
from gdpathtracing_tpu.scene.demo import build_demo_scene, demo_camera

W, H = 1920, 1080


def timeit(name, fn, *args, iters=3):
    t0 = time.time()
    v = float(np.asarray(fn(*args)))
    comp = time.time() - t0
    ts = []
    for _ in range(iters):
        t0 = time.time()
        np.asarray(fn(*args))
        ts.append(time.time() - t0)
    print(f"{name:44s} min {min(ts)*1e3:9.1f} ms (compile {comp:6.1f}s, "
          f"chk {v:.6g})", flush=True)


def main():
    print("devices:", jax.devices(), flush=True)
    scene = build_demo_scene(texture_resolution=64, sphere_detail=16)
    camera = demo_camera(W, H)

    for name, bounces in (("1 bounce", 1), ("2 bounces", 2),
                          ("5 bounces", 5)):
        cfg = RenderConfig(bounces=bounces, spp=1,
                           traversal=Traversal.PALLAS)

        @jax.jit
        def frame_sum(s, c, f, cfg=cfg):
            aovs = render_radiance(s, c, cfg, f)
            return aovs.radiance.sum() + aovs.segments.sum()

        timeit(f"frame pallas {name}", frame_sum, scene, camera, 1)

    print("done", flush=True)


if __name__ == "__main__":
    main()
