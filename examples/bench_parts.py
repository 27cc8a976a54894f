"""Component timing: where does a 1080p PALLAS frame actually go?

Times, in one process, with the in-graph-scan discipline from CLAUDE.md
(serialize iterations via a carry data-dependency; barrier = full
np.asarray transfer):

  1. rows kernel alone — coherent camera rays
  2. rows kernel alone — shuffled (incoherent) rays, worst-case culling
  3. full path_trace at bounces = 1, 2, 5 (marginal cost per bounce)

Usage: python -u examples/bench_parts.py [--n 2097152] [--iters 20]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=2097152)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--height", type=int, default=1080)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from gdpathtracing_tpu.config import RenderConfig, Traversal
    from gdpathtracing_tpu.ops import intersect_pallas as ip
    from gdpathtracing_tpu.render.renderer import render_radiance
    from gdpathtracing_tpu.scene.demo import build_demo_scene, demo_camera

    scene = build_demo_scene(texture_resolution=64, sphere_detail=16)
    camera = demo_camera(args.width, args.height)
    prep = ip.prepare_trace_inputs(scene)
    print(f"E_pad={prep.mu.shape[1]} chunks={prep.mu.shape[1] // ip.BT} "
          f"superchunks={prep.superchunks}", flush=True)

    n = args.n
    # Coherent: camera rays for the first n pixels.
    cfg = RenderConfig(traversal=Traversal.PALLAS)
    from gdpathtracing_tpu.core import rng as rng_mod
    pids = jnp.arange(n, dtype=jnp.int32) % (args.width * args.height)
    px = (pids % args.width).astype(jnp.uint32)
    py = (pids // args.width).astype(jnp.uint32)
    seed = rng_mod.prng_seed(px, py, jnp.uint32(0))
    ray, _ = camera.generate_rays(pids, seed, cfg)

    def pack(r):
        o4 = jnp.stack([r.o.x, r.o.y, r.o.z, jnp.ones_like(r.o.x)])
        d4 = jnp.stack([r.d.x, r.d.y, r.d.z, jnp.zeros_like(r.d.x)])
        return o4, d4

    o4c, d4c = pack(ray)

    # Incoherent: same origins, directions shuffled + random flips —
    # neighboring lanes point anywhere (post-diffuse-bounce worst case).
    k = jax.random.PRNGKey(0)
    perm = jax.random.permutation(k, n)
    sgn = jax.random.choice(jax.random.PRNGKey(1), jnp.asarray([-1.0, 1.0]),
                            (3, n))
    d4i = d4c[:, perm].at[0:3, :].mul(sgn)
    # Spread origins through the box interior too.
    o4i = o4c.at[0, :].add(jax.random.uniform(jax.random.PRNGKey(2), (n,),
                                              minval=-2.5, maxval=2.5))

    def time_kernel(o4, d4, label):
        @jax.jit
        def run(o4, d4):
            def body(c, i):
                o = o4.at[0, 0].add(c * 1e-30 + i * 0.0)
                rows = ip._closest_hit_rows(o, d4, prep.chunk_flat,
                                            prep.mu, prep.mv, prep.mw,
                                            prep.tab)
                return rows[40, :].min(), None
            c, _ = jax.lax.scan(body, jnp.float32(0.0),
                                jnp.arange(args.iters))
            return c

        t0 = time.time()
        np.asarray(run(o4, d4))
        print(f"{label}: compile+warm {time.time() - t0:.1f}s", flush=True)
        t0 = time.time()
        np.asarray(run(o4, d4))
        dt = (time.time() - t0) / args.iters
        print(f"{label}: {dt * 1e3:.2f} ms per {n} rays "
              f"({n / dt / 1e6:.1f} Mrays/s)", flush=True)

    time_kernel(o4c, d4c, "rows kernel, coherent")
    time_kernel(o4i, d4i, "rows kernel, incoherent")

    # Full path_trace marginal bounce cost (frame-scan amortized, 3 frames).
    for bounces in (1, 2, 5):
        config = RenderConfig(bounces=bounces, spp=1,
                              traversal=Traversal.PALLAS)

        @jax.jit
        def run(s, c, frames, config=config):
            def body(carry, f):
                aovs = render_radiance(s, c, config, f)
                return (aovs.radiance, aovs.segments), ()
            (rad, segs), _ = jax.lax.scan(
                body, (jnp.zeros((c.height, c.width, 3), jnp.float32),
                       jnp.zeros((c.height, c.width), jnp.int32)),
                jnp.asarray(frames, jnp.uint32))
            return rad, segs

        t0 = time.time()
        rad, segs = run(scene, camera, [0, 1, 2])
        np.asarray(rad)
        print(f"bounces={bounces}: compile+warm {time.time() - t0:.1f}s",
              flush=True)
        t0 = time.time()
        rad, segs = run(scene, camera, [3, 4, 5])
        np.asarray(rad)
        dt = (time.time() - t0) / 3
        segsum = float(np.asarray(segs, np.float64).sum())
        print(f"bounces={bounces}: {dt * 1e3:.1f} ms/frame, "
              f"{segsum / 1e6:.2f} M segments, "
              f"{segsum / dt / 1e6:.2f} Mrays/s", flush=True)


if __name__ == "__main__":
    main()
