"""Decompose the regen frame cost (492 ms measured vs ~250 predicted):
time K fixed iterations of the regen body with stages knocked out
(regen._DEBUG), plus the true while_loop iteration count.

Run: python -u examples/regen_decompose.py [--nw 262144] [--k 8]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from gdpathtracing_tpu.config import RenderConfig, Traversal
from gdpathtracing_tpu.render import regen
from gdpathtracing_tpu.scene.demo import build_demo_scene, demo_camera

W, H = 1920, 1080


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nw", type=int, default=262144)
    ap.add_argument("--k", type=int, default=8)
    ap.add_argument("--nee", action="store_true")
    ap.add_argument("--variant", default=None,
                    help="run one variant in this process (compile "
                         "request-size limit): while | all | skip_trace | "
                         "skip_permute | skip_spawn | skip_append | glue")
    args = ap.parse_args()

    scene = build_demo_scene(texture_resolution=64, sphere_detail=16)
    camera = demo_camera(W, H)
    cfg = RenderConfig(bounces=5, traversal=Traversal.PALLAS,
                       nee=args.nee, tile_rays=args.nw)

    floor = []
    noop = jax.jit(lambda c: c + 1.0)
    np.asarray(noop(jnp.float32(0)))
    for _ in range(3):
        t0 = time.time()
        np.asarray(noop(jnp.float32(1)))
        floor.append(time.time() - t0)
    floor = min(floor)

    if args.variant in (None, "while"):
        # True iteration count (while_loop) + one timed frame.
        f = jax.jit(lambda fr: regen.render_radiance_regen(
            scene, camera, cfg, fr, return_stats=True))
        t0 = time.time()
        aovs, stats = f(3)
        iters = int(stats["iters"])
        segs = float(np.asarray(aovs.segments, np.float64).sum())
        print(f"while_loop: {iters} iterations (compile+frame "
              f"{time.time()-t0:.1f}s, segs {segs/1e6:.2f}M)", flush=True)
        t0 = time.time()
        np.asarray(f(5)[0].radiance)
        full_ms = (time.time() - t0 - floor) * 1e3
        print(f"full frame: {full_ms:.1f} ms (floor {floor*1e3:.0f} ms)",
              flush=True)
        if args.variant == "while":
            return

    # Fixed-iteration variants (timing only; wrong results by design).
    variants = {
        "all": {},
        "skip_trace": {"skip_trace": True},
        "skip_permute": {"skip_permute": True},
        "skip_spawn": {"skip_spawn": True},
        "skip_append": {"skip_append": True},
        "glue": {"skip_trace": True, "skip_permute": True,
                 "skip_spawn": True, "skip_append": True},
    }
    sel = ([args.variant] if args.variant else list(variants))
    for name in sel:
        over = variants[name]
        regen._DEBUG.update(dict(skip_permute=False, skip_trace=False,
                                 skip_spawn=False, skip_append=False,
                                 fixed_iters=args.k))
        regen._DEBUG.update(over)
        g = jax.jit(lambda fr: regen.render_radiance_regen(
            scene, camera, cfg, fr).radiance.sum())
        t0 = time.time()
        v = float(np.asarray(g(3)))
        comp = time.time() - t0
        ts = []
        for i in range(4):
            t0 = time.time()
            np.asarray(g(4 + i))
            ts.append(time.time() - t0)
        per = (min(ts) - floor) / args.k * 1e3
        print(f"{name:14s} {per:8.2f} ms/iter  (k={args.k}, compile "
              f"{comp:.0f}s, chk {v:.4g})", flush=True)
    regen._DEBUG.update(dict(skip_permute=False, skip_trace=False,
                             skip_spawn=False, skip_append=False,
                             fixed_iters=None))
    print("done", flush=True)


if __name__ == "__main__":
    main()
