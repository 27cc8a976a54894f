"""Round-5 regen frame decomposition (v4 log retirement era).

Times the 1080p demo regen frame with each _DEBUG stage knockout using
the bench's in-graph-scan + scalar-checksum discipline (results of
knockout runs are WRONG — timing only). fixed_iters pins the iteration
count so liveness interactions don't confound (the round-4 lesson).

    python -u examples/regen_decompose2.py [--frames 6] [--nee]
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from gdpathtracing_tpu.config import RenderConfig, Traversal
# NOTE: `import gdpathtracing_tpu.render.regen as x` trips an importer
# quirk in this environment (a stray top-level 'render' namespace
# package wins the attribute resolution); the from-import form works.
from gdpathtracing_tpu.render import regen as regen_mod
from gdpathtracing_tpu.render.regen import render_radiance_regen
from gdpathtracing_tpu.scene.demo import build_demo_scene, demo_camera


def time_frame(scene, cam, cfg, frames, label):
    @jax.jit
    def run(fs):
        def body(chk, f):
            aovs = render_radiance_regen(scene, cam, cfg, f)
            return chk * 1e-30 + aovs.radiance.sum(), None
        chk, _ = jax.lax.scan(body, jnp.float32(0.0),
                              jnp.asarray(fs, jnp.uint32))
        return chk

    np.asarray(run([0] * frames))
    t0 = time.time()
    np.asarray(run(list(range(1, frames + 1))))
    dt = (time.time() - t0) / frames
    print(f"{label:34s} {dt*1e3:8.1f} ms/frame", flush=True)
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=6)
    ap.add_argument("--nee", action="store_true")
    ap.add_argument("--iters", type=int, default=9,
                    help="fixed_iters for the knockout runs")
    args = ap.parse_args()

    scene = build_demo_scene(texture_resolution=64, sphere_detail=16)
    cam = demo_camera(1920, 1080)
    cfg = RenderConfig(bounces=5, spp=1, traversal=Traversal.PALLAS,
                       nee=args.nee, regen=True)

    import gdpathtracing_tpu.ops.intersect_pallas as ip

    base = dict(regen_mod._DEBUG)
    cases = [
        ("full (log retirement)", dict(), "log", True),
        ("full (scatter retirement)", dict(), "scatter", True),
        ("full, centroid order (no queue)", dict(), "log", False),
        (f"fixed_iters={args.iters}", dict(fixed_iters=args.iters),
         "log", True),
        ("  - retirement (skip_append)",
         dict(fixed_iters=args.iters, skip_append=True), "log", True),
        ("  - permute+sort (skip_permute)",
         dict(fixed_iters=args.iters, skip_permute=True), "log", True),
        ("  - spawn (skip_spawn)",
         dict(fixed_iters=args.iters, skip_spawn=True), "log", True),
        ("  - trace (skip_trace)",
         dict(fixed_iters=args.iters, skip_trace=True), "log", True),
    ]
    for label, over, retire, use_queue in cases:
        regen_mod._DEBUG.update(base)
        regen_mod._DEBUG.update(over)
        ip._USE_QUEUE = use_queue
        try:
            time_frame(scene, cam, cfg.replace(regen_retire=retire),
                       args.frames, label)
        except Exception as e:  # keep the table going
            print(f"{label:34s} FAILED: {type(e).__name__}", flush=True)
    regen_mod._DEBUG.update(base)
    ip._USE_QUEUE = True

    # Wavefront-size sweep on the full config (glue scales per-iteration,
    # trace per-segment — the optimum may have moved since v3).
    for nwi in (262144, 393216, 524288, 786432):
        time_frame(scene, cam,
                   cfg.replace(regen_wavefront=nwi), args.frames,
                   f"full nw={nwi//1024}k")


if __name__ == "__main__":
    main()
