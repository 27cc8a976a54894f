"""March diagnostics: iteration count + occupancy on the grid scene.

    python -u examples/march_diag.py [--ql 2] [--nw 393216] [--res 1920x1080]
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
from gdpathtracing_tpu.render.regen import render_radiance_regen
from gdpathtracing_tpu.scene.demo import build_sphere_grid, grid_camera


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ql", type=int, default=2)
    ap.add_argument("--nw", type=int, default=393216)
    ap.add_argument("--n", type=int, default=10)
    ap.add_argument("--res", default="1920x1080")
    ap.add_argument("--bounces", type=int, default=5)
    ap.add_argument("--no-march", action="store_true")
    args = ap.parse_args()
    w, h = map(int, args.res.split("x"))

    scene = build_sphere_grid(n=args.n)
    cam = grid_camera(w, h, n=args.n)
    cfg = RenderConfig(bounces=args.bounces, spp=1,
                       traversal=Traversal.PALLAS, regen=True,
                       regen_wavefront=args.nw,
                       regen_march=(False if args.no_march else True),
                       regen_march_ql=args.ql)

    @jax.jit
    def run(f):
        aovs, st = render_radiance_regen(scene, cam, cfg, f,
                                         return_stats=True)
        return (aovs.radiance.sum(), st["iters"], st["it_alive"],
                st["it_sweeps_a"])

    t0 = time.time()
    chk, iters, alive, sweeps = run(jnp.uint32(0))
    chk = float(np.asarray(chk))
    print(f"compile+first: {time.time()-t0:.1f}s chk={chk:.4g}", flush=True)
    t0 = time.time()
    chk, iters, alive, sweeps = jax.tree.map(np.asarray, run(jnp.uint32(1)))
    dt = time.time() - t0
    it = int(iters)
    nw = args.nw
    occ = alive[:it].astype(np.float64) / nw
    print(f"frame: {dt*1e3:.1f} ms  iters={it}  "
          f"mean_occ={occ.mean():.3f}", flush=True)
    print("occ per iter:", " ".join(f"{o:.2f}" for o in occ[:64]),
          flush=True)
    print("sweeps per iter:", " ".join(f"{s:.0f}" for s in sweeps[:it][:64]),
          flush=True)


if __name__ == "__main__":
    main()
