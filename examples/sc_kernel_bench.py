"""Standalone superchunk-kernel bench: isolates the TRACE cost on the
grid scene from the frame loop (the round-5 telemetry showed ~763k chunk
sweeps ≈ 1.6 s of model cost inside a ~10 s frame — this pins where the
rest goes). Times the rows and lite sc kernels on (a) coherent camera
rays and (b) shuffled (incoherent) rays, with an in-graph scan and a
full-transfer barrier.

    python -u examples/sc_kernel_bench.py [--reps 20] [--nw 524288]
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

import gdpathtracing_tpu.ops.intersect_pallas as ip
from gdpathtracing_tpu.config import RenderConfig, Traversal
from gdpathtracing_tpu.render.types import Ray
from gdpathtracing_tpu.core.vec import Vec3
from gdpathtracing_tpu.core import rng as rngmod
from gdpathtracing_tpu.scene.demo import build_sphere_grid, grid_camera


def time_trace(name, scene, prep, ray, active, reps):
    def run(seed):
        def body(carry, _):
            # Serialize via a carry data-dependency (origin nudged by a
            # value-preserving epsilon) so XLA cannot hoist the trace.
            o = Vec3(ray.o.x + carry * 1e-30, ray.o.y, ray.o.z)
            hit = ip.trace_pallas(scene, Ray(o, ray.d), active, prep=prep)
            return hit.t.sum() * 1e-30, hit.steps.sum()
        chk, steps = jax.lax.scan(body, seed, None, length=reps)
        return chk, steps

    f = jax.jit(run)
    chk, steps = f(jnp.float32(0.0))
    np.asarray(chk)  # warm
    t0 = time.time()
    chk, steps = f(jnp.float32(1.0))
    np.asarray(chk)
    dt = (time.time() - t0) / reps
    n = ray.o.x.shape[0]
    print(f"{name}: {dt*1e3:8.2f} ms/trace  ({dt/n*1e9:6.2f} ns/ray, "
          f"sweeps see telemetry)", flush=True)
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=20)
    ap.add_argument("--nw", type=int, default=524288)
    args = ap.parse_args()

    scene = build_sphere_grid(n=10, sphere_detail=16)
    cam = grid_camera(1920, 1080, n=10)
    cfg = RenderConfig(traversal=Traversal.PALLAS)
    prep = ip.prepare_trace_inputs(scene)
    n = args.nw

    pix = jnp.arange(n, dtype=jnp.int32)
    px = (pix % 1920).astype(jnp.uint32)
    py = (pix // 1920).astype(jnp.uint32)
    seed = rngmod.prng_seed(px, py, jnp.uint32(1))
    ray, _ = cam.generate_rays(pix, seed, cfg)
    act = jnp.ones(n, bool)

    r = np.random.default_rng(0)
    perm = jnp.asarray(r.permutation(n))
    ray_sh = Ray(Vec3(ray.o.x[perm], ray.o.y[perm], ray.o.z[perm]),
                 Vec3(ray.d.x[perm], ray.d.y[perm], ray.d.z[perm]))

    # Fully random rays inside the scene bounds (worst case).
    cb = np.asarray(scene.isect_chunk_bounds)
    lo, hi = cb[0:3].min(axis=1), cb[3:6].max(axis=1)
    o = r.uniform(lo, hi, (n, 3)).astype(np.float32)
    d = r.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    ray_rand = Ray(Vec3(*[jnp.asarray(o[:, k]) for k in range(3)]),
                   Vec3(*[jnp.asarray(d[:, k]) for k in range(3)]))

    # All-miss rays: parked far away pointing away — every superchunk
    # slab fails, so the trace time is PURE per-grid-step machinery.
    far = jnp.full(n, 1e9, jnp.float32)
    s3 = jnp.full(n, 0.5773503, jnp.float32)
    ray_miss = Ray(Vec3(far, far, far), Vec3(s3, s3, s3))

    for lite in (True, False):
        ip._SC_LITE = lite
        tag = "lite" if lite else "rows"
        time_trace(f"[{tag}] camera coherent ", scene, prep, ray, act,
                   args.reps)
        time_trace(f"[{tag}] camera shuffled ", scene, prep, ray_sh, act,
                   args.reps)
        time_trace(f"[{tag}] random rays     ", scene, prep, ray_rand,
                   act, args.reps)
        time_trace(f"[{tag}] all-miss (step cost)", scene, prep,
                   ray_miss, act, args.reps)
    ip._SC_LITE = True

    # SCC sweep (lite kernel, direct call): separates per-STEP cost
    # (grid = blocks x nsc shrinks with bigger SCC) from per-ENTRY cost
    # (the unrolled inner loop grows with SCC).
    import time as _t
    for scc in (4, 6, 8, 12):
        prep_s = ip.prepare_trace_inputs(scene, scc=scc)
        nn = n

        def pack(rr):
            o4t = jnp.stack([rr.o.x, rr.o.y, rr.o.z,
                             jnp.ones(nn, jnp.float32)], axis=0)
            d4t = jnp.stack([rr.d.x, rr.d.y, rr.d.z,
                             jnp.zeros(nn, jnp.float32)], axis=0)
            return o4t, d4t

        for name, rr in (("camera", ray), ("random", ray_rand)):
            o4t, d4t = pack(rr)
            # (guard: nsc must keep the SMEM queue under ~1 MB)

            @jax.jit
            def run(seed, o4t=o4t, d4t=d4t, prep_s=prep_s, scc=scc):
                def body(carry, _):
                    out = ip._closest_hit_sc_lite(
                        o4t + carry * 1e-30, d4t, prep_s.sc_flat,
                        prep_s.chunk_flat, prep_s.m3, scc=scc)
                    return out[0].sum() * 1e-30, None
                chk, _ = jax.lax.scan(body, seed, None, length=args.reps)
                return chk

            np.asarray(run(jnp.float32(0.0)))
            t0 = _t.time()
            np.asarray(run(jnp.float32(1.0)))
            dt = (_t.time() - t0) / args.reps
            print(f"[scc={scc:2d}] {name:7s}: {dt*1e3:8.2f} ms/trace "
                  f"({dt/nn*1e9:6.2f} ns/ray)", flush=True)


if __name__ == "__main__":
    main()
