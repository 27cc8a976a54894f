"""Decompose the MEGA-vs-PALLAS 1080p race (round 3).

BENCH_r3 campaign measured MEGA 4.61 Mrays/s vs PALLAS 6.25 on the demo
frame. This script isolates where the 1.36x goes, with honest barriers
(scalar checksum via in-graph lax.scan, serialized by a carry
data-dependency):

  a. one _mega_step (2M coherent primary rays, nee off) per-bounce cost
  b. same with nee on (the fused shadow phase's marginal cost)
  c. wavefront comparison: trace_pallas rows kernel alone on the same rays
  d. full mega frame with compact_rays on vs off (permutation overhead)
  e. full pallas frame (reference point, same process)

All big operands are passed as jit ARGUMENTS (closure constants become HLO
literals and overflow the remote-compile request — HTTP 413).

Usage: nohup python -u examples/profile_mega.py > /tmp/profile_mega.log 2>&1 &
"""

from __future__ import annotations

import functools
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from gdpathtracing_tpu.config import RenderConfig, Traversal, Jitter
from gdpathtracing_tpu.core import rng
from gdpathtracing_tpu.ops.intersect_pallas import prepare_trace_inputs
from gdpathtracing_tpu.ops import megakernel as mk
from gdpathtracing_tpu.render.renderer import render_radiance
from gdpathtracing_tpu.render.types import Ray
from gdpathtracing_tpu.scene.demo import build_demo_scene, demo_camera

W, H = 1920, 1080
ITERS = 20


def bench(run, label, *args, iters=ITERS):
    t0 = time.time()
    np.asarray(run(*args))
    print(f"{label}: compile+warm {time.time() - t0:.1f}s", flush=True)
    t0 = time.time()
    np.asarray(run(*args))
    dt = (time.time() - t0) / iters
    print(f"{label}: {dt * 1e3:.2f} ms/iter", flush=True)
    return dt


def main():
    scene = build_demo_scene(texture_resolution=64, sphere_detail=16)
    camera = demo_camera(W, H)
    n = 1 << 21  # 2M rays
    cfg = RenderConfig(bounces=5, spp=1, traversal=Traversal.MEGA,
                       jitter=Jitter.UNIFORM)
    nc = scene.isect_mu.shape[1] // 256

    @jax.jit
    def make_states(scene, camera):
        pids = jnp.arange(n, dtype=jnp.int32) % (W * H)
        px = (pids % W).astype(jnp.uint32)
        py = (pids // W).astype(jnp.uint32)
        seed = rng.prng_seed(px, py, jnp.uint32(0))
        ray, seed0 = camera.generate_rays(pids, seed, cfg)
        fstate = jnp.zeros((mk.FS_R, n), jnp.float32)
        fstate = fstate.at[0, :].set(ray.o.x).at[1, :].set(ray.o.y) \
            .at[2, :].set(ray.o.z).at[3, :].set(ray.d.x) \
            .at[4, :].set(ray.d.y).at[5, :].set(ray.d.z)
        for r in (6, 7, 8, 12):
            fstate = fstate.at[r, :].set(jnp.ones(n, jnp.float32))
        istate = jnp.zeros((mk.IS_R, n), jnp.int32)
        istate = istate.at[0, :].set(
            jax.lax.bitcast_convert_type(seed0[0], jnp.int32))
        istate = istate.at[1, :].set(
            jax.lax.bitcast_convert_type(seed0[1], jnp.int32))
        return fstate, istate, ray.o.to_array(), ray.d.to_array()

    fstate0, istate0, ro, rd = make_states(scene, camera)
    prep = prepare_trace_inputs(scene)

    # ---- a/b: single mega bounce over 2M rays, serialized scan ----
    def mega_step_scan(nee: bool):
        c = cfg.replace(nee=nee)
        n_lights = scene.n_lights if nee else 0

        @jax.jit
        def run(chunk_flat, fstate, istate, mu, mv, mw, tab, lt):
            meta = jnp.array([0], jnp.int32)

            def body(carry, _):
                fs, isv = carry
                fs2, is2 = mk._mega_step(chunk_flat, meta, fs, isv,
                                         mu, mv, mw, tab, lt, c, nc,
                                         n_lights, False)
                fs2 = fs2.at[12, :].set(fstate[12, :])
                fs2 = fs2.at[0:6, :].set(fstate[0:6, :])
                return (fs2, is2), None
            (fs, isv), _ = jax.lax.scan(body, (fstate, istate),
                                        None, length=ITERS)
            return fs[9, :].sum() + isv[3, :].sum().astype(jnp.float32)
        return run

    lt0 = jnp.zeros((mk.LT_R, 128), jnp.float32)
    lt1 = mk._build_light_block(scene)
    bench(mega_step_scan(False), f"a. mega bounce 2M rays nee=off (nc={nc})",
          prep.chunk_flat, fstate0, istate0, prep.mu, prep.mv, prep.mw,
          prep.tab, lt0)
    bench(mega_step_scan(True), "b. mega bounce 2M rays nee=on",
          prep.chunk_flat, fstate0, istate0, prep.mu, prep.mv, prep.mw,
          prep.tab, lt1)

    # ---- c: rows kernel alone on the same rays ----
    from gdpathtracing_tpu.core.vec import Vec3
    from gdpathtracing_tpu.ops.intersect_pallas import trace_pallas

    @jax.jit
    def run_rows(scene, ro, rd):
        def body(carry, _):
            o = Vec3(carry, ro[1], ro[2])
            hit = trace_pallas(scene, Ray(o, Vec3(rd[0], rd[1], rd[2])))
            return carry + hit.t * 1e-30, None
        out, _ = jax.lax.scan(body, ro[0], None, length=ITERS)
        return out.sum()
    bench(run_rows, "c. rows closest-hit kernel 2M rays", scene, ro, rd)

    # ---- d/e: full frames ----
    def frame(c):
        @jax.jit
        def run(scene, camera):
            def body(chk, f):
                aovs = render_radiance(scene, camera, c, f)
                return chk * 1e-30 + aovs.radiance.sum(), None
            chk, _ = jax.lax.scan(body, jnp.float32(0.0),
                                  jnp.arange(8, dtype=jnp.uint32))
            return chk
        return run

    bench(frame(cfg.replace(compact_rays=True)),
          "d1. mega frame compact=on", scene, camera, iters=8)
    bench(frame(cfg.replace(compact_rays=False)),
          "d2. mega frame compact=off", scene, camera, iters=8)
    bench(frame(cfg.replace(traversal=Traversal.PALLAS)),
          "e. pallas frame", scene, camera, iters=8)

    # ---- f/g: wavefront NEE cost split (occlusion kernel vs glue) ----
    from gdpathtracing_tpu.ops.intersect_pallas import occluded_pallas

    @jax.jit
    def run_occl(scene, ro, rd):
        tmax = jnp.full((n,), 3.0, jnp.float32)

        def body(carry, _):
            o = Vec3(carry, ro[1], ro[2])
            occ = occluded_pallas(scene, Ray(o, Vec3(rd[0], rd[1], rd[2])),
                                  tmax)
            return carry + occ.astype(jnp.float32) * 1e-30, None
        out, _ = jax.lax.scan(body, ro[0], None, length=ITERS)
        return out.sum()
    bench(run_occl, "f. occlusion any-hit kernel 2M rays", scene, ro, rd)

    bench(frame(cfg.replace(traversal=Traversal.PALLAS, nee=True)),
          "g. pallas frame nee=on", scene, camera, iters=8)
    bench(frame(cfg.replace(nee=True, compact_rays=True)),
          "h. mega frame nee=on compact=on", scene, camera, iters=8)


if __name__ == "__main__":
    main()
