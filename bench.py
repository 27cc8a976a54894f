"""Benchmark: Mrays/s/chip, 1 spp @ 1080p on the demo scene (BASELINE.md
north-star metric). Prints ONE JSON line.

The default run (no args) measures ALL four north-star axes — primal,
NEE, backward, and the incoherent grid scene — each in its own
subprocess (one fresh-compile program group per process; and a crash or
timeout on one axis cannot take down the others). The primary `value`
is the primal number (round-over-round comparable with BENCH_r01-r03);
the other axes land in `extra` so the driver's BENCH_r{N}.json history
finally tracks every target (VERDICT r3 item 7), not just the best one.

"Rays" = ray-trace queries actually issued (path segments), counted exactly
by the integrator's `segments` AOV — not the optimistic W*H*bounces.
vs_baseline is 1.0: the reference publishes no numbers (BASELINE.md), so
this benchmark IS the baseline series.
"""

from __future__ import annotations

import argparse
import json
import subprocess
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

# Speed-of-light denominator (VERDICT r4 item 6): the measured coherent
# per-segment kernel rate is ~7 ns/segment — one 256-tri chunk sweep per
# 256-ray block at ~1.8 us/sweep, which is within ~2x of the
# first-principles VPU bound for the ~12-op intersection epilogue on a
# (256, 768) tile (see docs/STATUS.md "Speed of light"). That makes the
# per-chip ceiling ~143 Msegments/s; every axis reports
# sol_fraction = (segments x 7 ns) / wall-clock as % of that ceiling.
SOL_NS_PER_SEGMENT = 7.0

AXES = {
    # axis -> (extra argv, timeout_s). Frame counts keep the cached-compile
    # wall-clock of the full default run under ~10 min; uncached worst case
    # is bounded by the per-axis timeouts.
    "primal": ([], 2400),
    "nee": (["--nee", "--frames", "4"], 2400),
    "backward": (["--backward", "--frames", "3"], 3000),
    "grid": (["--scene", "grid", "--frames", "3"], 2400),
}


def run_all_axes(verbose: bool) -> None:
    """Default mode: measure every axis in a subprocess, emit ONE line."""
    results: dict[str, dict | None] = {}
    for axis, (argv, tmo) in AXES.items():
        cmd = [sys.executable, "-u", __file__, "--only", axis] + argv
        if verbose:
            print(f"[bench] {axis}: {' '.join(cmd)}", file=sys.stderr,
                  flush=True)
        t0 = time.time()
        try:
            out = subprocess.run(cmd, capture_output=True, text=True,
                                 timeout=tmo)
            line = out.stdout.strip().splitlines()[-1]
            results[axis] = json.loads(line)
        except Exception as e:  # timeout, crash, parse failure
            results[axis] = None
            if verbose:
                print(f"[bench] {axis} FAILED: {e}", file=sys.stderr)
        if verbose:
            print(f"[bench] {axis}: {results[axis]} "
                  f"({time.time() - t0:.0f}s)", file=sys.stderr, flush=True)
    # Guarded aggregation: a malformed axis line (missing "value" /
    # "ms_per_frame") degrades to null instead of killing the whole run —
    # the crash-isolation goal of the per-axis subprocesses.
    extra = {}
    for k, r in results.items():
        if k != "primal":
            extra[f"{k}_mrays"] = r.get("value") if r else None
        if r and r.get("ms_per_frame") is not None:
            extra[f"{k}_ms"] = r["ms_per_frame"]
    nee_ms = (results.get("nee") or {}).get("ms_per_frame")
    primal_ms = (results.get("primal") or {}).get("ms_per_frame")
    if nee_ms and primal_ms:
        # Wall-clock ratio of the NEE frame vs the primal frame — the
        # <=1.3x target (VERDICT r3 item 3).
        extra["nee_over_primal_time"] = round(nee_ms / primal_ms, 3)
    for k, r in results.items():
        if r and r.get("sol_fraction") is not None:
            extra[f"{k}_sol_fraction"] = r["sol_fraction"]
    primal = results.get("primal")
    print(json.dumps({
        "metric": "Mrays/s/chip primal 1spp 1920x1080 pallas demo",
        "value": primal.get("value") if primal else None,
        "unit": "Mrays/s",
        "vs_baseline": 1.0,
        "extra": extra,
    }))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", default=None,
                    choices=["primal", "nee", "backward", "grid"],
                    help="measure a single axis in-process (the no-arg "
                         "default orchestrates all four in subprocesses)")
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--bounces", type=int, default=5)
    ap.add_argument("--spp", type=int, default=1)
    ap.add_argument("--traversal", default=None,
                    help="pallas|mega|unit|brute|bvh (default pallas — the "
                         "wavefront rows kernel, 6.25 Mrays/s at 1080p; mega "
                         "measured 4.61, the XLA paths ~0.34)")
    ap.add_argument("--frames", type=int, default=10)
    ap.add_argument("--nee", action="store_true",
                    help="next-event estimation + MIS (shadow rays counted "
                         "as segments)")
    ap.add_argument("--tile-rays", type=int, default=None,
                    help="override config.tile_rays (rays per traced tile)")
    ap.add_argument("--sort", action="store_true",
                    help="force per-bounce ray sorting (parks dead rays in "
                         "tail blocks that skip every chunk sweep; auto-on "
                         "only for >16-chunk scenes otherwise)")
    ap.add_argument("--no-sort", action="store_true",
                    help="force per-bounce ray sorting OFF (overrides the "
                         ">16-chunk auto heuristic — for the sorting "
                         "decision table)")
    ap.add_argument("--compact", action="store_true",
                    help="force survivor stream compaction on (cumsum "
                         "partition, no argsort; wavefront-PALLAS needs "
                         "--no-sort too since sort subsumes it)")
    ap.add_argument("--no-compact", action="store_true",
                    help="force stream compaction OFF (MEGA auto-enables "
                         "it for >=4-block wavefronts otherwise)")
    ap.add_argument("--sort-key", default=None,
                    choices=["morton", "chunk"],
                    help="regen lane-sort key (config.regen_sort_key): "
                         "morton = origin-cell x octant; chunk = first "
                         "chunk/superchunk entered x octant")
    ap.add_argument("--regen", action="store_true",
                    help="path-regeneration frame loop (persistent "
                         "always-full wavefront, render/regen.py)")
    ap.add_argument("--no-regen", action="store_true",
                    help="force the standard per-bounce loop")
    ap.add_argument("--scene", default="demo",
                    choices=["demo", "mid", "grid"],
                    help="demo = reference Cornell scene (~1.5k tris); "
                         "mid = 16-instance sphere grid (~9k tris, ~35 "
                         "chunks — pins the sort-heuristic boundary); "
                         "grid = 100-instance sphere grid (~100k tris)")
    ap.add_argument("--backward", action="store_true",
                    help="measure the BACKWARD pass (BASELINE.md 'primal & "
                         "backward'): value_and_grad of an image MSE w.r.t. "
                         "the material albedo table through the "
                         "differentiable PALLAS path; Mrays/s counts the "
                         "forward segments once (the backward recompute is "
                         "the price of the gradient, not extra rays)")
    ap.add_argument("--unfused-nee", action="store_true",
                    help="A/B hook: separate occlusion dispatch per "
                         "iteration instead of the fused phase-B kernel "
                         "(no pendings state)")
    ap.add_argument("--march", action="store_true",
                    help="force the frontier-march traversal on")
    ap.add_argument("--no-march", action="store_true",
                    help="force the frontier-march traversal off")
    ap.add_argument("--march-ql", type=int, default=None,
                    help="march queue slots per block (regen_march_ql)")
    ap.add_argument("--drain-nw", type=int, default=None,
                    help="first drain-stage wavefront "
                         "(regen_drain_wavefront; default nw//3)")
    ap.add_argument("--scc", type=int, default=None,
                    help="override chunks-per-superchunk for the two-level "
                         "kernel (sweeps; default ops.intersect_pallas.SCC)")
    ap.add_argument("--verbose", action="store_true")
    args = ap.parse_args()

    if args.scc:
        import gdpathtracing_tpu.ops.intersect_pallas as _ip
        _ip.SCC = args.scc
    if args.unfused_nee:
        # NOTE: the `import a.b.c as x` form trips the stray 'render'
        # namespace-package importer quirk — use from-import.
        from gdpathtracing_tpu.render import integrator as _integ
        _integ._FORCE_UNFUSED_NEE = True

    if args.only is None and set(sys.argv[1:]) <= {"--verbose"}:
        run_all_axes(args.verbose)
        return

    import jax
    import numpy as np

    from gdpathtracing_tpu.config import RenderConfig, Traversal
    from gdpathtracing_tpu.render.renderer import render_radiance
    from gdpathtracing_tpu.scene.demo import (build_demo_scene, demo_camera,
                                              build_sphere_grid, grid_camera)

    traversal = Traversal(args.traversal) if args.traversal else Traversal.PALLAS

    if args.scene == "grid":
        scene = build_sphere_grid(n=10, sphere_detail=16)
        camera = grid_camera(args.width, args.height, n=10)
    elif args.scene == "mid":
        scene = build_sphere_grid(n=4, sphere_detail=12)
        camera = grid_camera(args.width, args.height, n=4)
    else:
        scene = build_demo_scene(texture_resolution=64, sphere_detail=16)
        camera = demo_camera(args.width, args.height)
    config = RenderConfig(bounces=args.bounces, spp=args.spp,
                          traversal=traversal, nee=args.nee)
    if args.tile_rays:
        config = config.replace(tile_rays=args.tile_rays,
                                regen_wavefront=args.tile_rays)
    if args.sort:
        config = config.replace(sort_rays=True)
    if args.no_sort:
        config = config.replace(sort_rays=False)
    if args.compact:
        config = config.replace(compact_rays=True)
    if args.no_compact:
        config = config.replace(compact_rays=False)
    if args.sort_key:
        config = config.replace(regen_sort_key=args.sort_key)
    if args.march:
        config = config.replace(regen_march=True)
    if args.no_march:
        config = config.replace(regen_march=False)
    if args.march_ql is not None:
        config = config.replace(regen_march_ql=args.march_ql)
    if args.drain_nw is not None:
        config = config.replace(regen_drain_wavefront=args.drain_nw)
    if args.regen:
        config = config.replace(regen=True)
    if args.no_regen:
        config = config.replace(regen=False)

    # All frames run inside ONE jitted program (lax.scan): per-dispatch
    # tunnel latency (~25 ms floor, ~300 ms for multi-output pytrees on
    # this runtime) never pollutes the compute measurement. The timed
    # program returns a SCALAR checksum of each frame's radiance: the
    # barrier is still a real device→host transfer (block_until_ready can
    # return early on this runtime) but NOT a 24 MB image pull over the
    # tunnel, which measured ~+250 ms spread over the timed frames and was
    # round 1's "scan carry overhead". The warmup run does transfer and
    # finite-check the full image.
    #
    # Exception: the grid scene times a per-frame host loop — its frames
    # are seconds (floor error <3%), and the frame-scan + superchunk
    # kernel combination at 1080p crashes the TPU worker (runtime bug
    # instance 4, docs/RUNTIME_BUG.md).
    import jax.numpy as jnp

    if args.scene in ("grid", "mid"):  # superchunk scenes: host loop
        step = jax.jit(lambda s, c, f:
                       render_radiance(s, c, config, f))
        if args.verbose:
            print("compiling (grid, host-loop timing)...", file=sys.stderr)
        t0 = time.time()
        aovs = step(scene, camera, 0)
        rad_np = np.asarray(aovs.radiance)
        assert np.isfinite(rad_np).all()
        if args.verbose:
            print(f"compile+first frame: {time.time() - t0:.1f}s",
                  file=sys.stderr)
        # Segment count is measured on frame 0 and assumed representative
        # of the timed frames (per-frame variation is ~1% — paths differ
        # only by RNG); the median frame time keeps one slow outlier from
        # skewing the quotient.
        segments = float(np.asarray(aovs.segments, np.float64).sum())
        dts = []
        for f in range(1, args.frames + 1):
            t0 = time.time()
            np.asarray(step(scene, camera, f).radiance)
            dts.append(time.time() - t0)
        dt = sorted(dts)[len(dts) // 2]
        if args.verbose:
            print(f"{dt*1e3:.1f} ms/frame ({segments/1e6:.2f} M segments)",
                  file=sys.stderr)
        print(json.dumps({
            "metric": f"Mrays/s/chip primal {args.spp}spp "
                      f"{args.width}x{args.height} {traversal.value} "
                      f"{args.scene}",
            "value": round(segments / dt / 1e6, 3),
            "unit": "Mrays/s",
            "vs_baseline": 1.0,
            "ms_per_frame": round(dt * 1e3, 1),
            "sol_fraction": round(segments * SOL_NS_PER_SEGMENT * 1e-9
                                  / dt, 4),
        }))
        return

    if args.backward:
        from gdpathtracing_tpu.diff.inverse import image_mse, replace_albedo
        config = config.replace(differentiable=True)
        target = jnp.zeros((args.height, args.width, 3), jnp.float32)

        @jax.jit
        def run_bwd(s, c, frames):
            def loss_fn(albedo, f):
                aovs = render_radiance(replace_albedo(s, albedo), c,
                                       config, f)
                return image_mse(aovs.radiance, target), aovs.segments

            def body(carry, f):
                g, _ = carry
                # Serialize iterations: albedo depends on the previous
                # gradient (real optimizer shape; nothing hoistable —
                # 1e-30 scale keeps the value bit-stable without letting
                # XLA fold the dependency away).
                albedo = s.mat_albedo - 1e-30 * g
                (loss, segs), grad = jax.value_and_grad(
                    loss_fn, has_aux=True)(albedo, f)
                return (grad, segs), loss
            (g, segs), losses = jax.lax.scan(
                body, (jnp.zeros_like(s.mat_albedo),
                       jnp.zeros((c.height, c.width), jnp.int32)),
                jnp.asarray(frames, jnp.uint32))
            return g, segs, losses

        if args.verbose:
            print(f"compiling backward ({traversal.value}, "
                  f"{args.width}x{args.height}, {args.bounces} bounces)...",
                  file=sys.stderr)
        t0 = time.time()
        g, segs, losses = run_bwd(scene, camera, [0] * args.frames)
        g_np = np.asarray(g)
        assert np.isfinite(g_np).all() and np.abs(g_np).max() > 0.0
        if args.verbose:
            print(f"compile+warmup ({args.frames} frames): "
                  f"{time.time() - t0:.1f}s", file=sys.stderr)
        segments = float(np.asarray(segs, dtype=np.float64).sum())
        t0 = time.time()
        g, _, _ = run_bwd(scene, camera, list(range(1, args.frames + 1)))
        np.asarray(g)
        dt = time.time() - t0
        if args.verbose:
            print(f"{dt / args.frames * 1e3:.1f} ms/frame fwd+bwd "
                  f"({segments / 1e6:.2f} M segments)", file=sys.stderr)
        print(json.dumps({
            "metric": f"Mrays/s/chip backward {args.spp}spp "
                      f"{args.width}x{args.height} {traversal.value} "
                      f"{args.scene}",
            "value": round(segments * args.frames / dt / 1e6, 3),
            "unit": "Mrays/s",
            "vs_baseline": 1.0,
            "ms_per_frame": round(dt / args.frames * 1e3, 1),
            "sol_fraction": round(segments * SOL_NS_PER_SEGMENT * 1e-9
                                  * args.frames / dt, 4),
        }))
        return

    @jax.jit
    def run_full(s, c, frames):
        """Warmup/validation variant: returns the full image + segments."""
        def body(carry, f):
            aovs = render_radiance(s, c, config, f)
            return (aovs.radiance, aovs.segments), ()
        (rad, segs), _ = jax.lax.scan(
            body, (jnp.zeros((c.height, c.width, 3), jnp.float32),
                   jnp.zeros((c.height, c.width), jnp.int32)),
            jnp.asarray(frames, jnp.uint32))
        return rad, segs

    @jax.jit
    def run(s, c, frames):
        """Timed variant: every frame does full work; only a scalar
        checksum leaves the device."""
        def body(chk, f):
            aovs = render_radiance(s, c, config, f)
            return chk * 1e-30 + aovs.radiance.sum(), None
        chk, _ = jax.lax.scan(body, jnp.float32(0.0),
                              jnp.asarray(frames, jnp.uint32))
        return chk

    if args.verbose:
        print(f"compiling ({traversal.value}, {args.width}x{args.height}, "
              f"{args.bounces} bounces)...", file=sys.stderr)
    t0 = time.time()
    rad, segs = run_full(scene, camera, [0] * args.frames)
    rad_np = np.asarray(rad)
    assert np.isfinite(rad_np).all()
    segments = float(np.asarray(segs, dtype=np.float64).sum())
    np.asarray(run(scene, camera, [0] * args.frames))  # compile timed form
    if args.verbose:
        print(f"compile+warmup ({args.frames} frames): "
              f"{time.time() - t0:.1f}s", file=sys.stderr)

    t0 = time.time()
    chk = run(scene, camera, list(range(1, args.frames + 1)))
    assert np.isfinite(np.asarray(chk))
    dt = time.time() - t0
    if args.verbose:
        print(f"{dt / args.frames * 1e3:.1f} ms/frame "
              f"({segments/1e6:.2f} M segments)", file=sys.stderr)

    rays_per_s = segments * args.frames / dt
    mrays = rays_per_s / 1e6
    kind = "nee" if args.nee else "primal"
    print(json.dumps({
        "metric": f"Mrays/s/chip {kind} {args.spp}spp "
                  f"{args.width}x{args.height} {traversal.value} "
                  f"{args.scene}",
        "value": round(mrays, 3),
        "unit": "Mrays/s",
        "vs_baseline": 1.0,
        "ms_per_frame": round(dt / args.frames * 1e3, 1),
        "sol_fraction": round(rays_per_s * SOL_NS_PER_SEGMENT * 1e-9, 4),
    }))


if __name__ == "__main__":
    main()
