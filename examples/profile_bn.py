"""Is the rows-kernel bound by per-grid-step overhead? Same total work,
bigger ray blocks (BN = 256 / 512 / 1024 / 2048) → fewer grid steps.

Usage: python -u examples/profile_bn.py [--n 2097152] [--iters 20]
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
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from gdpathtracing_tpu.ops import intersect_pallas as ip
    from gdpathtracing_tpu.ops.intersect_pallas import OUT_R, TAB_R, BT
    from gdpathtracing_tpu.scene.demo import build_demo_scene

    scene = build_demo_scene(texture_resolution=64, sphere_detail=16)
    prep = ip.prepare_trace_inputs(scene)
    e = prep.mu.shape[1]
    nc = e // BT
    n = args.n
    print(f"E_pad={e} chunks={nc} n={n}", flush=True)

    rng = np.random.default_rng(0)
    o = rng.uniform(-3, 3, (3, n)).astype(np.float32)
    d = rng.normal(size=(3, n)).astype(np.float32)
    d /= np.linalg.norm(d, axis=0, keepdims=True)
    o4 = jnp.asarray(np.concatenate([o, np.ones((1, n), np.float32)]))
    d4 = jnp.asarray(np.concatenate([d, np.zeros((1, n), np.float32)]))

    # Coherent set too (camera-like: same dir region)
    d2 = rng.normal(size=(3, 1)).astype(np.float32) + \
        0.05 * rng.normal(size=(3, n)).astype(np.float32)
    d2 /= np.linalg.norm(d2, axis=0, keepdims=True)
    o2 = np.zeros((3, n), np.float32) + np.asarray([[0], [1], [9.7]],
                                                   np.float32)
    o4c = jnp.asarray(np.concatenate([o2, np.ones((1, n), np.float32)]))
    d4c = jnp.asarray(np.concatenate([d2, np.zeros((1, n), np.float32)]))

    def run_bn(o4t, d4t, bn):
        grid = (n // bn, nc)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((4, bn), lambda i, j, *_: (0, i)),
                pl.BlockSpec((4, bn), lambda i, j, *_: (0, i)),
                pl.BlockSpec((4, BT), lambda i, j, *_: (0, j)),
                pl.BlockSpec((4, BT), lambda i, j, *_: (0, j)),
                pl.BlockSpec((4, BT), lambda i, j, *_: (0, j)),
                pl.BlockSpec((TAB_R, e), lambda i, j, *_: (0, 0)),
            ],
            out_specs=[pl.BlockSpec((OUT_R, bn), lambda i, j, *_: (0, i))],
        )
        (out,) = pl.pallas_call(
            ip._kernel_rows,
            grid_spec=grid_spec,
            out_shape=[jax.ShapeDtypeStruct((OUT_R, n), jnp.float32)],
        )(prep.chunk_flat, o4t, d4t, prep.mu, prep.mv, prep.mw, prep.tab)
        return out

    def timeit(fn, label):
        @jax.jit
        def run(o4t, d4t):
            def body(c, i):
                o = o4t.at[0, 0].add(c * 1e-30)
                out = fn(o, d4t)
                return out[40, :].min(), None
            c, _ = jax.lax.scan(body, jnp.float32(0.0),
                                jnp.arange(args.iters))
            return c

        for name, (ot, dt_) in (("incoh", (o4, d4)), ("coh", (o4c, d4c))):
            t0 = time.time()
            np.asarray(run(ot, dt_))
            warm = time.time() - t0
            t0 = time.time()
            np.asarray(run(ot, dt_))
            dt = (time.time() - t0) / args.iters
            print(f"{label} {name}: {dt * 1e3:.2f} ms "
                  f"({n / dt / 1e6:.1f} Mrays/s; warm {warm:.0f}s)",
                  flush=True)

    ref = np.asarray(run_bn(o4, d4, 256))
    for bn in (256, 512, 1024, 2048):
        got = np.asarray(run_bn(o4, d4, bn))
        ok = np.array_equal(ref[40:45], got[40:45])
        print(f"BN={bn}: winners match BN=256: {ok}", flush=True)
        timeit(lambda o_, d_, bn=bn: run_bn(o_, d_, bn), f"BN={bn}")


if __name__ == "__main__":
    main()
