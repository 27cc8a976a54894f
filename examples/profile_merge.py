"""A/B the sweep-step formulation on incoherent rays (the cost driver):

  A. current: 6 separate K=4 matmuls (o,d × mu,mv,mw) + per-chunk fetch
  B. merged: [mu|mv|mw] packed per chunk → 2 K=4 matmuls of 3x width
  C/D. A/B without the winner-row fetch (isolates the fetch share)

Usage: python -u examples/profile_merge.py [--n 2097152] [--iters 20]
"""

from __future__ import annotations

import argparse
import functools
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
    from gdpathtracing_tpu.ops.intersect_pallas import (BN, BT, OUT_R, TAB_R,
                                                        _MISS, _mm, _rcp,
                                                        _slab)
    from gdpathtracing_tpu.scene.demo import build_demo_scene

    scene = build_demo_scene(texture_resolution=64, sphere_detail=16)
    prep = ip.prepare_trace_inputs(scene)
    e = prep.mu.shape[1]
    nc = e // BT
    print(f"E_pad={e} chunks={nc}", flush=True)

    # Packed [mu|mv|mw] per chunk: (4, 3E), chunk j at cols [3*BT*j, ...).
    muvw = jnp.concatenate([
        prep.mu.reshape(4, nc, 1, BT),
        prep.mv.reshape(4, nc, 1, BT),
        prep.mw.reshape(4, nc, 1, BT)], axis=2).reshape(4, 3 * e)

    n = args.n
    rng = np.random.default_rng(0)
    o = rng.uniform(-3, 3, (3, n)).astype(np.float32)
    d = rng.normal(size=(3, n)).astype(np.float32)
    d /= np.linalg.norm(d, axis=0, keepdims=True)
    o4 = jnp.asarray(np.concatenate([o, np.ones((1, n), np.float32)]))
    d4 = jnp.asarray(np.concatenate([d, np.zeros((1, n), np.float32)]))

    # ---- variant kernels ----
    def sweep_merged(out_ref, o4, d4, m, tab_chunk, global_base, fetch):
        cur = out_ref[40, :]
        bt = m.shape[1] // 3
        mo = _mm(o4, m)   # (BN, 3BT) — ONE matmul for u_o|v_o|w_o
        md = _mm(d4, m)
        u_o, v_o, w_o = mo[:, :bt], mo[:, bt:2 * bt], mo[:, 2 * bt:]
        u_d, v_d, w_d = md[:, :bt], md[:, bt:2 * bt], md[:, 2 * bt:]
        wd_ok = jnp.abs(w_d) > 1e-12
        inv_wd = jnp.where(wd_ok, w_d, 1.0)
        t = -w_o / inv_wd
        u = u_o + t * u_d
        v = v_o + t * v_d
        valid = wd_ok & (t > 0.0) & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
        t = jnp.where(valid, t, _MISS)
        tk = jnp.min(t, axis=1)
        k = jnp.argmin(t, axis=1).astype(jnp.int32)
        better = tk < cur
        bf = better.astype(jnp.float32)
        bn_, bt_ = t.shape
        onehot = (jax.lax.broadcasted_iota(jnp.int32, (bn_, bt_), 1)
                  == k[:, None]).astype(jnp.float32) * bf[:, None]
        u_w = jnp.sum(u * onehot, axis=1)
        v_w = jnp.sum(v * onehot, axis=1)
        wd_w = jnp.sum(w_d * onehot, axis=1)
        if fetch:
            rows = jax.lax.dot_general(
                tab_chunk, onehot, (((1,), (1,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32)
            old = out_ref[0:TAB_R, :]
            out_ref[0:TAB_R, :] = old + (rows - old) * bf[None, :]
        out_ref[40, :] = jnp.where(better, tk, cur)
        out_ref[41, :] = jnp.where(better, u_w, out_ref[41, :])
        out_ref[42, :] = jnp.where(better, v_w, out_ref[42, :])
        out_ref[43, :] = jnp.where(better, wd_w, out_ref[43, :])
        out_ref[44, :] = jnp.where(
            better, (global_base + k).astype(jnp.float32), out_ref[44, :])

    def make_kernel_merged(fetch):
        def kern(chunk_ref, o4_ref, d4_ref, m_ref, tab_ref, out_ref):
            j = pl.program_id(1)

            @pl.when(j == 0)
            def _():
                out_ref[:, :] = jnp.zeros((OUT_R, out_ref.shape[1]),
                                          jnp.float32)
                out_ref[40, :] = jnp.full((out_ref.shape[1],), _MISS,
                                          jnp.float32)
            o4 = o4_ref[...]
            d4 = d4_ref[...]
            cur = out_ref[40, :]
            ox, oy, oz = o4[0, :], o4[1, :], o4[2, :]
            dx, dy, dz = d4[0, :], d4[1, :], d4[2, :]
            tmin, tmax = _slab(chunk_ref, j * 8, ox, oy, oz,
                               _rcp(dx), _rcp(dy), _rcp(dz))
            may_hit = (tmax >= tmin) & (tmax > 0.0) & (tmin < cur)

            @pl.when(jnp.any(may_hit))
            def _():
                bt = BT
                out_ref[45, :] = out_ref[45, :] + jnp.where(
                    may_hit, float(bt), 0.0)
                sweep_merged(out_ref, o4, d4, m_ref[...],
                             tab_ref[:, pl.ds(j * bt, bt)], j * bt, fetch)
        return kern

    def run_merged(o4t, d4t, fetch):
        grid = (n // BN, nc)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((4, BN), lambda i, j, *_: (0, i)),
                pl.BlockSpec((4, BN), lambda i, j, *_: (0, i)),
                pl.BlockSpec((4, 3 * BT), lambda i, j, *_: (0, j)),
                pl.BlockSpec((TAB_R, e), lambda i, j, *_: (0, 0)),
            ],
            out_specs=[pl.BlockSpec((OUT_R, BN), lambda i, j, *_: (0, i))],
        )
        (out,) = pl.pallas_call(
            make_kernel_merged(fetch),
            grid_spec=grid_spec,
            out_shape=[jax.ShapeDtypeStruct((OUT_R, n), jnp.float32)],
        )(prep.chunk_flat, o4t, d4t, muvw, prep.tab)
        return out

    # Original kernel without fetch: reuse module helpers via a variant.
    def make_kernel_orig_nofetch():
        def kern(chunk_ref, o4_ref, d4_ref, mu_ref, mv_ref, mw_ref, tab_ref,
                 out_ref):
            j = pl.program_id(1)

            @pl.when(j == 0)
            def _():
                out_ref[:, :] = jnp.zeros((OUT_R, out_ref.shape[1]),
                                          jnp.float32)
                out_ref[40, :] = jnp.full((out_ref.shape[1],), _MISS,
                                          jnp.float32)
            o4 = o4_ref[...]
            d4 = d4_ref[...]
            cur = out_ref[40, :]
            ox, oy, oz = o4[0, :], o4[1, :], o4[2, :]
            dx, dy, dz = d4[0, :], d4[1, :], d4[2, :]
            tmin, tmax = _slab(chunk_ref, j * 8, ox, oy, oz,
                               _rcp(dx), _rcp(dy), _rcp(dz))
            may_hit = (tmax >= tmin) & (tmax > 0.0) & (tmin < cur)

            @pl.when(jnp.any(may_hit))
            def _():
                mu, mv, mw = mu_ref[...], mv_ref[...], mw_ref[...]
                u_o, v_o, w_o = _mm(o4, mu), _mm(o4, mv), _mm(o4, mw)
                u_d, v_d, w_d = _mm(d4, mu), _mm(d4, mv), _mm(d4, mw)
                wd_ok = jnp.abs(w_d) > 1e-12
                inv_wd = jnp.where(wd_ok, w_d, 1.0)
                t = -w_o / inv_wd
                u = u_o + t * u_d
                v = v_o + t * v_d
                valid = (wd_ok & (t > 0.0) & (u >= 0.0) & (v >= 0.0)
                         & (u + v <= 1.0))
                t = jnp.where(valid, t, _MISS)
                tk = jnp.min(t, axis=1)
                k = jnp.argmin(t, axis=1).astype(jnp.int32)
                better = tk < cur
                out_ref[40, :] = jnp.where(better, tk, cur)
                out_ref[44, :] = jnp.where(
                    better, (j * BT + k).astype(jnp.float32), out_ref[44, :])
        return kern

    def run_orig_nofetch(o4t, d4t):
        grid = (n // BN, nc)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((4, BN), lambda i, j, *_: (0, i)),
                pl.BlockSpec((4, BN), lambda i, j, *_: (0, i)),
                pl.BlockSpec((4, BT), lambda i, j, *_: (0, j)),
                pl.BlockSpec((4, BT), lambda i, j, *_: (0, j)),
                pl.BlockSpec((4, BT), lambda i, j, *_: (0, j)),
                pl.BlockSpec((TAB_R, e), lambda i, j, *_: (0, 0)),
            ],
            out_specs=[pl.BlockSpec((OUT_R, BN), lambda i, j, *_: (0, i))],
        )
        (out,) = pl.pallas_call(
            make_kernel_orig_nofetch(),
            grid_spec=grid_spec,
            out_shape=[jax.ShapeDtypeStruct((OUT_R, n), jnp.float32)],
        )(prep.chunk_flat, o4t, d4t, prep.mu, prep.mv, prep.mw, prep.tab)
        return out

    def timeit(fn, label, check=None):
        @jax.jit
        def run():
            def body(c, i):
                o = o4.at[0, 0].add(c * 1e-30)
                out = fn(o, d4)
                return out[40, :].min(), None
            c, _ = jax.lax.scan(body, jnp.float32(0.0),
                                jnp.arange(args.iters))
            return c

        t0 = time.time()
        np.asarray(run())
        print(f"{label}: compile+warm {time.time() - t0:.1f}s", flush=True)
        t0 = time.time()
        np.asarray(run())
        dt = (time.time() - t0) / args.iters
        print(f"{label}: {dt * 1e3:.2f} ms ({n / dt / 1e6:.1f} Mrays/s)",
              flush=True)

    def run_orig(o4t, d4t):
        return ip._closest_hit_rows(o4t, d4t, prep.chunk_flat, prep.mu,
                                    prep.mv, prep.mw, prep.tab)

    # Correctness first: merged must match original exactly.
    a = np.asarray(run_orig(o4, d4))
    b = np.asarray(run_merged(o4, d4, True))
    print("merged == orig:", np.array_equal(a, b),
          float(np.abs(a - b).max()), flush=True)

    timeit(run_orig, "A. original (6 matmuls + fetch)")
    timeit(lambda o, d: run_merged(o, d, True), "B. merged (2 matmuls + fetch)")
    timeit(run_orig_nofetch, "C. original, no fetch")
    timeit(lambda o, d: run_merged(o, d, False), "D. merged, no fetch")


if __name__ == "__main__":
    main()
