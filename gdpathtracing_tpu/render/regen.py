"""Path-regeneration integrator: a persistent, always-full wavefront.

Round-3 diagnosis (docs/STATUS.md campaign A): the per-bounce cost of the
standard wavefront is FLAT ~100 ms regardless of live-ray count, because
ray death is spatially scattered — nearly every 256-lane block keeps at
least one live ray, so it sweeps every chunk while its dead lanes do
nothing. Group compaction and sorting cannot fix that (group granularity
is the gather-wall floor; per-ray XLA reorder costs ~830 ms/bounce).

Regeneration attacks the waste at the source: instead of letting lanes
idle, every dead lane is immediately REFILLED with the next unstarted
path (camera ray) from the frame's pool. The wavefront stays ~100% live
for the whole frame, so the sweep cost finally tracks the real segment
count. This is the TPU analog of persistent-threads path regeneration
(Aila/Laine-style GPU wavefront schedulers); the reference's SIMT kernel
gets the same effect for free from early thread exit + new dispatches per
frame (main.glsl:372-436).

Why no gathers: a fresh camera ray is pure arithmetic of its path id
(pixel = id % n_pix, sample = id // n_pix, RNG seed = hash(px, py,
frame·spp + sample)) — dead lanes compute their replacement in place.

Retirement designs, in the order they were built and measured: (1)
masked ROW scatters into (n_paths, k) buffers: ~60 ns/row. (2) a
ROW-major append log: (N, 10) pads its minor dim to 128 lanes (~1 GB).
(3) per-COLUMN scalar scatters into 1-D (n_paths,) buffers (~0.66 ms
per 256k indices; `regen_retire="scatter"`). (4) the COLUMN-major
contiguous log — the 3-way lane sort (live < freshly-dead < stale)
makes each iteration's retirements one contiguous block, appended with
ONE dynamic_update_slice into a (LOG_R, n_paths+nw) column-major log;
one transpose + one 8-wide row gather at frame end lands everything
pid-indexed. (4) is the default (`regen_retire="log"`), removing
~190 ms/frame of scatters vs (3) at 1080p.

Round-5b additions: ONE merged int32 permute gather per column group
(row-gather cost is per-row per-gather; f32 bitcast to i32 — the int
datapath is immune to the TPU denormal flush); UNFUSED NEE by default
(a separate in-graph occlusion dispatch beats the fused phase-B design
once host-loop dispatch overhead stopped existing); a two-stage DRAIN
(the frame tail is straggler-bound — the sorted live prefix moves to
smaller while_loops); and an optional frontier-MARCH traversal for
superchunk scenes (built, bit-exact, measured slower than the one-shot
culled sweep at every tried scale — see config.regen_march).

Transport: per-path RNG streams and per-segment math are exactly the
standard integrator's (render/integrator.py body), so each path's
radiance matches path_trace bit-for-bit up to visit-order tie-breaks in
the traversal (block composition differs, so `_block_chunk_order` may
visit chunks in a different order; exact-t ties are measure-zero).
Oracle test: tests/test_regen.py compares against path_trace.

Limits: primal only (lax.while_loop is not reverse-differentiable).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from gdpathtracing_tpu.config import RenderConfig, Traversal
from gdpathtracing_tpu.core import rng
from gdpathtracing_tpu.core.vec import Vec3, reflect, where as vwhere
from gdpathtracing_tpu.render import brdf
from gdpathtracing_tpu.render.camera import Camera
from gdpathtracing_tpu.render.integrator import get_trace_fn
from gdpathtracing_tpu.render.shading import get_shading_data
from gdpathtracing_tpu.render.sky import sample_sky
from gdpathtracing_tpu.render.types import Ray
from gdpathtracing_tpu.scene.scene import Scene

OUT_COLS = 9  # r g b | depth | nx ny nz | steps | segments — one 1-D
#               (n_paths,) output buffer per column (pid-indexed)

# Perf-decomposition knobs (examples/regen_decompose.py): skip_* disables
# a loop stage (results become WRONG — timing only); fixed_iters replaces
# the while_loop with a lax.scan of that length. All default-off.
_DEBUG = dict(skip_permute=False, skip_trace=False, skip_spawn=False,
              skip_append=False, fixed_iters=None)


def regen_supported(scene: Scene, config: RenderConfig) -> bool:
    """Gate for the regeneration frame loop (renderer auto path)."""
    return (config.traversal in (Traversal.PALLAS, Traversal.UNIT,
                                 Traversal.BRUTE)
            and not config.differentiable
            and config.soft_shadows == 0.0
            and config.soft_primary == 0.0)


def regen_auto(scene: Scene, config: RenderConfig) -> bool:
    """config.regen=None policy: with the column-scatter retirement
    (v3), regeneration beats the standard loop on BOTH measured scales —
    demo 409 vs 430 ms, grid 0.407-0.420 vs 0.301 Mrays/s
    (tpu_campaign_r4.log) — so every PALLAS render takes it. NEE too:
    fused-NEE regen (deferred rows + column-scatter retirement) measured
    753 vs 891 ms standard (campaign J [nee-regen3])."""
    return (config.traversal == Traversal.PALLAS
            and regen_supported(scene, config))


def render_radiance_regen(scene: Scene, camera: Camera,
                          config: RenderConfig, frame_index=0,
                          return_stats: bool = False):
    """Full-frame trace with path regeneration. Returns FrameAOVs
    (same contract as renderer.render_radiance); with ``return_stats``,
    (FrameAOVs, {"iters", "lane_slots"}) for perf diagnostics."""
    from gdpathtracing_tpu.render.renderer import FrameAOVs

    w, h = camera.width, camera.height
    n_pix = w * h
    n_paths = n_pix * config.spp
    nw = min(config.regen_wavefront, -(-n_paths // 256) * 256)
    frame_index = jnp.asarray(frame_index, dtype=jnp.uint32)
    f32 = jnp.float32

    trace_fn = get_trace_fn(config, scene)
    fast_shading = config.traversal in (Traversal.UNIT, Traversal.PALLAS)
    use_nee = config.nee and scene.n_lights > 0
    if use_nee:
        from gdpathtracing_tpu.render import lights as lights_mod
        light_table = lights_mod.build_light_table(scene)

    # Deferred-shadow NEE fusion, regeneration-style: bounce i's shadow
    # occlusion rides bounce i+1's fused kernel dispatch (phase B), as in
    # the standard integrator's fuse_nee. Because the lane may have been
    # REGENERATED between posting the query and resolving it, each pending
    # carries its owning path id: if the lane still owns the path the
    # resolved direct term adds to lane radiance (same accumulation order
    # as integrator.py's fused path); otherwise it scatter-adds straight
    # into the finished path's output pixel (its final radiance term, the
    # analog of the standard path's post-loop flush).
    # Round-5b measurement: in-graph the separate occlusion dispatch is
    # CHEAPER than the fused phase-B design end-to-end (455.6 vs
    # 498.7 ms demo NEE, campaign r5m) — the fusion's motivation was
    # round-3 host-loop dispatch overhead, while its pendings double the
    # permuted state and defer retirement. Default is therefore
    # UNFUSED; the fused path stays available (regen_fuse_nee=True) and
    # bit-tested.
    from gdpathtracing_tpu.render.integrator import _FORCE_UNFUSED_NEE
    fuse_nee = (use_nee and config.traversal == Traversal.PALLAS
                and bool(config.regen_fuse_nee)
                and not _FORCE_UNFUSED_NEE)
    if fuse_nee:
        from gdpathtracing_tpu.ops.intersect_pallas import (
            prepare_trace_inputs, trace_occlude_pallas)
        nee_prep = prepare_trace_inputs(scene)
        if nee_prep.superchunks:  # flat-grid fused kernel only
            fuse_nee = False

    # Frontier-march traversal (round 5b) for superchunk scenes: the
    # one-shot sc kernel sweeps O(all superchunks) per incoherent block;
    # marching advances each ray ONE superchunk per iteration with lanes
    # re-sorted by their next superchunk, so blocks sweep only what
    # their rays want. See ops/intersect_pallas.py march_* docs.
    use_march = False
    if (config.traversal == Traversal.PALLAS and not fuse_nee
            and not dict(_DEBUG)["skip_trace"]):
        from gdpathtracing_tpu.ops import intersect_pallas as _ip
        m_prep = _ip.prepare_trace_inputs(scene)
        m_ok = _ip.march_supported(scene, m_prep)
        # Default OFF (round-5b measurement): the one-shot culled sweep
        # + sorted lanes + drain beat every march variant end-to-end
        # (grid 4463 vs 5391-6796 ms; mid 1885 vs 3774 — campaigns
        # r5l-r5o). March's per-iteration glue (permute, scan, queue,
        # shading epilogue over the full wavefront) exceeds what exact
        # frontier sweeps save when culled one-shot steps cost ~0.8 µs.
        # Kept as an option: it is the right shape if per-step cost ever
        # dominates (much larger scenes, streamed m3).
        use_march = (config.regen_march is True) and m_ok
    if use_march:
        from gdpathtracing_tpu.render.types import MISS_T as _MISS_T
        QL = int(config.regen_march_ql)
        MK = int(config.regen_march_k)
        nsc_total = m_prep.sc_flat.shape[0] // 8
        BIG_E = jnp.int32((1 << 24) - 1)  # "no winner" eidx: exact in
        #                                   f32 and > any real eidx
        NEG_INF = jnp.float32(-jnp.inf)

    def spawn(path_id):
        """Camera ray + RNG stream of path `path_id` — identical to the
        renderer's per-tile spawn (pixel-major within each spp sample)."""
        pix = path_id % n_pix
        s = (path_id // n_pix).astype(jnp.uint32)
        px = (pix % w).astype(jnp.uint32)
        py = (pix // w).astype(jnp.uint32)
        seed = rng.prng_seed(px, py,
                             frame_index * jnp.uint32(config.spp) + s)
        ray, seed = camera.generate_rays(pix, seed, config)
        return ray, seed

    lane0 = jnp.arange(nw, dtype=jnp.int32)
    ray0, seed0 = spawn(lane0)
    zero = jnp.zeros(nw, f32)
    zero3 = Vec3(zero, zero, zero)
    one3 = Vec3(zero + 1.0, zero + 1.0, zero + 1.0)

    # (Flags used by the init below — full rationale at their docs.)
    dbg = dict(_DEBUG)
    compact_lanes = (config.compact_rays is not False
                     and not dbg["skip_permute"])
    # Retirement log (regen v4): the permutation groups freshly dead
    # lanes contiguously, so retirement is ONE dynamic_update_slice of
    # their packed columns into a (LOG_R, n_paths+nw) column-major log
    # per iteration (bandwidth rate) instead of 9-10 full-wavefront
    # scalar scatters (which the round-5 telemetry showed were ~60% of
    # the frame). One transpose + split row-gathers at frame end land
    # everything pid-indexed. See config.regen_retire.
    use_log = (config.regen_retire == "log" and compact_lanes
               and not dbg["skip_append"]
               and n_paths < (1 << 24)  # pid rides the log as exact f32
               and 2 * config.bounces + 1 < 32)  # segs fits the pack
    LOG_R = 9  # r g b depth nx ny nz pack(steps*32+segs) pid — steps
    #           and segs share one f32-exact column (steps clamped to
    #           2^19-1 so the pack stays < 2^24) to keep the DATA rows
    #           at 8: the final pid-indexing is then ONE 8-wide row
    #           gather (micro5: the 8/2 split cost 31.9 ms/frame at
    #           2.07M, the 2-wide half being pure per-row issue cost).
    log_len = n_paths + nw

    init = dict(
        next_path=jnp.int32(min(nw, n_paths)),
        nact=jnp.int32(min(nw, n_paths)),
        iters=jnp.int32(0),
        ray_o=ray0.o, ray_d=ray0.d, seed=seed0,
        tp=one3, rad=zero3,
        pid=lane0, bounce=jnp.zeros(nw, jnp.int32),
        active=lane0 < n_paths,
        prev_pdf=zero - 1.0,
        depth1=zero + f32(camera.far), normal1=zero3,
        steps=jnp.zeros(nw, jnp.int32), segs=jnp.zeros(nw, jnp.int32),
    )
    if use_log:
        init.update(log=jnp.zeros((LOG_R, log_len), f32),
                    retired=jnp.int32(0), dstart=jnp.int32(0))
    else:
        init.update(out=tuple(jnp.zeros(n_paths, f32)
                              for _ in range(OUT_COLS)))
    if use_march:
        # all derive from sharded inits (vma typing under shard_map)
        mt0 = zero + NEG_INF
        ms0 = lane0 * 0 - 1
        bt0 = zero + f32(_MISS_T)
        be0 = lane0 * 0 + BIG_E
        es0, ss0 = _ip.march_next_candidates(
            m_prep, ray0.o, ray0.d, init["active"], mt0, ms0, bt0, k=MK)
        q0, _ = _ip.march_block_queue(ss0, nsc_total, QL)
        init.update(m_t=mt0, m_sc=ms0, b_t=bt0, b_e=be0, queue=q0,
                    **{f"nc_e{i}": es0[i] for i in range(MK)},
                    **{f"nc_s{i}": ss0[i] for i in range(MK)})

    # Perf telemetry (return_stats): per-iteration live-lane count and
    # taken block-sweep totals from the kernel's row-46/47 counters —
    # the block-composition evidence VERDICT r4 asked for.
    MAX_IT = 96
    if return_stats:
        init.update(it_alive=jnp.zeros(MAX_IT, jnp.int32),
                    it_sweeps_a=jnp.zeros(MAX_IT, f32),
                    it_sweeps_b=jnp.zeros(MAX_IT, f32))
    if fuse_nee:
        # Deferred retirement: a path that dies with a pending shadow
        # parks its finished row in p_row for ONE iteration so the
        # resolved direct term joins it before it is logged.
        init.update(p_sh_o=zero3, p_sh_d=zero3, p_sh_tmax=zero,
                    p_sh_active=jnp.zeros(nw, bool), p_pend=zero3,
                    p_pid=lane0 * 0,
                    p_vals=tuple(jnp.zeros(nw, f32)
                                 for _ in range(OUT_COLS)),
                    p_row_active=jnp.zeros(nw, bool))

    # Tail-coherent spawning: permute the lane state survivors-first each
    # iteration (packed-row gathers — ~5 ns/row, unlike the per-element
    # gathers that made per-ray reordering look impossible in round 3),
    # so freshly spawned camera paths fill CONTIGUOUS tail lanes. Fresh
    # blocks then trace at the coherent-camera rate (~7 ns/segment)
    # instead of being scattered into incoherent mixed blocks
    # (~38 ns/segment) — and camera segments are ~74% of the frame.
    #
    # The permutation key upgrades from survivors-first to
    # Morton-cell-of-origin × direction-octant (dead last) — the
    # integrator's per-bounce sort, but on an ALWAYS-DENSE wavefront,
    # which is the best case for per-block chunk culling. Unlike the
    # standard loop (where sorting only pays on >128-chunk scenes, since
    # it reorders a mostly-dead wavefront), regen sorting wins on EVERY
    # measured scale: demo 1080p 312 vs 352 ms at nw=524k, grid 0.42 vs
    # 0.20 Mrays/s (tpu_campaign_r4.log) — so it is the PALLAS default.
    sort_lanes = config.sort_rays
    if sort_lanes is None:
        sort_lanes = config.traversal == Traversal.PALLAS
    sort_lanes = bool(sort_lanes) and compact_lanes
    if sort_lanes:
        cb = scene.isect_chunk_bounds
        cell_lo = cb[0:3].min(axis=1)
        cell_span = jnp.maximum(cb[3:6].max(axis=1) - cell_lo, 1e-6)
    use_chunk_key = config.regen_sort_key == "chunk"
    if use_chunk_key:
        key_cb = scene.isect_chunk_bounds
        nc_key = int(key_cb.shape[1])
        if nc_key > 64:
            # Big scenes: key on SUPERCHUNK bounds (the sc kernel's
            # outer unit of work — and an affordable per-ray slab count:
            # nc unrolled slabs per lane per iteration would be ~4
            # GFlop/iter on the grid scene).
            from gdpathtracing_tpu.ops.intersect_pallas import SCC
            pad = (-nc_key) % SCC
            cbp = jnp.pad(key_cb, ((0, 0), (0, pad)),
                          constant_values=1e30)
            nsc_key = cbp.shape[1] // SCC
            lo = cbp[0:3].reshape(3, nsc_key, SCC).min(axis=2)
            hi = jnp.where(
                cbp[3:6].reshape(3, nsc_key, SCC) > 1e29, -1e30,
                cbp[3:6].reshape(3, nsc_key, SCC)).max(axis=2)
            key_cb = jnp.concatenate(
                [lo, hi, jnp.zeros((2, nsc_key), jnp.float32)], axis=0)
            nc_key = nsc_key

    def first_chunk_key(o, d, alive, fresh):
        """Id of the first chunk (superchunk on big scenes) the ray
        would ENTER (min positive slab tmin over passing boxes) —
        aligns lane blocks with the kernel's actual unit of work so a
        block's rays want the SAME sweeps, not just nearby origins.
        Octant minor; misses/dead last."""
        cb = key_cb
        rdx = 1.0 / jnp.where(jnp.abs(d.x) < 1e-30, 1e-30, d.x)
        rdy = 1.0 / jnp.where(jnp.abs(d.y) < 1e-30, 1e-30, d.y)
        rdz = 1.0 / jnp.where(jnp.abs(d.z) < 1e-30, 1e-30, d.z)
        best_t = jnp.full_like(o.x, jnp.inf)
        best_c = jnp.zeros_like(o.x, dtype=jnp.int32) + nc_key
        for ci in range(nc_key):
            tx1 = (cb[0, ci] - o.x) * rdx
            tx2 = (cb[3, ci] - o.x) * rdx
            ty1 = (cb[1, ci] - o.y) * rdy
            ty2 = (cb[4, ci] - o.y) * rdy
            tz1 = (cb[2, ci] - o.z) * rdz
            tz2 = (cb[5, ci] - o.z) * rdz
            tmin = jnp.maximum(jnp.maximum(jnp.minimum(tx1, tx2),
                                           jnp.minimum(ty1, ty2)),
                               jnp.minimum(tz1, tz2))
            tmax = jnp.minimum(jnp.minimum(jnp.maximum(tx1, tx2),
                                           jnp.maximum(ty1, ty2)),
                               jnp.maximum(tz1, tz2))
            entry = jnp.maximum(tmin, 0.0)
            ok = (tmax >= tmin) & (tmax > 0.0) & (entry < best_t)
            best_t = jnp.where(ok, entry, best_t)
            best_c = jnp.where(ok, ci, best_c)
        octant = ((d.x > 0.0).astype(jnp.int32) * 4
                  + (d.y > 0.0).astype(jnp.int32) * 2
                  + (d.z > 0.0).astype(jnp.int32))
        return jnp.where(alive, best_c * 8 + octant,
                         jnp.where(fresh, 1 << 14, 1 << 15))

    def lane_sort_key(o, d, alive, fresh):
        """Morton(origin cell, 8^3) * 8 + octant(direction); dead keyed
        after every live cell — THREE-way: live cells < freshly-dead
        (this iteration's retirements, which the log write needs as one
        contiguous block) < stale-dead (drain-phase lanes already
        retired earlier) — render/integrator.py's per-bounce key plus
        the retirement split."""
        if use_chunk_key:
            return first_chunk_key(o, d, alive, fresh)
        def q3(x, lo, span):
            return jnp.clip(((x - lo) / span * 8.0).astype(jnp.int32),
                            0, 7)
        qx = q3(o.x, cell_lo[0], cell_span[0])
        qy = q3(o.y, cell_lo[1], cell_span[1])
        qz = q3(o.z, cell_lo[2], cell_span[2])
        cell = jnp.zeros_like(qx)
        for b in range(3):
            cell = cell | (((qx >> b) & 1) << (3 * b + 2)) \
                | (((qy >> b) & 1) << (3 * b + 1)) \
                | (((qz >> b) & 1) << (3 * b))
        octant = ((d.x > 0.0).astype(jnp.int32) * 4
                  + (d.y > 0.0).astype(jnp.int32) * 2
                  + (d.z > 0.0).astype(jnp.int32))
        return jnp.where(alive, cell * 8 + octant,
                         jnp.where(fresh, 1 << 14, 1 << 15))

    def cond(c):
        more = (c["next_path"] < n_paths) | jnp.any(c["active"])
        if fuse_nee:  # drain the last shadow queries + deferred rows
            more = more | jnp.any(c["p_sh_active"]) \
                | jnp.any(c["p_row_active"])
        return more

    # Two-phase drain (round 5b): the tail of the frame is straggler-
    # bound — the last-spawned paths need ~max-path-length more
    # iterations while occupancy decays (the grid march telemetry showed
    # ~100 of 160 iterations in drain) — but per-iteration glue scales
    # with the WAVEFRONT, not the live count. Once the pool is exhausted
    # and the live lanes fit, hand the sorted live prefix to a second
    # while_loop at a smaller static wavefront.
    drain_sizes = []
    if (compact_lanes and not fuse_nee and not dbg["fixed_iters"]
            and config.regen_drain is not False):
        dn = config.regen_drain_wavefront
        if dn is None:
            # nw//4 won the drain sweep (campaign r5p: 96k -> 232.7 ms
            # vs 128k 233-238, 192k 237.6, 48k 237.3 at nw=384k)
            dn = max(256, (nw // 4) // 256 * 256)
        enable = dn < nw and (config.regen_drain is True
                              or n_paths >= 2 * nw)
        if enable:
            drain_sizes = [dn]
            # second, deeper stage: the late tail is straggler-bound
            # (last paths need ~max-path-length more iterations) and
            # glue scales with the static wavefront
            dn2 = max(256, (dn // 4) // 256 * 256)
            if dn2 < dn:
                drain_sizes.append(dn2)

    def cond_for(threshold):
        if threshold is None:
            return cond

        def cond_t(c):
            return (c["next_path"] < n_paths) | (c["nact"] > threshold)
        return cond_t

    lane_iota = jnp.arange(nw, dtype=jnp.int32)

    def retire(out, mask, pids, vals):
        """Scatter the retired lanes' 9 columns into the 1-D pid-indexed
        output buffers (masked lanes only; ~0.66 ms per column scatter at
        256k indices — see the module docstring for why columns)."""
        idx = jnp.where(mask, pids, n_paths)
        return tuple(o.at[idx].set(v, mode="drop")
                     for o, v in zip(out, vals))

    def body(c):
        # Shape-generic over the lane count: the two-phase drain runs
        # this same body at a smaller wavefront (traced separately per
        # while_loop, so both specializations are static).
        nw_l = c["pid"].shape[0]
        lane_iota = jnp.arange(nw_l, dtype=jnp.int32)
        ray_o, ray_d = c["ray_o"], c["ray_d"]
        throughput, radiance = c["tp"], c["rad"]
        active, seed = c["active"], c["seed"]
        bounce, prev_pdf = c["bounce"], c["prev_pdf"]
        depth1, normal1 = c["depth1"], c["normal1"]
        steps, segs = c["steps"], c["segs"]

        # ---- one path segment: the standard integrator body ----
        r = Ray(ray_o, ray_d)
        out = None if use_log else c["out"]
        log = c["log"] if use_log else None
        retired = c["retired"] if use_log else None

        def bcf(x):
            # pid rides the f32 log as an exact VALUE cast (pids are
            # < 2^24 — guarded below), NOT a bitcast: small ints
            # reinterpreted as f32 are denormals, and the TPU flushes
            # denormals to zero in parts of the data path (observed on
            # hardware: every logged pid read back 0, collapsing the
            # final pid-indexing while the CPU run was bit-exact).
            return x.astype(jnp.float32)

        def resolve_pending(p_occ):
            """Fold the resolved direct term of the PREVIOUS segment's
            shadow query into its owner (live lane or deferred row),
            then retire the now-complete deferred rows."""
            nonlocal radiance, out, log, retired
            vis_prev = (~p_occ).astype(jnp.float32)
            contrib = c["p_pend"] * vis_prev
            # The lane still owns the posting path only if it is ACTIVE
            # with the same pid (pids are pool ordinals, never reused).
            own = c["p_sh_active"] & (c["p_pid"] == c["pid"]) & active
            radiance = vwhere(own, radiance + contrib, radiance)
            # A path that retired right after posting the query parked
            # its row in p_vals (deferred retirement): the resolved
            # direct term is that row's final radiance contribution.
            late = c["p_sh_active"] & ~own
            p_vals = list(c["p_vals"])
            for k, comp in enumerate((contrib.x, contrib.y, contrib.z)):
                p_vals[k] = p_vals[k] + jnp.where(late, comp, 0.0)
            if use_log:
                # The deferred rows sit contiguously at [dstart,
                # dstart + n_fresh_prev) in the CURRENT lane layout
                # (last iteration's 3-way sort put them right after its
                # survivors): roll them to the window front and append.
                # p_vals[7:9] are steps/segs as exact f32 — pack them
                # into the shared column (f32 arithmetic exact < 2^24).
                ppack = jnp.minimum(p_vals[7], float((1 << 19) - 1)) \
                    * 32.0 + p_vals[8]
                window = jnp.stack(list(p_vals[:7])
                                   + [ppack, bcf(c["p_pid"])], axis=0)
                window = jnp.roll(window, -c["dstart"], axis=1)
                log = jax.lax.dynamic_update_slice(log, window,
                                                   (0, retired))
                retired = retired + jnp.sum(
                    c["p_row_active"].astype(jnp.int32))
            elif not dbg["skip_append"]:
                out = retire(out, c["p_row_active"], c["p_pid"], p_vals)
            return tuple(p_vals)

        if dbg["skip_trace"]:  # timing decomposition only — wrong results
            from gdpathtracing_tpu.render.types import HitInfo, MISS_T
            zr = jnp.zeros((48, nw_l), f32) + ray_o.x[None, :] * 1e-30
            zi = (ray_o.x * 0).astype(jnp.int32)
            hit = HitInfo(t=zr[40] + MISS_T, tri=zi, inst=zi, u=zr[41],
                          v=zr[42], front=zi.astype(bool), steps=zi,
                          eidx=zi, rows=zr)
            if fuse_nee:
                p_vals = resolve_pending(zi.astype(bool))
        elif fuse_nee:
            # Phase A closest-hit + phase B any-hit for the PREVIOUS
            # segment's shadow queries, one fused dispatch.
            hit, p_occ = trace_occlude_pallas(
                scene, r, active, Ray(c["p_sh_o"], c["p_sh_d"]),
                c["p_sh_tmax"], c["p_sh_active"], prep=nee_prep)
            p_vals = resolve_pending(p_occ)
        elif use_march:
            # One march round: sweep each block's queued superchunks
            # into the carried best, advance the march cursor where the
            # lane's wanted superchunk was actually in its block queue,
            # and complete the segment when no remaining candidate can
            # beat the running best (rem_e > b_t keeps exact-entry ties
            # sweeping, preserving the lexicographic winner).
            b_t, b_e, tsteps = _ip.march_sweep(
                scene, m_prep, r, active, c["b_t"], c["b_e"], c["queue"])
            # K-step advance: move through EVERY carried candidate the
            # block's queue actually swept (a swept superchunk is
            # processed for every lane of the block — idempotent/sound),
            # so an aligned block retires up to MK superchunks per
            # iteration. Queue membership is a broadcast compare, not a
            # gather.
            qr = jnp.broadcast_to(
                c["queue"].reshape(-1, 1, QL),
                (nw_l // 256, 256, QL)).reshape(nw_l, QL)

            def in_q(s_):
                return jnp.any(qr == s_[:, None], axis=1)

            ces = [c[f"nc_e{i}"] for i in range(MK)]
            css = [c[f"nc_s{i}"] for i in range(MK)]
            advs = []
            prev = active
            for i in range(MK):
                prev = prev & (css[i] < nsc_total) & in_q(css[i])
                advs.append(prev)
            m_t, m_sc = c["m_t"], c["m_sc"]
            for i in range(MK):
                m_t = jnp.where(advs[i], ces[i], m_t)
                m_sc = jnp.where(advs[i], css[i], m_sc)
            rem_e, rem_s = ces[0], css[0]
            for i in range(MK - 1):
                rem_e = jnp.where(advs[i], ces[i + 1], rem_e)
                rem_s = jnp.where(advs[i], css[i + 1], rem_s)
            # fully-advanced lanes can't prove completion this round —
            # the next scan re-derives their frontier.
            seg_done = active & ~advs[MK - 1] \
                & ((rem_s >= nsc_total) | (rem_e > b_t))
            hit = _ip.lite_epilogue(scene, m_prep, r, seg_done,
                                    b_t, b_e)
        else:
            hit = trace_fn(scene, r, active)
        # `shade`: lanes whose segment RESOLVED this iteration — under
        # march, mid-flight lanes must not shade, draw RNG, or count a
        # segment. Everywhere else it is just `active`.
        if use_march:
            shade = seg_done
            steps = steps + jnp.where(active, tsteps, 0)
        else:
            shade = active
            steps = steps + jnp.where(active, hit.steps, 0)
        s0_seed = seed
        is_hit = hit.hit & shade
        segs = segs + shade.astype(jnp.int32)

        if return_stats:
            it = jnp.minimum(c["iters"], MAX_IT - 1)
            stats_upd = dict(
                it_alive=c["it_alive"].at[it].set(
                    jnp.sum(active.astype(jnp.int32))))
            if hit.rows is not None:
                from gdpathtracing_tpu.ops.intersect_pallas import BN
                stats_upd["it_sweeps_a"] = c["it_sweeps_a"].at[it].set(
                    jnp.sum(hit.rows[46, ::BN]))
                stats_upd["it_sweeps_b"] = c["it_sweeps_b"].at[it].set(
                    jnp.sum(hit.rows[47, ::BN]))
            else:
                stats_upd["it_sweeps_a"] = c["it_sweeps_a"]
                stats_upd["it_sweeps_b"] = c["it_sweeps_b"]
        else:
            stats_upd = {}

        s = get_shading_data(scene, hit, r, fast=fast_shading)
        sky = sample_sky(ray_d, config, scene)
        emission = vwhere(is_hit, s.emission, sky)
        if use_nee:
            if hit.rows is not None:
                pl = lights_mod.light_pdf_from_rows(hit.rows, r.d, hit.t)
            else:
                pl = lights_mod.light_pdf_of_hit(light_table, scene,
                                                 hit.inst, hit.tri,
                                                 r.d, hit.t)
            pb = jnp.maximum(prev_pdf, 0.0)
            w_mis = jnp.where(
                (prev_pdf > 0.0) & is_hit & (pl > 0.0),
                (pb * pb) / jnp.maximum(pb * pb + pl * pl, 1e-20), 1.0)
            emission = emission * w_mis
        radiance = vwhere(shade, radiance + throughput * emission,
                          radiance)

        if use_nee:
            (lr1, lr2), seed = rng.pcg2d(seed)
            (lr3, _), seed = rng.pcg2d(seed)
            ls = lights_mod.sample_light(light_table, s.position,
                                         lr3, lr1, lr2)
            cos_i = s.normal.dot(ls.wi)
            shadow_o = s.position + s.normal * config.ray_eps
            shadow_active = is_hit & (cos_i > 0.0) & \
                jnp.isfinite(ls.pdf_solid)
            if fuse_nee:
                visibility = None  # resolves in the NEXT fused dispatch
            elif config.traversal == Traversal.PALLAS:
                from gdpathtracing_tpu.ops.intersect_pallas import \
                    occluded_pallas
                occluded = occluded_pallas(scene, Ray(shadow_o, ls.wi),
                                           ls.dist * (1.0 - 1e-3),
                                           shadow_active)
                visibility = (~occluded).astype(jnp.float32)
            else:
                sh = trace_fn(scene, Ray(shadow_o, ls.wi), shadow_active)
                visibility = (~(sh.t < ls.dist * (1.0 - 1e-3))
                              ).astype(jnp.float32)
            segs = segs + shadow_active.astype(jnp.int32)
            f_l = brdf.eval_brdf(s, ls.wi)
            pb_l = brdf.brdf_pdf(s, ls.wi)
            pl_l = ls.pdf_solid
            pl_ok = jnp.isfinite(pl_l) & (pl_l > 1e-12)
            pl_safe = jnp.where(pl_ok, pl_l, 1.0)
            w_l = (pl_safe * pl_safe) / jnp.maximum(
                pl_safe * pl_safe + pb_l * pb_l, 1e-20)
            scale_l = jnp.where(shadow_active & pl_ok,
                                cos_i * w_l / pl_safe, 0.0)
            if visibility is not None:
                scale_l = scale_l * visibility
            direct = throughput * f_l * ls.emission * scale_l
            if scene.has_transmission:
                direct = direct * (1.0 - s.transmission)
            if fuse_nee:
                new_p_sh_o, new_p_sh_d = shadow_o, ls.wi
                new_p_sh_tmax = ls.dist * (1.0 - 1e-3)
                new_p_sh_active = shadow_active
                new_p_pend = direct
            else:
                radiance = vwhere(active, radiance + direct, radiance)

        dist = (s.position - ray_o).length()
        first = (bounce == 0) & is_hit
        depth1 = jnp.where(first, dist, depth1)
        normal1 = vwhere(first, s.normal, normal1)

        (r1, r2), seed = rng.pcg2d(seed)
        new_dir = brdf.sample_brdf(s, r1, r2)
        pdf = brdf.brdf_pdf(s, new_dir)
        lambert_in = s.normal.dot(new_dir)
        f = brdf.eval_brdf(s, new_dir)
        scale = jnp.where(pdf > 1e-12,
                          lambert_in / jnp.maximum(pdf, 1e-12), 0.0)
        mult = f * scale
        survive = is_hit & (lambert_in > 0.0) & (pdf > 1e-12)
        offset = s.normal * config.ray_eps
        prev_pdf_val = pdf

        if scene.has_transmission:
            (r3, r4), seed = rng.pcg2d(seed)
            pick_t = r3 < s.transmission
            eta = jnp.where(hit.front, 1.0 / s.ior, s.ior)
            fres = brdf.fresnel_dielectric(s.lambert_out, eta)
            refr_dir, tir = brdf.refract(r.d, s.normal, eta)
            refl_dir = reflect(r.d, s.normal)
            do_reflect = (r4 < fres) | tir
            delta_dir = vwhere(do_reflect, refl_dir, refr_dir)
            new_dir = vwhere(pick_t, delta_dir, new_dir)
            mult = vwhere(pick_t, s.albedo, mult)
            survive = jnp.where(pick_t, is_hit, survive)
            offset = vwhere(pick_t & ~do_reflect, -offset, offset)
            prev_pdf_val = jnp.where(pick_t, -1.0, prev_pdf_val)

        new_throughput = throughput * mult

        if config.rr_start > 0:
            (r5, _), seed = rng.pcg2d(seed)
            lum = jnp.maximum(new_throughput.x,
                              jnp.maximum(new_throughput.y,
                                          new_throughput.z))
            p = jnp.clip(lum, config.rr_min_p, 1.0)
            do_rr = bounce >= config.rr_start
            survive = survive & jnp.where(do_rr, r5 < p, True)
            boost = jnp.where(do_rr, 1.0 / p, 1.0)
            new_throughput = new_throughput * boost

        if use_march:
            # Commit the RNG draws only for resolved segments: a
            # mid-flight lane must keep its stream position so every
            # path consumes exactly the standard integrator's sequence.
            seed = (jnp.where(shade, seed[0], s0_seed[0]),
                    jnp.where(shade, seed[1], s0_seed[1]))

        new_o = s.position + offset
        ray_o = vwhere(survive, new_o, ray_o)
        ray_d = vwhere(survive, new_dir, ray_d)
        throughput = vwhere(survive, new_throughput, throughput)
        if use_march:
            prev_pdf = jnp.where(survive, prev_pdf_val,
                                 jnp.where(shade, -1.0, prev_pdf))
            bounce = bounce + shade.astype(jnp.int32)
            alive = (active & ~shade) | (survive
                                         & (bounce < config.bounces))
            # Reset the march for every resolved lane (new segment or
            # retirement; spawns re-reset below).
            b_t = jnp.where(shade, f32(_MISS_T), b_t)
            b_e = jnp.where(shade, BIG_E, b_e)
            m_t = jnp.where(shade, NEG_INF, m_t)
            m_sc = jnp.where(shade, -1, m_sc)
        else:
            prev_pdf = jnp.where(survive, prev_pdf_val, -1.0)
            bounce = bounce + active.astype(jnp.int32)
            alive = active & survive & (bounce < config.bounces)

        # ---- retire finished paths ----
        dead_now = active & ~alive
        vals = (radiance.x, radiance.y, radiance.z, depth1,
                normal1.x, normal1.y, normal1.z,
                steps.astype(f32), segs.astype(f32))
        if fuse_nee:
            # Defer one iteration: the row's last direct-light term
            # resolves in the NEXT fused dispatch (p_sh slots).
            new_p_vals = tuple(jnp.where(dead_now, v, pv)
                               for v, pv in zip(vals, p_vals))
            new_p_row_active = dead_now
        elif not use_log and not dbg["skip_append"]:
            out = retire(out, dead_now, c["pid"], vals)

        # ---- survivors-first lane compaction (tail-coherent spawning) ----
        pid = c["pid"]
        if compact_lanes:
            alive_i = alive.astype(jnp.int32)
            n_alive = jnp.sum(alive_i)
            if sort_lanes and use_march:
                # March key: the lane's NEXT superchunk — aligns whole
                # blocks on the kernel's unit of work. Freshly shaded
                # survivors keep their stale rem_s (their new segment
                # starts at the old hit — a locality proxy until the
                # post-spawn candidate scan refreshes it next round).
                octant = ((ray_d.x > 0.0).astype(jnp.int32) * 4
                          + (ray_d.y > 0.0).astype(jnp.int32) * 2
                          + (ray_d.z > 0.0).astype(jnp.int32))
                # Two-level key (next sc, next-next sc): blocks align on
                # BOTH, so the multi-level queue's n2 slots serve whole
                # runs and the K-step advance actually fires. The second
                # level is approximate for multi-advanced lanes (their
                # deeper frontier is unknown until the next scan).
                remc = jnp.clip(rem_s, 0, nsc_total)
                rem2 = css[1] if MK > 1 else css[0]
                for i in range(MK - 2):
                    rem2 = jnp.where(advs[i], css[i + 2], rem2)
                if MK > 1:
                    rem2 = jnp.where(advs[MK - 2], rem_s, rem2)
                rem2c = jnp.clip(rem2, 0, nsc_total)
                key = jnp.where(
                    alive,
                    (remc * (nsc_total + 1) + rem2c) * 8 + octant,
                    jnp.where(dead_now, 1 << 22, 1 << 23))
                perm = jnp.argsort(key, stable=True)
            elif sort_lanes:
                key = lane_sort_key(ray_o, ray_d, alive, dead_now)
                perm = jnp.argsort(key, stable=True)
            else:
                # 3-way stable partition: alive | fresh-dead | stale
                # (the log write needs this iteration's retirements as
                # one contiguous block right after the survivors).
                fresh_i = dead_now.astype(jnp.int32)
                stale_i = ((~alive) & ~dead_now).astype(jnp.int32)
                ra = jnp.cumsum(alive_i)
                rf = jnp.cumsum(fresh_i)
                rs = jnp.cumsum(stale_i)
                n_fresh_p = rf[-1]
                dest = jnp.where(
                    alive, ra,
                    jnp.where(dead_now, n_alive + rf,
                              n_alive + n_fresh_p + rs)) - 1
                perm = jnp.zeros(nw_l, jnp.int32).at[dest].set(lane_iota)
            # NOTE (round 5): splitting these stacked gathers into
            # <=8-wide groups per the core/gather.py micro law REGRESSED
            # end-to-end (primal 269 -> 287 ms, NEE 565 -> 630 —
            # campaign r5g) and was reverted: XLA fuses the single
            # stack+gather+unstack better than six separate ones. The
            # micro rates apply to standalone gathers, not this pattern.
            #
            # ONE merged gather per column GROUP (round-5b): row-gather
            # cost is per-ROW per-GATHER (~11-14 ns/row isolated,
            # moderate width rides the padded tile — profile_r4
            # micro2/micro3), so the 17 float + 6 int lane columns ride
            # a SINGLE packed matrix (demo primal 254.1 -> 240.4 ms,
            # campaign r5j). Carrier dtype is int32: f32 lanes BITCAST
            # to i32 (exact), because ints must never transit the f32
            # datapath (TPU flushes denormals — docs/STATUS.md item 3;
            # the int path is bit-safe for both). The NEE pendings stay
            # a SECOND gather: one 45-col stack regressed end-to-end
            # (NEE 521 -> 618 ms, campaign r5k) — beyond ~3 sublane
            # tiles XLA's stack+gather fusion falls apart.
            bc = jax.lax.bitcast_convert_type
            cols = [ray_o.x, ray_o.y, ray_o.z,
                    ray_d.x, ray_d.y, ray_d.z,
                    throughput.x, throughput.y, throughput.z,
                    radiance.x, radiance.y, radiance.z,
                    prev_pdf, depth1,
                    normal1.x, normal1.y, normal1.z]  # 17 f32
            NI = len(cols)
            icols = [bc(seed[0], jnp.int32), bc(seed[1], jnp.int32),
                     pid, bounce, steps, segs]
            if use_march:  # candidates recomputed post-spawn, not carried
                cols += [m_t, b_t]
                icols += [m_sc, b_e]
            m = jnp.stack([bc(x, jnp.int32) for x in cols] + icols,
                          axis=1)[perm]
            NC = len(cols)
            fcol = lambda k: bc(m[:, k], jnp.float32)
            ray_o = Vec3(fcol(0), fcol(1), fcol(2))
            ray_d = Vec3(fcol(3), fcol(4), fcol(5))
            throughput = Vec3(fcol(6), fcol(7), fcol(8))
            radiance = Vec3(fcol(9), fcol(10), fcol(11))
            prev_pdf, depth1 = fcol(12), fcol(13)
            normal1 = Vec3(fcol(14), fcol(15), fcol(16))
            seed = (bc(m[:, NC], jnp.uint32), bc(m[:, NC + 1], jnp.uint32))
            pid, bounce = m[:, NC + 2], m[:, NC + 3]
            steps, segs = m[:, NC + 4], m[:, NC + 5]
            alive = lane_iota < n_alive
            if use_march:
                m_t, b_t = fcol(NI), fcol(NI + 1)
                m_sc, b_e = m[:, NC + 6], m[:, NC + 7]
            if fuse_nee:
                pcols = [new_p_sh_o.x, new_p_sh_o.y, new_p_sh_o.z,
                         new_p_sh_d.x, new_p_sh_d.y, new_p_sh_d.z,
                         new_p_sh_tmax, new_p_pend.x, new_p_pend.y,
                         new_p_pend.z] + list(new_p_vals)  # 19 f32
                NP = len(pcols)
                pm = jnp.stack(
                    [bc(x, jnp.int32) for x in pcols]
                    + [new_p_sh_active.astype(jnp.int32),
                       new_p_row_active.astype(jnp.int32), c["pid"]],
                    axis=1)[perm]
                pfc = lambda k: bc(pm[:, k], jnp.float32)
                new_p_sh_o = Vec3(pfc(0), pfc(1), pfc(2))
                new_p_sh_d = Vec3(pfc(3), pfc(4), pfc(5))
                new_p_sh_tmax = pfc(6)
                new_p_pend = Vec3(pfc(7), pfc(8), pfc(9))
                new_p_vals = tuple(pfc(10 + k) for k in range(OUT_COLS))
                new_p_sh_active = pm[:, NP].astype(bool)
                new_p_row_active = pm[:, NP + 1].astype(bool)
                new_p_pid = pm[:, NP + 2]
        elif fuse_nee:
            new_p_pid = c["pid"]

        if use_log:
            # v4 retirement: ONE contiguous append of the freshly-dead
            # block (now at [n_alive, n_alive + n_fresh) after the
            # 3-way permutation). In fused mode the rows defer one
            # iteration (resolve_pending appends them instead).
            n_fresh = jnp.sum(dead_now.astype(jnp.int32))
            if not fuse_nee:
                pack = (jnp.minimum(steps, (1 << 19) - 1) * 32
                        + segs).astype(f32)
                window = jnp.stack(
                    [radiance.x, radiance.y, radiance.z, depth1,
                     normal1.x, normal1.y, normal1.z,
                     pack, bcf(pid)], axis=0)
                window = jnp.roll(window, -n_alive, axis=1)
                log = jax.lax.dynamic_update_slice(log, window,
                                                   (0, retired))
                retired = retired + n_fresh
            new_dstart = n_alive

        # ---- regenerate: refill dead lanes with the next pool paths
        # (post-compaction the dead are the contiguous tail, so fresh
        # consecutive-pixel paths form coherent blocks) ----
        next_path = c["next_path"]
        dead = ~alive
        spawn_rank = jnp.cumsum(dead.astype(jnp.int32)) - 1
        new_id = next_path + spawn_rank
        can = dead & (new_id < n_paths)
        new_id = jnp.minimum(new_id, n_paths - 1)
        if dbg["skip_spawn"]:  # timing only (use with fixed_iters)
            can = can & False
            ray_new, seed_new = Ray(ray_o, ray_d), seed
        else:
            ray_new, seed_new = spawn(new_id)

        ray_o = vwhere(can, ray_new.o, ray_o)
        ray_d = vwhere(can, ray_new.d, ray_d)
        seed = (jnp.where(can, seed_new[0], seed[0]),
                jnp.where(can, seed_new[1], seed[1]))
        zl = ray_o.x * 0.0  # shape-local (drain phase runs a smaller nw)
        zl3 = Vec3(zl, zl, zl)
        throughput = vwhere(can, Vec3(zl + 1.0, zl + 1.0, zl + 1.0),
                            throughput)
        radiance = vwhere(can, zl3, radiance)
        normal1 = vwhere(can, zl3, normal1)
        depth1 = jnp.where(can, f32(camera.far), depth1)
        prev_pdf = jnp.where(can, -1.0, prev_pdf)
        bounce = jnp.where(can, 0, bounce)
        steps = jnp.where(can, 0, steps)
        segs = jnp.where(can, 0, segs)
        pid = jnp.where(can, new_id, pid)
        active = alive | can
        next_path = jnp.minimum(
            next_path + jnp.sum(dead.astype(jnp.int32)),
            jnp.int32(n_paths))

        if use_march:
            # Fresh spawns start a new march; then ONE candidate scan
            # refreshes the next-two-superchunk pair for the final rays
            # (marchers recompute to the same values), and the block
            # queues for the next round come from the now-sorted lanes.
            b_t = jnp.where(can, f32(_MISS_T), b_t)
            b_e = jnp.where(can, BIG_E, b_e)
            m_t = jnp.where(can, NEG_INF, m_t)
            m_sc = jnp.where(can, -1, m_sc)
            es_n, ss_n = _ip.march_next_candidates(
                m_prep, ray_o, ray_d, active, m_t, m_sc, b_t, k=MK)
            queue, _ = _ip.march_block_queue(ss_n, nsc_total, QL)

        new_c = dict(next_path=next_path,
                     nact=jnp.sum(active.astype(jnp.int32)),
                     iters=c["iters"] + 1,
                     ray_o=ray_o, ray_d=ray_d, seed=seed, tp=throughput,
                     rad=radiance, pid=pid, bounce=bounce, active=active,
                     prev_pdf=prev_pdf, depth1=depth1, normal1=normal1,
                     steps=steps, segs=segs, **stats_upd)
        if use_log:
            new_c.update(log=log, retired=retired, dstart=new_dstart)
        else:
            new_c["out"] = out
        if use_march:
            new_c.update(m_t=m_t, m_sc=m_sc, b_t=b_t, b_e=b_e,
                         queue=queue,
                         **{f"nc_e{i}": es_n[i] for i in range(MK)},
                         **{f"nc_s{i}": ss_n[i] for i in range(MK)})
        if fuse_nee:
            # The pending + deferred row survive the lane's regeneration
            # (both belong to the retired path; the lane is already
            # tracing its replacement).
            new_c.update(p_sh_o=new_p_sh_o, p_sh_d=new_p_sh_d,
                         p_sh_tmax=new_p_sh_tmax,
                         p_sh_active=new_p_sh_active, p_pend=new_p_pend,
                         p_pid=new_p_pid, p_vals=new_p_vals,
                         p_row_active=new_p_row_active)
        return new_c

    if dbg["fixed_iters"]:
        final, _ = jax.lax.scan(lambda c, _: (body(c), None), init,
                                None, length=dbg["fixed_iters"])
    else:
        per_lane = ["ray_o", "ray_d", "seed", "tp", "rad", "pid",
                    "bounce", "active", "prev_pdf", "depth1",
                    "normal1", "steps", "segs"]
        if use_march:
            per_lane += ["m_t", "m_sc", "b_t", "b_e"]
            per_lane += [f"nc_e{i}" for i in range(MK)]
            per_lane += [f"nc_s{i}" for i in range(MK)]
        final = jax.lax.while_loop(
            cond_for(drain_sizes[0] if drain_sizes else None), body, init)
        for j, dnw in enumerate(drain_sizes):
            nxt = drain_sizes[j + 1] if j + 1 < len(drain_sizes) else None
            init2 = dict(final)
            for k in per_lane:
                init2[k] = jax.tree.map(
                    lambda a, d=dnw: a[:d], final[k])
            if use_march:
                init2["queue"], _ = _ip.march_block_queue(
                    [init2[f"nc_s{i}"] for i in range(MK)],
                    nsc_total, QL)
            final = jax.lax.while_loop(cond_for(nxt), body, init2)
    if use_log:
        # One-shot pid-indexing of the retirement log: every path
        # retired exactly once, so log[:, :n_paths] holds each pid once
        # — scatter positions (2M scalar writes), transpose the column-
        # major log, and fetch rows in two <=8-wide packed gathers.
        log = final["log"]
        pid_l = log[LOG_R - 1, :n_paths].astype(jnp.int32)  # 1-D slice
        pos = jnp.zeros(n_paths, jnp.int32).at[pid_l].set(
            jnp.arange(n_paths, dtype=jnp.int32), mode="drop")
        rows8 = log[0:8, :n_paths].T[pos]       # (n_paths, 8) — ONE gather
        packi = rows8[:, 7].astype(jnp.int32)
        out = tuple(rows8[:, k] for k in range(7)) \
            + ((packi >> 5).astype(f32), (packi & 31).astype(f32))
    else:
        out = final["out"]  # 9 x (n_paths,) pid-indexed directly

    if config.spp > 1:
        o = [a.reshape(config.spp, n_pix) for a in out]
        rgb = jnp.stack([o[0].mean(axis=0), o[1].mean(axis=0),
                         o[2].mean(axis=0)], axis=1)
        depth = o[3].min(axis=0)
        normal = jnp.stack([o[4][0], o[5][0], o[6][0]], axis=1)
        steps = o[7].sum(axis=0)
        segs = o[8].sum(axis=0)
    else:
        rgb = jnp.stack(out[0:3], axis=1)
        depth = out[3]
        normal = jnp.stack(out[4:7], axis=1)
        steps = out[7]
        segs = out[8]
    aovs = FrameAOVs(
        radiance=rgb.reshape(h, w, 3),
        depth=depth.reshape(h, w),
        steps=steps.astype(jnp.int32).reshape(h, w),
        segments=segs.astype(jnp.int32).reshape(h, w),
        normal=normal.reshape(h, w, 3))
    if return_stats:
        return aovs, {"iters": final["iters"],
                      "lane_slots": final["iters"] * nw,
                      "it_alive": final["it_alive"],
                      "it_sweeps_a": final["it_sweeps_a"],
                      "it_sweeps_b": final["it_sweeps_b"],
                      "n_blocks": nw // 256}
    return aovs
