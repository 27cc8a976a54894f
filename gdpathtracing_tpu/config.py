"""Render configuration.

The reference scatters its knobs between Godot editor properties and
hard-coded shader constants (SURVEY.md §5 "Config"): 5 bounces
(main.glsl:377), ray-offset epsilon 0.001 (main.glsl:385), temporal blend
0.75 (temporal_reprojection.glsl:64), near/far 0.01/1000
(render_parameters.h:20-21). Here every one of them is an explicit field of a
single hashable dataclass, used as a static argument to ``jax.jit``.
"""

from __future__ import annotations

import dataclasses
import enum


class DenoisingMode(enum.Enum):
    """Analog of reference PathTracingCamera::DenoisingMode
    (path_tracing_camera.h:30-34)."""

    PROGRESSIVE = "progressive"
    TEMPORAL = "temporal"
    NONE = "none"


class Traversal(enum.Enum):
    """Which intersection backend the integrator uses."""

    BRUTE = "brute"  # O(rays x tris) Möller–Trumbore — the testing oracle
    BVH = "bvh"      # two-level TLAS/BLAS stack traversal (batched lax loop)
    UNIT = "unit"    # O(rays x tris) unit-triangle-space matmul formulation
    PALLAS = "pallas"  # fused Pallas TPU kernel (unit-triangle space)
    FUSED = "fused"    # round-1 megakernel: all bounces in one Pallas kernel
    #                    (small/mid scenes, no textures/env/NEE — the
    #                    dispatcher validates via fused_pallas.fused_supported)
    MEGA = "mega"      # megakernel v2: ONE Pallas kernel per bounce —
    #                    sweep + shading + NEE shadow rays + BRDF sampling
    #                    all in-kernel, state (24+8, N) rows in HBM between
    #                    bounces (ops/megakernel.py; mega_supported gates:
    #                    no textures/env/transmission, <=16 chunks)


class Tonemap(enum.Enum):
    """Display operator — the reference hard-codes ACES
    (progressive_rendering.glsl:19-26)."""

    ACES = "aces"
    REINHARD = "reinhard"
    LINEAR = "linear"


class Jitter(enum.Enum):
    NONE = "none"
    UNIFORM = "uniform"   # uniform in [-0.5, 0.5]^2 around the pixel center
    GAUSS = "gauss"       # Gaussian, sigma = 0.375 px (proper Box–Muller; the
    #                       reference's box_muller drops the radius term —
    #                       main.glsl:183-187 — a bug we fix, not copy)
    CIRCLE = "circle"     # reference-compatible: point on the unit circle


@dataclasses.dataclass(frozen=True)
class RenderConfig:
    """Static render settings. Hashable → usable as a jit static arg.

    Resolution, FOV and near/far live on :class:`render.camera.Camera`
    (the reference also sources them from the camera node,
    path_tracing_camera.cpp:124,134)."""

    bounces: int = 5          # reference hard-codes 5 (main.glsl:377)
    spp: int = 1              # samples/pixel/frame (reference: 1, main.glsl:405)
    ray_eps: float = 1e-3     # hit-point normal offset (main.glsl:385)
    nee: bool = False         # next-event estimation + MIS (beyond the
    #                           reference, whose transport is BRDF-sampling
    #                           only — README wishlist item)
    rr_start: int = 0         # Russian roulette from this bounce on (0 =
    #                           off, matching the reference, which has no
    #                           path-length control beyond the hard cap).
    #                           Survival prob = clamp(max(throughput),
    #                           rr_min_p, 1); throughput /= p on survival —
    #                           unbiased, detached for gradients.
    rr_min_p: float = 0.05    # survival-probability floor (variance guard)
    sort_rays: bool | None = None  # octant-sort the wavefront each bounce
    #                           (restores block coherence for the chunked
    #                           kernels on large scenes). None = auto:
    #                           on for PALLAS + >16-chunk scenes.
    compact_rays: bool | None = None  # stream-compact the wavefront
    #                           between bounces: stable partition of
    #                           128-ray GROUPS by any-live (cumsum, no
    #                           argsort; every permute is a contiguous
    #                           row gather — per-ray reorders measured
    #                           ~830 ms/bounce on TPU). Dead groups pack
    #                           into tail blocks whose slab tests all
    #                           fail, so terminated paths cost zero
    #                           sweeps (the TPU analog of SIMT early
    #                           thread exit, main.glsl:390-396);
    #                           survivors keep their pixel-coherent
    #                           order. Per-ray results (radiance, depth,
    #                           segments) are permutation-invariant, so
    #                           it is result-transparent. Applies to MEGA
    #                           (None = auto: on for wavefronts >= 4
    #                           blocks) and to wavefront-PALLAS (None =
    #                           auto: on for >= 65536-ray wavefronts
    #                           whenever per-bounce sorting is off —
    #                           sort_rays keys dead rays last and so
    #                           subsumes it).
    regen: bool | None = None  # path-regeneration frame loop
    #                           (render/regen.py): a persistent wavefront
    #                           where dead lanes are refilled with the
    #                           next unstarted path, so sweeps stay ~100%
    #                           live instead of paying the flat per-bounce
    #                           cost of mostly-dead blocks (round-3
    #                           diagnosis). Primal only (while_loop is not
    #                           reverse-differentiable); requires
    #                           regen.regen_supported. None = auto: ON for
    #                           EVERY supported PALLAS primal render —
    #                           with column-scatter retirement it beats
    #                           the standard loop on all measured scales
    #                           (demo 312 vs 430 ms, grid 0.44 vs 0.30
    #                           Mrays/s — regen.regen_auto); the standard
    #                           per-bounce loop remains the bit-golden
    #                           reference and the non-PALLAS default.
    differentiable: bool = False  # differentiable render path: PALLAS
    #                           traversal becomes a primal hit-finder with a
    #                           differentiable recompute epilogue
    #                           (ops/intersect_pallas.trace_pallas_diff) and
    #                           the bounce loop is jax.checkpoint'ed per
    #                           bounce so backward memory stays O(wavefront)
    #                           instead of O(wavefront x bounces x ops).
    #                           BRUTE/UNIT are differentiable regardless.
    bwd_checkpoint: bool | None = None  # differentiable mode:
    #                           jax.checkpoint each bounce (backward
    #                           recomputes the bounce interior; residual
    #                           memory stays O(wavefront)). False = let
    #                           the scan save every intermediate —
    #                           measured 1921 -> 1315 ms fwd+bwd at
    #                           1080p x 5 bounces (campaign F [bwd2]);
    #                           residuals ~1.6 GB at 1080p, ~6.5 GB at
    #                           4K x 5 bounces. None (default) = SHAPE-
    #                           AWARE auto: estimate residual bytes
    #                           (~BWD_RESID_BYTES_PER_SEG per lane-
    #                           bounce) and checkpoint only when they
    #                           exceed BWD_RESID_BUDGET (4 GB — leaves
    #                           the v5e's 16 GB HBM room for the scene,
    #                           wavefront state and the backward's own
    #                           temporaries). Values/gradients are
    #                           identical either way (tests/test_diff.py
    #                           asserts both paths agree).
    # Residual-estimate constants for the bwd_checkpoint=None auto rule
    # (calibrated on the measured ~1.6 GB at 2.07M rays x 5 bounces).
    bwd_resid_bytes_per_seg: int = 160
    bwd_resid_budget: int = 4 << 30
    grad_attached: bool = False  # gradient strategy for the sampling terms
    #                           (Mitsuba's attached/detached distinction).
    #                           False (default) = DETACHED: the sampled
    #                           bounce direction and every pdf are
    #                           stop-gradient'ed — the standard low-variance
    #                           unbiased estimator of dE[L]/dθ; per-sample
    #                           AD deliberately differs from FD of the
    #                           primal for parameters that move the samples
    #                           (vertices/normals/camera). True = ATTACHED:
    #                           nothing is detached, so jax.grad equals the
    #                           finite difference of the primal estimator
    #                           exactly (chain rule, fixed RNG) — what FD
    #                           gradient tests and reparameterization-style
    #                           estimators need. The primal image is
    #                           IDENTICAL either way.
    soft_shadows: float = 0.0  # > 0: differentiable soft-shadow visibility
    #                           with this barycentric edge width (NEE;
    #                           BRUTE/UNIT use the exact all-triangle
    #                           product, PALLAS a top-1-blocker kernel —
    #                           gradients of shadows w.r.t. blocker
    #                           geometry, the silhouette term hard
    #                           visibility drops). 0 = hard.
    soft_primary: float = 0.0  # > 0: differentiable PRIMARY-visibility
    #                           silhouettes with this barycentric edge
    #                           width: the first hit blends toward the
    #                           environment as the winner's barycentric
    #                           edge margin -> 0 (SoftRas-style
    #                           relaxation; alpha = 2 sigmoid(m/eps) - 1
    #                           is continuous across the silhouette), so
    #                           pixel gradients w.r.t. object/camera pose
    #                           include the object-over-background
    #                           boundary term. Works on every
    #                           differentiable backend incl. PALLAS
    #                           (the recomputed winner u/v carry the
    #                           gradient). Bias O(eps) in silhouette
    #                           bands; 0 = hard (bit-identical goldens).
    traversal: Traversal = Traversal.BVH
    jitter: Jitter = Jitter.UNIFORM
    max_stack: int = 64       # traversal stack depth (main.glsl:272,307)
    tile_rays: int = 262144   # rays per traced tile (bounds live wavefront
    #                           memory; larger tiles amortize dispatch)
    regen_wavefront: int = 393216  # persistent-wavefront size of the
    #                           regeneration loop (render/regen.py).
    #                           Larger wavefronts amortize per-iteration
    #                           fixed costs until HBM-traffic effects
    #                           turn: demo 1080p v4 measured 350.6 /
    #                           255.4 / 272.1 / 313.2 ms at nw = 256k /
    #                           384k / 524k / 768k (campaign r5f nw
    #                           sweep; v3-era numbers preferred 524k).
    #                           Capped by the path-pool size.
    regen_retire: str = "log"   # regen retirement mechanism: "log"
    #                           (default) = contiguous retirement log —
    #                           after the lane permutation puts freshly
    #                           dead lanes in a contiguous block, one
    #                           dynamic_update_slice appends their 10
    #                           packed columns to a (10, n_paths+nw)
    #                           column-major log at bandwidth rate, and
    #                           ONE transpose+row-gather at frame end
    #                           lands everything pid-indexed. "scatter"
    #                           = round-4 v3 per-iteration column
    #                           scalar-scatters (~4.7 ns/elem x nw x 9
    #                           cols x iters ≈ 190 ms of the 307 ms
    #                           demo frame — the round-5 telemetry
    #                           showed retirement, not the trace, was
    #                           the regen bottleneck). Requires the lane
    #                           permutation; compact_rays=False falls
    #                           back to "scatter".
    regen_sort_key: str = "morton"  # regen lane-sort key: "morton" =
    #                           Morton(origin cell) x octant (round-4
    #                           default); "chunk" = first chunk the ray
    #                           enters x octant — aligns blocks with the
    #                           kernel's unit of work (the chunk sweep)
    #                           instead of raw origin locality.
    regen_march: bool | None = None  # frontier-march traversal for
    #                           superchunk scenes (render/regen.py +
    #                           ops/intersect_pallas.py march_*): rays
    #                           advance through up to regen_march_k of
    #                           their next superchunks per regen
    #                           iteration, lanes re-sort by their NEXT
    #                           superchunk, blocks sweep only the <=QL
    #                           superchunks their rays want. Default
    #                           (None/False) = OFF: measured SLOWER than
    #                           the one-shot culled sweep at every tried
    #                           scale (grid 5391-6796 vs 4463 ms, mid
    #                           3774 vs 1885 — campaigns r5l-r5o); the
    #                           per-iteration glue outweighs the exact-
    #                           frontier sweep savings. True forces it
    #                           on where march_supported.
    regen_fuse_nee: bool = False  # regen NEE: ride bounce i's shadow
    #                           query on bounce i+1's fused kernel
    #                           (phase B) instead of a separate
    #                           occlusion dispatch per iteration. The
    #                           separate dispatch measured FASTER
    #                           in-graph (455.6 vs 498.7 ms demo NEE,
    #                           campaign r5m): fusion doubles the
    #                           permuted pending state and defers
    #                           retirement, while the in-graph dispatch
    #                           overhead the fusion was built to avoid
    #                           (round-3 host loops) no longer exists.
    regen_drain: bool | None = None  # two-phase drain (render/regen.py):
    #                           once the path pool is exhausted and the
    #                           live count fits, hand the sorted live
    #                           prefix to a second while_loop at a ~3x
    #                           smaller wavefront — the drain tail pays
    #                           per-iteration glue (permute, scan, DUS)
    #                           proportional to the wavefront, and the
    #                           tail is straggler-bound (last paths need
    #                           max-path-length more iterations). None =
    #                           auto (on for frames with n_paths >= 2*nw,
    #                           fused-NEE excluded).
    regen_drain_wavefront: int | None = None  # phase-2 lane count
    #                           (None = nw//4 rounded to 256; swept in
    #                           campaign r5p)
    regen_march_k: int = 6      # carried march candidates per lane: a
    #                           lane advances through up to K of its
    #                           next superchunks per iteration when its
    #                           block's queue swept them — amortizes the
    #                           per-iteration glue over K sc of progress.
    regen_march_ql: int = 8     # queue slots (distinct superchunks) per
    #                           block per march round, filled multi-level
    #                           from the blocks' n1/n2/n3 run-heads so
    #                           the K-step advance can fire; lanes beyond
    #                           the filled slots wait a round. (grid
    #                           1080p: QL=4 beat QL=2 by 7% pre-K-step,
    #                           r5l.)
    temporal_blend: float = 0.75   # temporal_reprojection.glsl:64
    temporal_depth_eps: float = 0.1  # history-reject threshold (glsl:59)
    denoising: DenoisingMode = DenoisingMode.PROGRESSIVE
    # Spatial edge-aware denoiser (post/denoise.py), applied to the linear
    # image before the display transform:
    spatial_denoise: bool = False
    denoise_iterations: int = 3
    # Display transform (post/display.py):
    tonemap: Tonemap = Tonemap.ACES
    exposure: float = 1.0
    bloom: bool = False
    bloom_threshold: float = 1.0
    bloom_strength: float = 0.15
    bloom_radius: int = 8
    # Sky gradient endpoints (main.glsl:189-192).
    sky_horizon: tuple[float, float, float] = (0.95, 0.95, 0.95)
    sky_zenith: tuple[float, float, float] = (0.9, 0.94, 1.0)

    def replace(self, **kw) -> "RenderConfig":
        return dataclasses.replace(self, **kw)
