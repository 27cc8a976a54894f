"""The path-tracing integrator: iterative bounce loop over a ray wavefront.

Re-expression of path_trace (main.glsl:372-401) as a ``lax.fori_loop`` whose
carry is the whole SoA wavefront state. Same light transport as the
reference: BRDF importance sampling only (no NEE / MIS vs lights / Russian
roulette), ``radiance += throughput * emission`` per segment, sky on miss,
hard bounce cap, ray-origin epsilon offset along the shading normal.

Differentiability: the sampled direction and the pdf are wrapped in
``stop_gradient`` (detached sampling) so that ``jax.grad`` of the radiance
w.r.t. scene parameters (albedo, emission, roughness, vertices, camera)
yields the unbiased interior-derivative estimator; visibility
discontinuities are handled separately (diff/).
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from gdpathtracing_tpu.config import RenderConfig, Traversal
from gdpathtracing_tpu.core import rng
from gdpathtracing_tpu.core.vec import Vec3, where as vwhere
from gdpathtracing_tpu.render import brdf
from gdpathtracing_tpu.render.intersect import trace_brute
from gdpathtracing_tpu.render.shading import get_shading_data
from gdpathtracing_tpu.render.sky import sample_sky
from gdpathtracing_tpu.render.types import HitInfo, Ray
from gdpathtracing_tpu.scene.scene import Scene

TraceFn = Callable[[Scene, Ray, jnp.ndarray], HitInfo]


def get_trace_fn(config: RenderConfig) -> TraceFn:
    if config.traversal == Traversal.BRUTE:
        return lambda scene, ray, active: trace_brute(scene, ray, active)
    if config.traversal == Traversal.BVH:
        from gdpathtracing_tpu.render.traverse import trace_bvh
        return lambda scene, ray, active: trace_bvh(
            scene, ray, active, max_stack=config.max_stack)
    if config.traversal == Traversal.UNIT:
        from gdpathtracing_tpu.render.intersect import trace_unit
        return lambda scene, ray, active: trace_unit(scene, ray, active)
    if config.traversal == Traversal.PALLAS:
        from gdpathtracing_tpu.ops.intersect_pallas import trace_pallas
        return lambda scene, ray, active: trace_pallas(scene, ray, active)
    raise ValueError(config.traversal)


class PathTraceResult(NamedTuple):
    radiance: Vec3          # (N,) per ray
    depth: jnp.ndarray      # (N,) linear distance of first hit (far if miss)
    steps: jnp.ndarray      # (N,) triangle tests — DEBUG_STEPS analog
    segments: jnp.ndarray   # (N,) ray segments actually traced (≤ bounces)


def path_trace(scene: Scene, ray: Ray, seed, config: RenderConfig,
               trace_fn: TraceFn | None = None,
               far: float = 1000.0) -> PathTraceResult:
    """Trace one path per ray; all rays advance in lockstep through the
    bounce loop with an `active` mask (main.glsl:372-401)."""
    if trace_fn is None:
        trace_fn = get_trace_fn(config)
    n = ray.o.x.shape[0]
    f32 = jnp.float32

    def body(i, carry):
        (ray_o, ray_d, throughput, radiance, active, seed, depth, steps,
         segments) = carry
        r = Ray(ray_o, ray_d)
        hit = trace_fn(scene, r, active)
        is_hit = hit.hit & active
        steps = steps + jnp.where(active, hit.steps, 0)
        segments = segments + active.astype(jnp.int32)

        s = get_shading_data(scene, hit, r)
        sky = sample_sky(ray_d, config)
        emission = vwhere(is_hit, s.emission, sky)
        add = throughput * emission
        radiance = vwhere(active, radiance + add, radiance)

        # First-hit distance → depth AOV (main.glsl:382-383).
        dist = (s.position - ray_o).length()
        depth = jnp.where((i == 0) & is_hit, dist, depth)

        # Next segment: detached BRDF sampling.
        (r1, r2), seed = rng.pcg2d(seed)
        new_dir = brdf.sample_brdf(s, r1, r2)
        new_dir = Vec3(jax.lax.stop_gradient(new_dir.x),
                       jax.lax.stop_gradient(new_dir.y),
                       jax.lax.stop_gradient(new_dir.z))
        pdf = jax.lax.stop_gradient(brdf.brdf_pdf(s, new_dir))
        lambert_in = s.normal.dot(new_dir)
        f = brdf.eval_brdf(s, new_dir)
        scale = jnp.where(pdf > 1e-12, lambert_in / jnp.maximum(pdf, 1e-12),
                          0.0)
        new_throughput = throughput * (f * scale)

        survive = is_hit & (lambert_in > 0.0) & (pdf > 1e-12)
        new_o = s.position + s.normal * config.ray_eps  # main.glsl:385
        ray_o = vwhere(survive, new_o, ray_o)
        ray_d = vwhere(survive, new_dir, ray_d)
        throughput = vwhere(survive, new_throughput, throughput)
        active = survive
        return (ray_o, ray_d, throughput, radiance, active, seed, depth,
                steps, segments)

    # Carries derive from `ray` arithmetically so they inherit its
    # varying-axes type under shard_map (cf. HitInfo.none_like).
    zero_n = ray.o.x * 0.0
    one3 = Vec3(zero_n + 1.0, zero_n + 1.0, zero_n + 1.0)
    zero3 = Vec3(zero_n, zero_n, zero_n)
    init = (ray.o, ray.d, one3, zero3,
            zero_n.astype(bool) | True, seed,
            zero_n + f32(far), zero_n.astype(jnp.int32),
            zero_n.astype(jnp.int32))
    (_, _, _, radiance, _, _, depth, steps, segments) = jax.lax.fori_loop(
        0, config.bounces, body, init)
    return PathTraceResult(radiance=radiance, depth=depth, steps=steps,
                           segments=segments)
