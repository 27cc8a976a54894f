"""Fused megakernel (interpret mode) vs wavefront integrator parity.

Same RNG streams and math modules → images agree except on exact
edge-epsilon ties (borderline u≈0 hits where f32 accumulation order
decides), which are rare isolated pixels.
"""

import numpy as np
import jax.numpy as jnp

from gdpathtracing_tpu.config import Jitter, RenderConfig, Traversal
from gdpathtracing_tpu.core import rng
from gdpathtracing_tpu.ops.fused_pallas import (fused_supported,
                                                path_trace_fused)
from gdpathtracing_tpu.render.integrator import path_trace
from gdpathtracing_tpu.scene.demo import (build_cornell_simple,
                                          build_demo_scene, demo_camera)

RES = 24


def _trace_pair(scene, bounces):
    cam = demo_camera(RES, RES)
    cfg = RenderConfig(bounces=bounces, spp=1, traversal=Traversal.UNIT,
                       jitter=Jitter.NONE)
    pids = jnp.arange(RES * RES, dtype=jnp.int32)
    seed = rng.prng_seed((pids % RES).astype(jnp.uint32),
                         (pids // RES).astype(jnp.uint32), 0)
    ray, seed = cam.generate_rays(pids, seed, cfg)
    ref = path_trace(scene, ray, seed, cfg, far=cam.far)
    fused = path_trace_fused(scene, ray, seed,
                             cfg.replace(traversal=Traversal.FUSED),
                             far=cam.far, interpret=True)
    return ref, fused


def test_fused_supported_gating():
    scene = build_cornell_simple()
    assert fused_supported(scene, RenderConfig())
    assert not fused_supported(scene, RenderConfig(nee=True))


def test_fused_matches_wavefront():
    scene = build_cornell_simple()
    for bounces in (1, 3):
        ref, fused = _trace_pair(scene, bounces)
        a = np.asarray(ref.radiance.to_array())
        b = np.asarray(fused.radiance.to_array())
        per_ray_ok = np.abs(a - b).max(axis=1) < 1e-3
        assert per_ray_ok.mean() > 0.99, per_ray_ok.mean()
        assert abs(a.mean() - b.mean()) < 5e-3
        d_ok = np.abs(np.asarray(ref.depth) - np.asarray(fused.depth)) < 1e-2
        assert d_ok.mean() > 0.99
        assert (np.asarray(ref.segments)
                == np.asarray(fused.segments)).mean() > 0.99


def test_fused_demo_scene():
    scene = build_demo_scene(texture_resolution=8, sphere_detail=6, geometry="sphere")
    ref, fused = _trace_pair(scene, 2)
    a = np.asarray(ref.radiance.to_array())
    b = np.asarray(fused.radiance.to_array())
    assert np.isfinite(b).all()
    per_ray_ok = np.abs(a - b).max(axis=1) < 1e-3
    assert per_ray_ok.mean() > 0.99, per_ray_ok.mean()
    # normals AOV populated
    n = np.asarray(fused.normal.to_array())
    lens = np.linalg.norm(n, axis=1)
    hitm = np.asarray(fused.depth) < 999
    assert np.allclose(lens[hitm], 1.0, atol=1e-3)
