"""Megakernel v2 (per-bounce Pallas kernel) parity vs the wavefront
integrator, in interpret mode on CPU.

The MEGA backend re-implements the whole bounce — sweep, winner rows,
shading, NEE light sampling + in-kernel shadow occlusion, MIS, BRDF
sampling — inside one kernel per bounce (ops/megakernel.py). It consumes
the same PCG2D stream in the same order as the wavefront integrator, so a
full render must match Traversal.UNIT to f32 tolerance, with and without
NEE (functional target: the reference's per-pixel program,
main.glsl:372-436)."""

import numpy as np
import pytest

from gdpathtracing_tpu.config import Jitter, RenderConfig, Traversal
from gdpathtracing_tpu.render.renderer import render_radiance
from gdpathtracing_tpu.scene.demo import build_demo_scene, demo_camera


@pytest.fixture(scope="module")
def scene():
    return build_demo_scene(texture_resolution=8, sphere_detail=6,
                            geometry="sphere")


def _interpret(monkeypatch):
    import gdpathtracing_tpu.ops.megakernel as mk
    monkeypatch.setattr(mk, "_FORCE_INTERPRET", True)


@pytest.mark.parametrize("nee", [False, True])
def test_mega_render_matches_unit(scene, monkeypatch, nee):
    _interpret(monkeypatch)
    from gdpathtracing_tpu.ops.megakernel import mega_supported
    cam = demo_camera(24, 16)
    base = dict(bounces=3, spp=1, jitter=Jitter.NONE, nee=nee)
    cfg_mega = RenderConfig(traversal=Traversal.MEGA, **base)
    assert mega_supported(scene, cfg_mega)
    mega = render_radiance(scene, cam, cfg_mega, 0)
    unit = render_radiance(scene, cam, RenderConfig(
        traversal=Traversal.UNIT, **base), 0)
    assert np.allclose(np.asarray(mega.radiance),
                       np.asarray(unit.radiance),
                       rtol=1e-5, atol=1e-5), f"nee={nee}"
    np.testing.assert_array_equal(np.asarray(mega.segments),
                                  np.asarray(unit.segments))
    assert np.allclose(np.asarray(mega.depth), np.asarray(unit.depth),
                       rtol=1e-5, atol=1e-4)
    assert np.allclose(np.asarray(mega.normal), np.asarray(unit.normal),
                       rtol=1e-4, atol=1e-4)


def test_mega_matches_pallas_wavefront_exactly(scene, monkeypatch):
    """MEGA and the wavefront PALLAS path share the sweep kernels and the
    RNG stream; their images should agree to tight f32 tolerance."""
    _interpret(monkeypatch)
    import gdpathtracing_tpu.ops.intersect_pallas as ip
    monkeypatch.setattr(ip, "_FORCE_INTERPRET", True)
    cam = demo_camera(16, 12)
    base = dict(bounces=4, spp=1, jitter=Jitter.UNIFORM)
    mega = render_radiance(scene, cam, RenderConfig(
        traversal=Traversal.MEGA, **base), 3)
    pal = render_radiance(scene, cam, RenderConfig(
        traversal=Traversal.PALLAS, **base), 3)
    assert np.allclose(np.asarray(mega.radiance), np.asarray(pal.radiance),
                       rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(mega.steps),
                                  np.asarray(pal.steps))


@pytest.mark.parametrize("nee", [False, True])
def test_mega_render_matches_unit_with_rr(scene, monkeypatch, nee):
    """Russian roulette in-kernel (VERDICT r2 item 8): rr_start > 0 no
    longer falls outside mega_supported; the in-kernel draw consumes the
    same PCG2D step as the integrator's, so images still match UNIT."""
    _interpret(monkeypatch)
    from gdpathtracing_tpu.ops.megakernel import mega_supported
    cam = demo_camera(24, 16)
    base = dict(bounces=5, spp=1, jitter=Jitter.NONE, nee=nee,
                rr_start=1, rr_min_p=0.05)
    cfg_mega = RenderConfig(traversal=Traversal.MEGA, **base)
    assert mega_supported(scene, cfg_mega)
    mega = render_radiance(scene, cam, cfg_mega, 2)
    unit = render_radiance(scene, cam, RenderConfig(
        traversal=Traversal.UNIT, **base), 2)
    assert np.allclose(np.asarray(mega.radiance),
                       np.asarray(unit.radiance),
                       rtol=1e-5, atol=1e-5), f"nee={nee}"
    np.testing.assert_array_equal(np.asarray(mega.segments),
                                  np.asarray(unit.segments))


def test_mega_steps_aov_counts_swept_triangles(scene, monkeypatch):
    _interpret(monkeypatch)
    cam = demo_camera(16, 12)
    aovs = render_radiance(scene, cam, RenderConfig(
        traversal=Traversal.MEGA, bounces=2, jitter=Jitter.NONE), 0)
    steps = np.asarray(aovs.steps)
    e = scene.isect_mu.shape[1]
    assert (steps >= 0).all() and (steps <= 2 * e).all()
    assert steps.min() < steps.max()


@pytest.mark.parametrize("nee", [False, True])
def test_mega_compaction_bit_transparent(scene, monkeypatch, nee):
    """Stream compaction (config.compact_rays) stable-partitions the packed
    state between bounces; every per-ray output — including the steps AOV,
    which counts the ray's own slab passes — is permutation-invariant, so
    results must be BIT-identical with it on or off."""
    _interpret(monkeypatch)
    cam = demo_camera(48, 32)  # > 4 blocks so tail blocks go all-dead
    base = dict(bounces=4, spp=1, jitter=Jitter.UNIFORM, nee=nee,
                traversal=Traversal.MEGA)
    on = render_radiance(scene, cam, RenderConfig(compact_rays=True,
                                                  **base), 1)
    off = render_radiance(scene, cam, RenderConfig(compact_rays=False,
                                                   **base), 1)
    for field in ("radiance", "depth", "steps", "segments", "normal"):
        np.testing.assert_array_equal(np.asarray(getattr(on, field)),
                                      np.asarray(getattr(off, field)),
                                      err_msg=f"{field} nee={nee}")


def test_mega_supported_gates():
    from gdpathtracing_tpu.ops.megakernel import mega_supported
    from gdpathtracing_tpu.scene.demo import build_sphere_grid
    cfg = RenderConfig(traversal=Traversal.MEGA)
    big = build_sphere_grid(n=4, sphere_detail=12)  # > 16 chunks
    assert not mega_supported(big, cfg)
    with pytest.raises(ValueError):
        from gdpathtracing_tpu.render.integrator import path_trace
        from gdpathtracing_tpu.render.types import Ray
        from gdpathtracing_tpu.core.vec import Vec3
        import jax.numpy as jnp
        z = jnp.zeros(8)
        ray = Ray(Vec3(z, z, z + 10.0), Vec3(z, z, z - 1.0))
        path_trace(big, ray, (z.astype(jnp.uint32), z.astype(jnp.uint32)),
                   cfg)
