"""Multi-chip tests on the virtual 8-device CPU mesh (SURVEY.md §4f):
sharded render == single-device render bit-for-bit; graft entry dryrun."""

import numpy as np
import jax

from gdpathtracing_tpu.config import Jitter, RenderConfig, Traversal
from gdpathtracing_tpu.parallel.sharding import (make_mesh,
                                                 render_radiance_sharded)
from gdpathtracing_tpu.render.renderer import render_radiance
from gdpathtracing_tpu.scene.demo import build_cornell_simple, demo_camera


def test_eight_virtual_devices():
    assert len(jax.devices()) == 8


def test_sharded_matches_single_device_bitwise():
    scene = build_cornell_simple()
    cam = demo_camera(40, 24)  # 960 px, not divisible by 8 evenly in w
    cfg = RenderConfig(bounces=2, spp=1, traversal=Traversal.BRUTE,
                       jitter=Jitter.UNIFORM)
    single = render_radiance(scene, cam, cfg, frame_index=3)
    mesh = make_mesh(jax.devices())
    sharded = render_radiance_sharded(scene, cam, cfg, 3, mesh)
    a = np.asarray(single.radiance)
    b = np.asarray(sharded.radiance)
    # Same per-pixel RNG streams (keyed by pixel+frame, not chip) → the
    # sharded image must match the single-device one bit-for-bit.
    assert np.array_equal(a, b), np.abs(a - b).max()
    assert np.array_equal(np.asarray(single.depth), np.asarray(sharded.depth))


def test_sharded_odd_sizes():
    scene = build_cornell_simple()
    cam = demo_camera(13, 7)  # 91 px: forces padding
    cfg = RenderConfig(bounces=1, spp=1, traversal=Traversal.BRUTE)
    mesh = make_mesh(jax.devices())
    sharded = render_radiance_sharded(scene, cam, cfg, 0, mesh)
    single = render_radiance(scene, cam, cfg, 0)
    assert np.array_equal(np.asarray(single.radiance),
                          np.asarray(sharded.radiance))


def test_graft_entry_and_dryrun():
    import importlib.util
    import pathlib
    spec = importlib.util.spec_from_file_location(
        "__graft_entry__",
        pathlib.Path(__file__).resolve().parent.parent / "__graft_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    fn, args = mod.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (64, 64, 3)
    assert np.isfinite(np.asarray(out)).all()

    mod.dryrun_multichip(8)
