"""Golden-image regression: a fixed-seed low-res Cornell render must stay
stable (guards against silent light-transport changes). Regenerate with
`python tests/test_golden.py` after INTENTIONAL transport changes."""

from pathlib import Path

import numpy as np

from gdpathtracing_tpu.config import Jitter, RenderConfig, Traversal
from gdpathtracing_tpu.render.renderer import render_radiance
from gdpathtracing_tpu.scene.demo import build_cornell_simple, demo_camera

GOLDEN = Path(__file__).parent / "data" / "golden_cornell_16.npz"
CFG = RenderConfig(bounces=3, spp=4, traversal=Traversal.BRUTE,
                   jitter=Jitter.NONE)


def _render():
    scene = build_cornell_simple()
    cam = demo_camera(16, 16)
    return np.asarray(render_radiance(scene, cam, CFG, 0).radiance)


def test_golden_cornell():
    img = _render()
    if not GOLDEN.exists():
        raise AssertionError("golden file missing — run this module as a "
                             "script to generate it")
    ref = np.load(GOLDEN)["image"]
    # CPU float math is deterministic given fixed seeds; allow tiny
    # cross-backend wiggle.
    assert np.allclose(img, ref, rtol=2e-3, atol=2e-3), \
        float(np.abs(img - ref).max())


if __name__ == "__main__":
    import jax
    jax.config.update("jax_platforms", "cpu")
    GOLDEN.parent.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(GOLDEN, image=_render())
    print(f"wrote {GOLDEN}")
