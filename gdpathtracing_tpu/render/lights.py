"""Emissive-triangle light sampling (NEE) — reference wishlist item
("Add NEE/Direct light sampling", README.md:36); no reference counterpart.

The light table is derived from the scene arrays inside the jitted step
(cheap: L is small), so it stays correct under dynamic instance updates.
Emitters are double-sided, matching the reference's emission pickup (which
adds s.emission regardless of facing, main.glsl:380).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from gdpathtracing_tpu.core.math3d import affine_apply_point
from gdpathtracing_tpu.core.vec import Vec3
from gdpathtracing_tpu.scene.scene import Scene

_EPS = 1e-8


class LightTable(NamedTuple):
    v0: Vec3          # (L,) world-space triangle vertices
    v1: Vec3
    v2: Vec3
    normal: Vec3      # (L,) unit geometric normal
    area: jnp.ndarray
    emission: Vec3    # (L,) radiance (rgb * energy)
    pick_prob: jnp.ndarray  # (L,)
    cdf: jnp.ndarray        # (L,)


def build_light_table(scene: Scene) -> "LightTable | None":
    """World-space emitter table, or None when the scene has no lights."""
    if scene.n_lights == 0:
        return None
    inst = scene.light_inst
    tri = scene.light_tri
    tf = scene.inst_transform[inst]             # (L, 3, 4)
    pos = scene.tri_pos[tri]                    # (L, 3, 3)

    def vert(k):
        return affine_apply_point(
            tf, Vec3(pos[:, k, 0], pos[:, k, 1], pos[:, k, 2]))

    v0, v1, v2 = vert(0), vert(1), vert(2)
    n = (v1 - v0).cross(v2 - v0)
    nl = n.length()
    area = 0.5 * nl
    normal = n * (1.0 / jnp.maximum(nl, _EPS))

    slot = jnp.minimum(scene.tri_slot[tri], scene.inst_materials.shape[1] - 1)
    mat = scene.inst_materials[inst, slot]
    energy = jnp.maximum(0.0, scene.mat_emission_energy[mat])
    emission = Vec3(scene.mat_emission[mat, 0] * energy,
                    scene.mat_emission[mat, 1] * energy,
                    scene.mat_emission[mat, 2] * energy)

    power = area * emission.luminance()
    total = jnp.maximum(jnp.sum(power), _EPS)
    pick = power / total
    cdf = jnp.cumsum(pick)
    return LightTable(v0, v1, v2, normal, area, emission, pick, cdf)


class LightSample(NamedTuple):
    point: Vec3
    normal: Vec3
    emission: Vec3
    pdf_solid: jnp.ndarray  # per-ray solid-angle pdf of the sampled dir
    wi: Vec3                # unit direction shading point → light
    dist: jnp.ndarray


def sample_light(table: LightTable, position: Vec3, r_pick, r1, r2
                 ) -> LightSample:
    """Pick an emitter ∝ power, sample a uniform point on it, convert the
    area pdf to solid angle at `position`."""
    l = jnp.searchsorted(table.cdf, r_pick)
    l = jnp.clip(l, 0, table.cdf.shape[0] - 1)

    def g(v: Vec3) -> Vec3:
        return Vec3(v.x[l], v.y[l], v.z[l])

    v0, v1, v2 = g(table.v0), g(table.v1), g(table.v2)
    su = jnp.sqrt(r1)
    b0 = 1.0 - su
    b1 = r2 * su
    point = v0 * b0 + v1 * b1 + v2 * (1.0 - b0 - b1)
    normal = g(table.normal)
    emission = g(table.emission)

    delta = point - position
    dist2 = jnp.maximum(delta.length_sq(), _EPS)
    dist = jnp.sqrt(dist2)
    wi = delta * (1.0 / dist)
    cos_l = jnp.abs(normal.dot(-wi))  # double-sided emitter
    pdf_solid = dist2 / jnp.maximum(cos_l * table.area[l], _EPS) * \
        table.pick_prob[l]
    pdf_solid = jnp.where(cos_l > 1e-6, pdf_solid, jnp.inf)  # grazing → no light
    return LightSample(point, normal, emission, pdf_solid, wi, dist)


def light_pdf_of_hit(table: LightTable, scene: Scene, hit_inst, hit_tri,
                     ray_dir: Vec3, t) -> jnp.ndarray:
    """Solid-angle pdf that NEE would have assigned to the direction that
    just hit (inst, tri) — the light half of the MIS weight for
    BRDF-sampled emission pickup. 0 when the hit is not an emitter."""
    # match (inst, tri) against the (L,) table
    eq = (scene.light_inst[None, :] == hit_inst[:, None]) & \
        (scene.light_tri[None, :] == hit_tri[:, None])     # (N, L)
    is_light = jnp.any(eq, axis=1)
    l = jnp.argmax(eq, axis=1)
    cos_l = jnp.abs(Vec3(table.normal.x[l], table.normal.y[l],
                         table.normal.z[l]).dot(-ray_dir))
    dist2 = jnp.maximum(t * t, _EPS)
    pdf = dist2 / jnp.maximum(cos_l * table.area[l], _EPS) * \
        table.pick_prob[l]
    return jnp.where(is_light & (cos_l > 1e-6), pdf, 0.0)
