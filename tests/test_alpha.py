"""Alpha-test cutouts: rays pass through zero-alpha texels
(reference: geom.rs:567-571 + material.rs:222-225)."""

import numpy as np
import jax.numpy as jnp

from mrt.geometry.scene import Scene, SceneBuilder
from mrt.geometry.shapes import quad
from mrt.materials.table import MaterialBuilder
from mrt.materials.background import SolidBackground
from mrt.math.rng import Sampler
from mrt.textures.atlas import AtlasBuilder, CLAMP


def _cutout_scene():
    """Front quad with left half transparent (alpha 0), solid quad
    behind it."""
    atlas = AtlasBuilder()
    # Alpha bilinearly interpolates before the != 0 test (the reference
    # samples get_f then tests w, material.rs:222-225), so the
    # transparent zone must span whole texels: alphas [0,0,0,1].
    px = np.zeros((1, 4, 4), np.float32)
    px[..., 0] = 1.0
    px[0, 3, 3] = 1.0
    tex = atlas.add_raw(px, wrap=CLAMP)

    mats = MaterialBuilder()
    front = mats.lambertian(tex=tex)
    back = mats.lambertian((0.0, 0.0, 1.0))

    sb = SceneBuilder(mats, SolidBackground.create((0, 0, 0)),
                      atlas=atlas.build())
    sb.add_triangles(quad((-1.0, -1.0, 2.0), (2.0, 0.0, 0.0),
                          (0.0, 2.0, 0.0), material=front))
    sb.add_triangles(quad((-1.0, -1.0, 4.0), (2.0, 0.0, 0.0),
                          (0.0, 2.0, 0.0), material=back))
    return sb.build()


def test_transparent_texel_passes_through():
    scene = _cutout_scene()
    assert scene.needs_alpha
    # Two rays down +z: left one through the transparent half, right one
    # into the opaque half.  The quad's UV u=0 at x=-1, u=1 at x=1;
    # alpha texel boundary at u=0.5.
    o = jnp.asarray([[-0.9, -0.5, 0.0], [0.9, -0.5, 0.0]])
    d = jnp.asarray([[0.0, 0.0, 1.0], [0.0, 0.0, 1.0]])
    sampler = Sampler(0, jnp.arange(2, dtype=jnp.uint32))
    hits = scene.intersect(o, d, sampler=sampler)
    assert bool(hits.hit[0]) and bool(hits.hit[1])
    # Left ray sees the BACK quad (t=4); right ray the front (t=2).
    assert np.isclose(float(hits.t[0]), 4.0, atol=1e-4)
    assert np.isclose(float(hits.t[1]), 2.0, atol=1e-4)
    assert int(hits.material[0]) != int(hits.material[1])


def test_opaque_material_unaffected():
    mats = MaterialBuilder()
    solid = mats.lambertian((1.0, 0.5, 0.2))
    assert not mats.may_alpha_test()
    mats2 = MaterialBuilder()
    mats2.lambertian(tex=0)
    assert mats2.may_alpha_test()


def test_mix_reaching_textured_row_flags():
    mats = MaterialBuilder()
    textured = mats.lambertian(tex=3)
    null = mats.null()
    mats.mix(0.5, null, textured)
    assert mats.may_alpha_test()
