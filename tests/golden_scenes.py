"""Scene factories for the golden-image suite (shared by the goldens
generator tools/make_goldens.py and tests/test_golden.py).

Each factory covers a distinct render path where regressions are likely
(VERDICT round-1: the sole rtiow golden covered spheres+sky only):
  rtiow        spheres + sky + defocus (the original golden)
  cornell      TLAS + instances + area light + dielectric
  textured     texture atlas + bilinear + alpha-cutout re-cast
  eve_ball     EVE packed-PBR decode + palettes + glow + normal maps
  volume       participating medium (sphere + mesh bounds) + light
  cornell_nee  MIS next-event estimation path
  menger2      baked sponge block + TLAS + cube-map environment
"""

import numpy as np

from mrt.core.camera import Camera
from mrt.geometry.scene import SceneBuilder
from mrt.geometry.shapes import cube, quad, sphere_mesh
from mrt.materials.table import MaterialBuilder
from mrt.materials.background import SkyBackground, SolidBackground
from mrt.scenes import get

SPP = 8
DEPTH = 6
SIZE = 24
SEED = 5


def rtiow():
    return get("rtiow")(aspect_ratio=1.0, grid=5).generate()


def cornell():
    return get("cornell")(aspect_ratio=1.0).generate()


def cornell_nee():
    from mrt.geometry.scene import attach_lights

    scene, camera = get("cornell")(aspect_ratio=1.0).generate()
    return attach_lights(scene), camera


def menger2():
    return get("menger")(aspect_ratio=1.0, level=2, bake=1,
                         voxel=False).generate()


def menger2_voxel():
    return get("menger")(aspect_ratio=1.0, level=2).generate()


def textured():
    from mrt.textures.atlas import AtlasBuilder, REPEAT

    mat = MaterialBuilder()
    atlas = AtlasBuilder()
    rng = np.random.default_rng(3)
    # Checkerboard with alpha holes: exercises bilinear + alpha re-cast.
    tex = np.zeros((16, 16, 4), np.float32)
    yy, xx = np.mgrid[0:16, 0:16]
    checker = ((yy // 4 + xx // 4) % 2).astype(np.float32)
    tex[..., 0] = 0.2 + 0.7 * checker
    tex[..., 1] = 0.5
    tex[..., 2] = 0.9 - 0.7 * checker
    tex[..., 3] = 1.0
    tex[4:8, 4:8, 3] = 0.0          # cutout window
    tid = atlas.add_raw(tex, wrap=REPEAT)
    textured_row = mat.lambertian(tex=tid)
    back = mat.lambertian((0.9, 0.6, 0.3))

    sb = SceneBuilder(mat, SkyBackground.create(), atlas=None)
    sb.add_triangles(quad((-1.5, -1.5, -2.0), (3, 0, 0), (0, 3, 0),
                          material=textured_row))
    sb.add_triangles(quad((-3, -3, -4.0), (6, 0, 0), (0, 6, 0),
                          material=back))
    scene = sb.build().replace(atlas=atlas.build())
    # needs_alpha is computed at build() before the atlas attach.
    scene = scene.replace(needs_alpha=True)
    camera = Camera.create(60.0, (0, 0, 2.5), (0, 0, -2), (0, 1, 0),
                           1.0, focus_distance=4.5)
    return scene, camera


def eve_ball():
    from mrt.textures.atlas import AtlasBuilder
    from mrt.scenes.eve import _synth_packed_textures, PALETTES, GLOW

    mat = MaterialBuilder()
    atlas = AtlasBuilder()
    rng = np.random.default_rng(7)
    no, ar, pmdg = _synth_packed_textures(atlas, rng)
    row = mat.eve(ar, no, pmdg, PALETTES["caldari"], glow=GLOW)
    sun = mat.diffuse_light((30.0, 30.0, 33.0))

    sb = SceneBuilder(mat, SolidBackground.create((0.01, 0.01, 0.02)))
    sb.add_model(sphere_mesh((0, 0, 0), 1.0, lat=12, lon=20,
                             material=row))
    sb.add_sphere((30.0, 20.0, 20.0), 8.0, sun)
    scene = sb.build().replace(atlas=atlas.build())
    camera = Camera.create(45.0, (0, 0.6, 3), (0, 0, 0), (0, 1, 0),
                           1.0, focus_distance=3.0)
    return scene, camera


def volume():
    mat = MaterialBuilder()
    light = mat.diffuse_light((18.0, 16.0, 14.0))

    sb = SceneBuilder(mat, SolidBackground.create((0, 0, 0)))
    sb.add_volume_sphere((0.0, 0.0, 0.0), 1.2, 1.2, (0.7, 0.7, 0.75))
    sb.add_volume_mesh(cube(size=2.0), 2.0, (0.8, 0.5, 0.4),
                       translation=(2.2, 0.0, 0.0))
    sb.add_sphere((0.0, 4.0, 2.0), 1.0, light)
    scene = sb.build()
    camera = Camera.create(55.0, (1, 0.5, 5), (1, 0, 0), (0, 1, 0),
                           1.0, focus_distance=5.0)
    return scene, camera


FACTORIES = dict(rtiow=rtiow, cornell=cornell, textured=textured,
                 eve_ball=eve_ball, volume=volume,
                 cornell_nee=cornell_nee, menger2=menger2,
                 menger2_voxel=menger2_voxel)
