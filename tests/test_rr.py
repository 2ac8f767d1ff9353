"""Russian roulette: unbiased early termination of deep paths."""

import numpy as np
import jax.numpy as jnp

from mrt.core.camera import Camera
from mrt.geometry.scene import Scene
from mrt.geometry.spheres import Spheres
from mrt.materials.table import MaterialBuilder
from mrt.materials.background import SolidBackground
from mrt.runtime.film import Film
from mrt.runtime.render import render_pass, render_pass_persistent


def _furnace():
    """Camera enclosed in a bright-albedo sphere with a light ball:
    without RR every path runs to max_depth."""
    b = MaterialBuilder()
    wall = b.lambertian((0.9, 0.9, 0.9))
    light = b.diffuse_light((2.0, 2.0, 2.0))
    return Scene(
        materials=b.build(),
        background=SolidBackground.create((0, 0, 0)),
        spheres=Spheres(
            center=jnp.asarray([[0.0, 0.0, 0.0], [0.0, 3.0, -3.0]],
                               jnp.float32),
            radius=jnp.asarray([50.0, 1.0]),
            material=jnp.asarray([wall, light], jnp.int32)))


def _camera():
    return Camera.create(70.0, (0, 0, 4), (0, 0, -2), (0, 1, 0),
                         aspect_ratio=1.0)


def test_rr_unbiased_and_shortens_paths():
    scene, camera = _furnace(), _camera()
    w = h = 12
    spp = 48
    depth = 20
    base = render_pass(scene, camera, Film.create(w, h), 1, 0, width=w,
                       height=h, max_depth=depth, samples=spp)
    rr = render_pass(scene, camera, Film.create(w, h), 2, 0, width=w,
                     height=h, max_depth=depth, samples=spp, rr_depth=3)

    mb = float(np.asarray(base.mean()).mean())
    mr = float(np.asarray(rr.mean()).mean())
    # Same expectation within Monte Carlo noise.
    assert abs(mb - mr) / mb < 0.1, (mb, mr)
    # Mean path length drops sharply (enclosed scene: base ~ depth).
    assert int(rr.depth_sum.sum()) < int(base.depth_sum.sum()) * 0.7


def test_rr_persistent_matches_batched():
    scene, camera = _furnace(), _camera()
    w = h = 10
    batch = render_pass(scene, camera, Film.create(w, h), 5, 0, width=w,
                        height=h, max_depth=12, samples=4, rr_depth=2)
    pers = render_pass_persistent(
        scene, camera, Film.create(w, h), 5, 0, width=w, height=h,
        max_depth=12, samples=4, pool=128, rr_depth=2)
    np.testing.assert_allclose(np.asarray(pers.sum),
                               np.asarray(batch.sum), rtol=3e-4,
                               atol=3e-4)
    np.testing.assert_array_equal(np.asarray(pers.depth_sum),
                                  np.asarray(batch.depth_sum))
