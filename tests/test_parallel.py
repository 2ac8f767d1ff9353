"""Multi-device sharding tests on the virtual 8-device CPU mesh.

The key invariant (SURVEY §7 hard part #5): a render is bit-identical
across mesh shapes, because every random draw is a pure function of
(seed, global pixel id, global sample index) — never of the schedule.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mrt.core.camera import Camera
from mrt.geometry.scene import Scene
from mrt.geometry.spheres import Spheres
from mrt.materials.table import MaterialBuilder
from mrt.materials.background import SkyBackground
from mrt.parallel.mesh import make_mesh
from mrt.parallel.render import render_sharded
from mrt.runtime.render import render


def _scene():
    b = MaterialBuilder()
    ground = b.lambertian((0.5, 0.5, 0.5))
    metal = b.metal(0.1, (0.8, 0.7, 0.6))
    glass = b.dielectric(1.5)
    return Scene(
        materials=b.build(),
        background=SkyBackground.create(),
        spheres=Spheres(
            center=jnp.asarray([[0, -100.5, -1], [-0.6, 0, -1.5],
                                [0.6, 0, -1.5]], jnp.float32),
            radius=jnp.asarray([100.0, 0.5, 0.5]),
            material=jnp.asarray([ground, metal, glass], jnp.int32),
        ))


def _camera():
    return Camera.create(60.0, (0, 0.3, 1), (0, 0, -1.5), (0, 1, 0),
                         aspect_ratio=1.0)


@pytest.fixture(scope="module")
def reference_render():
    scene, camera = _scene(), _camera()
    film = render(scene, camera, 16, 16, spp=8, max_depth=6, seed=7)
    return np.asarray(film.sum), np.asarray(film.depth_sum)


@pytest.mark.parametrize("tile,spp", [(8, 1), (4, 2), (2, 4), (1, 8)])
def test_mesh_shapes_match_single_device(reference_render, tile, spp):
    assert len(jax.devices()) >= 8, "conftest must force 8 CPU devices"
    scene, camera = _scene(), _camera()
    mesh = make_mesh(tile=tile, spp=spp)
    film = render_sharded(scene, camera, 16, 16, mesh, spp=8, max_depth=6,
                          seed=7)
    ref_sum, ref_depth = reference_render
    np.testing.assert_allclose(np.asarray(film.sum), ref_sum,
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(film.depth_sum), ref_depth)
    assert int(film.samples) == 8


def test_film_is_row_sharded():
    scene, camera = _scene(), _camera()
    mesh = make_mesh(tile=8, spp=1)
    film = render_sharded(scene, camera, 16, 16, mesh, spp=2, max_depth=4)
    sharding = film.sum.sharding
    assert sharding.is_fully_replicated is False


def test_graft_entry_single_chip():
    import __graft_entry__
    fn, args = __graft_entry__.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)


def test_graft_dryrun_multichip():
    import __graft_entry__
    __graft_entry__.dryrun_multichip(8)


@pytest.mark.parametrize("tile,spp", [(8, 1), (4, 2), (2, 4)])
def test_sharded_persistent_matches(reference_render, tile, spp):
    from mrt.parallel.render import (render_pass_sharded_persistent,
                                     shard_film)
    from mrt.runtime.film import Film

    scene, camera = _scene(), _camera()
    mesh = make_mesh(tile=tile, spp=spp)
    film = shard_film(Film.create(16, 16), mesh)
    fn = jax.jit(lambda s, c, f: render_pass_sharded_persistent(
        s, c, f, 7, 0, width=16, height=16, samples=8, max_depth=6,
        mesh=mesh, pool=512))
    film = fn(scene, camera, film)
    ref_sum, ref_depth = reference_render
    np.testing.assert_allclose(np.asarray(film.sum), ref_sum,
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_array_equal(np.asarray(film.depth_sum), ref_depth)
    assert int(film.samples) == 8
