"""Volumes over arbitrary mesh boundaries (geom.rs:595-660 Volume<I>).

Round 1 supported sphere bounds only; MeshVolume reproduces the general
capability with entry/exit from two TLAS traversals.
"""

import numpy as np
import jax.numpy as jnp

from mrt.geometry.scene import SceneBuilder
from mrt.geometry.shapes import cube, sphere_mesh
from mrt.materials.table import MaterialBuilder
from mrt.materials.background import SolidBackground
from mrt.math.rng import Sampler


def _scene_with(add_volume):
    mat = MaterialBuilder()
    sb = SceneBuilder(mat, SolidBackground.create((0, 0, 0)))
    add_volume(sb, mat)
    return sb.build()


def test_cube_volume_scatter_probability():
    """Rays through a unit-density cube: P(scatter) = 1 - exp(-rho * L)
    with L the chord length (exact free-flight law, geom.rs:636-644)."""
    rho = 0.8
    scene = _scene_with(lambda sb, m: sb.add_volume_mesh(
        cube(size=2.0), rho, (0.5, 0.5, 0.5)))

    n = 1 << 14
    o = jnp.tile(jnp.asarray([[0.0, 0.0, 5.0]]), (n, 1))
    d = jnp.tile(jnp.asarray([[0.0, 0.0, -2.0]]), (n, 1))  # unnormalised
    s = Sampler(3, jnp.arange(n, dtype=jnp.uint32))
    hits = scene.intersect(o, d, sampler=s)
    p_hit = float(np.asarray(hits.hit).mean())
    expect = 1.0 - np.exp(-rho * 2.0)   # chord = 2 (cube spans +-1)
    assert abs(p_hit - expect) < 0.02, (p_hit, expect)
    # Scatter points lie inside the cube along the ray.
    z = np.asarray(hits.point)[np.asarray(hits.hit)][:, 2]
    assert z.max() <= 1.0 + 1e-4 and z.min() >= -1.0 - 1e-4


def test_mesh_volume_matches_analytic_sphere():
    """A finely tessellated sphere-mesh volume reproduces the analytic
    sphere volume's scatter statistics."""
    rho = 0.5

    mesh_scene = _scene_with(lambda sb, m: sb.add_volume_mesh(
        sphere_mesh((0.0, 0.0, 0.0), 1.0, lat=48, lon=96), rho,
        (0.5, 0.5, 0.5)))
    sph_scene = _scene_with(lambda sb, m: sb.add_volume_sphere(
        (0.0, 0.0, 0.0), 1.0, rho, (0.5, 0.5, 0.5)))

    n = 1 << 14
    rng = np.random.default_rng(0)
    # Random rays aimed through the ball.
    o = rng.normal(size=(n, 3)).astype(np.float32)
    o = 5.0 * o / np.linalg.norm(o, axis=1, keepdims=True)
    target = rng.uniform(-0.6, 0.6, (n, 3)).astype(np.float32)
    o = jnp.asarray(o)
    d = jnp.asarray(target) - o

    res = {}
    for name, scene in (("mesh", mesh_scene), ("sph", sph_scene)):
        s = Sampler(7, jnp.arange(n, dtype=jnp.uint32))
        hits = scene.intersect(o, d, sampler=s)
        h = np.asarray(hits.hit)
        res[name] = (h.mean(), np.asarray(hits.t)[h].mean())
    assert abs(res["mesh"][0] - res["sph"][0]) < 0.03, res
    assert abs(res["mesh"][1] - res["sph"][1]) < 0.05, res


def test_transformed_mesh_volume():
    """The boundary instance transform applies (scaled+translated)."""
    rho = 5.0
    scene = _scene_with(lambda sb, m: sb.add_volume_mesh(
        cube(size=2.0), rho, (0.5, 0.5, 0.5),
        translation=(10.0, 0.0, 0.0), scale=(2.0, 1.0, 1.0)))
    n = 1024
    o = jnp.tile(jnp.asarray([[10.0, 0.0, 5.0]]), (n, 1))
    d = jnp.tile(jnp.asarray([[0.0, 0.0, -1.0]]), (n, 1))
    s = Sampler(5, jnp.arange(n, dtype=jnp.uint32))
    hits = scene.intersect(o, d, sampler=s)
    assert np.asarray(hits.hit).mean() > 0.95  # dense volume: ~all scatter
    # Miss rays offset beyond the scaled boundary (|x-10| > 2).
    o2 = o.at[:, 0].set(13.0)
    hits2 = scene.intersect(o2, d, sampler=Sampler(
        5, jnp.arange(n, dtype=jnp.uint32)))
    assert not np.asarray(hits2.hit).any()
