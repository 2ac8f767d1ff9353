"""Next-event estimation: unbiasedness vs BSDF-only + variance wins."""

import numpy as np
import jax.numpy as jnp

from mrt.core.camera import Camera
from mrt.geometry.scene import SceneBuilder, attach_lights
from mrt.geometry.shapes import cube, quad
from mrt.materials.table import MaterialBuilder
from mrt.materials.background import SolidBackground
from mrt.materials.lights import collect_lights, SPHERE, TRI
from mrt.runtime.render import render


def _box_scene(nee):
    """Small closed box with a ceiling panel light."""
    mat = MaterialBuilder()
    white = mat.lambertian((0.75, 0.75, 0.75))
    red = mat.lambertian((0.8, 0.2, 0.2))
    light = mat.diffuse_light((12.0, 12.0, 12.0))

    sb = SceneBuilder(mat, SolidBackground.create((0, 0, 0)))
    mesh = sb.add_mesh(cube(size=2.0))
    s = 4.0
    sb.add_instance(mesh, (-s - 1, 0, 0), scale=(1, s, s), material=red)
    sb.add_instance(mesh, (s + 1, 0, 0), scale=(1, s, s), material=white)
    sb.add_instance(mesh, (0, -s - 1, 0), scale=(s, 1, s), material=white)
    sb.add_instance(mesh, (0, s + 1, 0), scale=(s, 1, s), material=white)
    sb.add_instance(mesh, (0, 0, -s - 1), scale=(s, s, 1), material=white)
    # Small ceiling light panel.
    sb.add_instance(mesh, (0, s - 0.01, 0), scale=(1.0, 0.01, 1.0),
                    material=light)
    scene = sb.build(nee=nee)
    camera = Camera.create(55.0, (0, 0, 2 * s), (0, 0, 0), (0, 1, 0),
                           aspect_ratio=1.0, focus_distance=2 * s)
    return scene, camera


def test_light_collection():
    scene, _ = _box_scene(nee=True)
    assert scene.lights is not None
    kinds = np.asarray(scene.lights.kind)
    assert (kinds == TRI).sum() == 12       # the light cube's triangles
    assert np.asarray(scene.lights.area).max() > 0

    # Sphere lights collect too.
    mat = MaterialBuilder()
    sun = mat.diffuse_light((10, 10, 10))
    sb = SceneBuilder(mat, SolidBackground.create((0, 0, 0)))
    sb.add_sphere((100, 100, 0), 5.0, sun)
    s2 = sb.build(nee=True)
    assert int(np.asarray(s2.lights.kind)[0]) == SPHERE


def test_nee_unbiased_and_lower_variance():
    w = h = 12
    scene_b, camera = _box_scene(nee=False)
    scene_n, _ = _box_scene(nee=True)

    # Many independent low-spp renders: compare estimator mean/variance.
    means_b, means_n = [], []
    for seed in range(6):
        fb = render(scene_b, camera, w, h, spp=48, max_depth=5,
                    seed=seed)
        fn = render(scene_n, camera, w, h, spp=48, max_depth=5,
                    seed=seed + 100)
        means_b.append(np.asarray(fb.mean()))
        means_n.append(np.asarray(fn.mean()))
    mb = np.stack(means_b)
    mn = np.stack(means_n)

    # Same expectation (Monte Carlo tolerance): compare run-averaged
    # images on the interior (avoid near-black corners' relative noise).
    avg_b = mb.mean(0)
    avg_n = mn.mean(0)
    bright = avg_n.mean(-1) > 0.05
    rel = (np.abs(avg_b - avg_n).mean(-1)[bright]
           / (avg_n.mean(-1)[bright] + 0.05))
    assert np.median(rel) < 0.25, f"median rel diff {np.median(rel)}"

    # NEE slashes the pixelwise variance across runs.
    var_b = mb.var(axis=0).mean()
    var_n = mn.var(axis=0).mean()
    assert var_n < var_b * 0.5, f"var {var_n} vs {var_b}"


def test_persistent_nee_matches_batched():
    from mrt.runtime.film import Film
    from mrt.runtime.render import render_pass, render_pass_persistent

    scene, camera = _box_scene(nee=True)
    w = h = 10
    batch = render_pass(scene, camera, Film.create(w, h), 3, 0,
                        width=w, height=h, max_depth=4, samples=4)
    pers = render_pass_persistent(scene, camera, Film.create(w, h), 3, 0,
                                  width=w, height=h, max_depth=4,
                                  samples=4, pool=128)
    np.testing.assert_allclose(np.asarray(pers.sum),
                               np.asarray(batch.sum), rtol=3e-4,
                               atol=3e-4)


def _specular_box(nee):
    """Box with a Specular (clear-coat) floor: round-1 NEE skipped all
    non-Lambertian rows; MIS-NEE fires on the Lambertian arm."""
    mat = MaterialBuilder()
    white = mat.lambertian((0.75, 0.75, 0.75))
    coat = mat.specular(1.5, (0.7, 0.6, 0.5))
    light = mat.diffuse_light((12.0, 12.0, 12.0))

    sb = SceneBuilder(mat, SolidBackground.create((0, 0, 0)))
    mesh = sb.add_mesh(cube(size=2.0))
    s = 4.0
    sb.add_instance(mesh, (0, -s - 1, 0), scale=(s, 1, s), material=coat)
    sb.add_instance(mesh, (-s - 1, 0, 0), scale=(1, s, s), material=white)
    sb.add_instance(mesh, (s + 1, 0, 0), scale=(1, s, s), material=white)
    sb.add_instance(mesh, (0, 0, -s - 1), scale=(s, s, 1), material=white)
    sb.add_instance(mesh, (0, s - 0.01, 0), scale=(1.0, 0.01, 1.0),
                    material=light)
    scene = sb.build(nee=nee)
    camera = Camera.create(55.0, (0, 0, 2 * s), (0, -1.0, 0), (0, 1, 0),
                           aspect_ratio=1.0, focus_distance=2 * s)
    return scene, camera


def test_mis_nee_on_specular_lambertian_arm():
    """MIS-NEE covers the Specular material's diffuse arm: unbiased vs
    BSDF-only, and much lower variance (round 1 gated NEE on
    mtype==LAMBERTIAN, leaving specular floors noisy)."""
    w = h = 12
    scene_b, camera = _specular_box(nee=False)
    scene_n, _ = _specular_box(nee=True)

    # Low-variance BSDF-only reference (one big render) vs the average
    # of a few cheap MIS-NEE renders: same expectation.
    ref = np.asarray(render(scene_b, camera, w, h, spp=768, max_depth=5,
                            seed=0).mean())
    means_b, means_n = [], []
    for seed in range(6):
        fb = render(scene_b, camera, w, h, spp=24, max_depth=5,
                    seed=seed + 1)
        fn = render(scene_n, camera, w, h, spp=24, max_depth=5,
                    seed=seed + 100)
        means_b.append(np.asarray(fb.mean()))
        means_n.append(np.asarray(fn.mean()))
    mb = np.stack(means_b)
    mn = np.stack(means_n)

    avg_n = mn.mean(0)
    bright = ref.mean(-1) > 0.05
    rel = (np.abs(ref - avg_n).mean(-1)[bright]
           / (ref.mean(-1)[bright] + 0.05))
    assert np.median(rel) < 0.25, f"median rel diff {np.median(rel)}"

    var_b = mb.var(axis=0).mean()
    var_n = mn.var(axis=0).mean()
    assert var_n < var_b * 0.5, f"var {var_n} vs {var_b}"


def test_mis_big_light_no_penalty():
    """With a light dominating the view, BSDF sampling is already good;
    MIS must stay unbiased (the round-1 split estimator zeroed BSDF
    emission after NEE vertices, which over-weighted the light sample
    for huge lights)."""
    mat = MaterialBuilder()
    white = mat.lambertian((0.7, 0.7, 0.7))
    light = mat.diffuse_light((4.0, 4.0, 4.0))
    sb = SceneBuilder(mat, SolidBackground.create((0, 0, 0)))
    mesh = sb.add_mesh(cube(size=2.0))
    sb.add_instance(mesh, (0, -2, 0), scale=(6, 1, 6), material=white)
    # Huge ceiling light covering most of the hemisphere.
    sb.add_instance(mesh, (0, 4, 0), scale=(6, 0.1, 6), material=light)
    camera = Camera.create(60.0, (0, 0.5, 6), (0, 0, 0), (0, 1, 0),
                           aspect_ratio=1.0, focus_distance=6.0)

    w = h = 10
    f_b = render(sb.build(nee=False), camera, w, h, spp=96, max_depth=4,
                 seed=7)
    f_n = render(sb.build(nee=True), camera, w, h, spp=96, max_depth=4,
                 seed=11)
    a, b = np.asarray(f_b.mean()), np.asarray(f_n.mean())
    bright = a.mean(-1) > 0.1
    rel = np.abs(a - b).mean(-1)[bright] / (a.mean(-1)[bright] + 0.05)
    assert np.median(rel) < 0.2, f"median rel diff {np.median(rel)}"
