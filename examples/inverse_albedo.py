#!/usr/bin/env python
"""Inverse rendering demo: recover a sphere's albedo from a target
image by gradient descent through the path tracer.

    python examples/inverse_albedo.py
"""

import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax.numpy as jnp

from mrt import inverse
from mrt.core.camera import Camera
from mrt.geometry.scene import Scene
from mrt.geometry.spheres import Spheres
from mrt.materials.table import MaterialBuilder
from mrt.materials.background import SkyBackground


def scene_with_albedo(albedo):
    b = MaterialBuilder()
    ground = b.lambertian((0.5, 0.5, 0.5))
    free = b.lambertian((1.0, 1.0, 1.0))
    table = b.build()
    table = table.replace(albedo=table.albedo.at[free, :3].set(albedo))
    return Scene(
        materials=table,
        background=SkyBackground.create(),
        spheres=Spheres(
            center=jnp.asarray([[0.0, -100.5, -2.0], [0.0, 0.0, -2.0]]),
            radius=jnp.asarray([100.0, 0.5]),
            material=jnp.asarray([ground, free], jnp.int32)))


def main():
    camera = Camera.create(60.0, (0, 0, 0), (0, 0, -1), (0, 1, 0),
                           aspect_ratio=1.0)
    true_albedo = jnp.asarray([0.7, 0.2, 0.4])
    target = inverse.render_image(scene_with_albedo(true_albedo), camera,
                                  16, 16, spp=8, seed=11, max_depth=4)

    def progress(i, params, loss):
        if i % 10 == 0:
            print(f"step {i:3d} loss {loss:.5f} albedo "
                  f"{[round(float(x), 3) for x in params]}")

    params, losses = inverse.optimize(
        scene_with_albedo, jnp.asarray([0.3, 0.5, 0.5]), camera, 16, 16,
        target, steps=80, learning_rate=0.05, spp=4, max_depth=4,
        callback=progress)
    print(f"recovered {[round(float(x), 3) for x in params]} "
          f"(true {[round(float(x), 3) for x in true_albedo]})")


if __name__ == "__main__":
    main()
