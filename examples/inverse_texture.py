#!/usr/bin/env python
"""Inverse rendering demo: recover a small TEXTURE (a 4x4 texel
array on a sphere) from a target image by gradient descent through
the path tracer's bilinear sampler and bounce loop.

The texel array is the free parameter: the atlas `data` and the
quad-packed `qdata` are rebuilt in-graph each step, so jax.grad flows
through the exact single-gather bilinear path used by forward renders
(mrt/textures/atlas.py).

    python examples/inverse_texture.py
"""

import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np
import jax.numpy as jnp

from mrt import inverse
from mrt.core.camera import Camera


def quad_scene_factory(size=4):
    """apply(texels) -> Scene: a camera-facing textured quad (uv
    spans [0,1]^2, so every texel is visible), diffuse under a sky."""
    import jax.numpy as jnp

    from mrt.geometry.scene import SceneBuilder, with_atlas
    from mrt.geometry.triangles import Triangles
    from mrt.materials.table import MaterialBuilder
    from mrt.materials.background import SkyBackground
    from mrt.textures.atlas import AtlasBuilder

    b = MaterialBuilder()
    ab = AtlasBuilder()
    tid = ab.add_raw(np.ones((size, size, 4), np.float32))
    textured = b.lambertian((1.0, 1.0, 1.0), tex=tid)
    corners = np.array([[-1, -1, -2], [1, -1, -2], [1, 1, -2],
                        [-1, 1, -2]], np.float32)
    uv = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], np.float32)
    tris = Triangles.from_soup(
        corners[[0, 0]], corners[[1, 2]], corners[[2, 3]],
        uvs=(uv[[0, 0]], uv[[1, 2]], uv[[2, 3]]), material=textured)
    sb = SceneBuilder(b, SkyBackground.create())
    sb.add_triangles(tris)
    scene0 = with_atlas(sb.build(), ab.build())
    nxt = np.minimum(np.arange(size) + 1, size - 1)

    def apply(texels):
        img = jnp.asarray(texels)
        q = jnp.concatenate(
            [img, img[:, nxt], img[nxt], img[nxt][:, nxt]],
            axis=-1).reshape(-1, 16)
        atlas = scene0.atlas.replace(data=img.reshape(-1, 4), qdata=q)
        return scene0.replace(atlas=atlas)

    return apply


def main():
    apply = quad_scene_factory(size=4)
    camera = Camera.create(60.0, (0, 0, 0), (0, 0, -1), (0, 1, 0),
                           aspect_ratio=1.0)

    # Ground truth: a checkerboard with a red corner.
    true = np.full((4, 4, 4), 0.25, np.float32)
    true[::2, ::2, :3] = 0.85
    true[1::2, 1::2, :3] = 0.85
    true[0, 0] = (0.9, 0.1, 0.1, 1.0)
    true = jnp.asarray(true)

    target = inverse.render_image(apply(true), camera, 24, 24, spp=8,
                                  seed=11, max_depth=4)

    def progress(i, params, loss):
        if i % 20 == 0:
            err = float(jnp.abs(params[..., :3] - true[..., :3]).mean())
            print(f"step {i:3d} loss {loss:.6f} "
                  f"mean|rgb texel err| {err:.3f}")

    params, losses = inverse.optimize(
        apply, jnp.full((4, 4, 4), 0.5, jnp.float32), camera, 24, 24,
        target, steps=200, learning_rate=0.1, spp=4, max_depth=4,
        callback=progress)

    p = np.asarray(params)
    err = np.abs(p - np.asarray(true))[..., :3]
    # Texels the camera never sees (the sphere's far side) and alpha
    # channels receive no gradient and stay at their 0.5 init — score
    # only the texels the optimizer actually observed.
    seen = np.abs(p[..., :3] - 0.5).max(-1) > 0.02
    print(f"final loss {losses[-1]:.6f}; "
          f"{int(seen.sum())}/{seen.size} texels observed; "
          f"mean |err| over observed rgb {err[seen].mean():.4f}")
    print("recovered red corner:",
          [round(float(x), 3) for x in p[0, 0, :3]],
          "(true [0.9, 0.1, 0.1])")


if __name__ == "__main__":
    main()
