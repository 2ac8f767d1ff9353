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


def main():
    from tests.test_grad import textured_scene_factory

    apply = textured_scene_factory(size=4)
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
            err = float(jnp.abs(params - true).max())
            print(f"step {i:3d} loss {loss:.6f} max|texel err| {err:.3f}")

    params, losses = inverse.optimize(
        apply, jnp.full((4, 4, 4), 0.5, jnp.float32), camera, 24, 24,
        target, steps=200, learning_rate=0.1, spp=4, max_depth=4,
        callback=progress)

    err = np.abs(np.asarray(params) - np.asarray(true))
    # Alpha channels and texels the camera never sees stay at init;
    # report the visible RGB recovery.
    print(f"final loss {losses[-1]:.6f}; "
          f"mean |texel err| (rgb) {err[..., :3].mean():.4f}")
    print("recovered red corner:",
          [round(float(x), 3) for x in params[0, 0, :3]],
          "(true [0.9, 0.1, 0.1])")


if __name__ == "__main__":
    main()
