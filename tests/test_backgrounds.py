"""Backgrounds: sky gradient, equirect sky sphere, cube map face
selection (incl. the reference's y-face swap quirk)."""

import numpy as np
import jax.numpy as jnp

from mrt.materials.background import (SolidBackground, SkyBackground,
                                      SkySphere, CubeMap)
from mrt.textures.atlas import AtlasBuilder


def test_solid():
    bg = SolidBackground.create((0.1, 0.2, 0.3))
    out = np.asarray(bg.eval(jnp.asarray([[1.0, 2.0, 3.0]])))
    np.testing.assert_allclose(out, [[0.1, 0.2, 0.3]])


def test_sky_gradient():
    # material.rs:55-63: t = (unit.y+1)/2, lerp white->blue.
    bg = SkyBackground.create()
    up = np.asarray(bg.eval(jnp.asarray([[0.0, 1.0, 0.0]])))
    down = np.asarray(bg.eval(jnp.asarray([[0.0, -1.0, 0.0]])))
    np.testing.assert_allclose(up, [[0.5, 0.7, 1.0]], atol=1e-6)
    np.testing.assert_allclose(down, [[1.0, 1.0, 1.0]], atol=1e-6)


def test_sky_sphere_equirect():
    # 2x4 texture; +x direction -> phi=pi -> u=0.5, horizon v=0.5
    # (material.rs:75-88).
    b = AtlasBuilder()
    img = np.zeros((2, 4, 4), np.float32)
    img[:, :] = np.arange(4)[None, :, None] / 4.0   # columns encode u
    tid = b.add_raw(img)
    bg = SkySphere.create(tid)
    atlas = b.build()
    out = np.asarray(bg.eval(jnp.asarray([[1.0, 0.0, 0.0]]), atlas=atlas))
    # u=0.5 -> x = 0.5*(4-1) = 1.5 -> lerp(col1, col2) = 0.375.
    np.testing.assert_allclose(out[0], 0.375, atol=1e-5)
    # Straight up: theta=0 -> v=0 (row 0); u from phi.
    up = np.asarray(bg.eval(jnp.asarray([[0.0, 1.0, 0.0]]), atlas=atlas))
    assert np.isfinite(up).all()


def test_cube_map_face_selection():
    """Dominant axis picks the face; the reference picks the y_neg
    texture for +y and y_pos for -y (material.rs:141-174 quirk)."""
    b = AtlasBuilder()
    face_ids = [b.add_solid((i / 10.0, 0.0, 0.0)) for i in range(6)]
    atlas = b.build()
    # create(x_pos, x_neg, y_pos, y_neg, z_pos, z_neg)
    bg = CubeMap.create(*face_ids)
    dirs = jnp.asarray([[1, 0, 0], [-1, 0, 0], [0, 1, 0],
                        [0, -1, 0], [0, 0, 1], [0, 0, -1]], jnp.float32)
    out = np.asarray(bg.eval(dirs, atlas=atlas))[:, 0]
    # ctor order indices:        +x   -x   +y(y_neg!) -y(y_pos!) +z  -z
    expect = np.array([0.0, 1.0, 3.0, 2.0, 4.0, 5.0]) / 10.0
    np.testing.assert_allclose(out, expect, atol=1e-6)


def test_cube_map_uv_within_face():
    # A gradient texture on +z face: u follows x.
    b = AtlasBuilder()
    img = np.zeros((1, 3, 4), np.float32)
    img[0, :, 1] = [0.0, 0.5, 1.0]
    grad = b.add_raw(img)
    black = b.add_solid((0, 0, 0))
    bg = CubeMap.create(black, black, black, black, grad, black)
    atlas = b.build()
    # +z face: u = 0.5*(x/|z| + 1); x=0 -> u=0.5 -> g=0.5.
    out = np.asarray(bg.eval(jnp.asarray([[0.0, 0.0, 1.0]]), atlas=atlas))
    np.testing.assert_allclose(out[0, 1], 0.5, atol=1e-5)
    # x=+0.9 -> u=0.95 -> g ~ 0.9*... close to 1 side.
    out2 = np.asarray(bg.eval(jnp.asarray([[0.9, 0.0, 1.0]]),
                              atlas=atlas))
    assert out2[0, 1] > 0.85
