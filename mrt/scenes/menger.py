"""Menger sponge (reference: src/scenes/menger.rs:68-124).

20^level instanced cubes in the Menger corner/edge pattern, a vast
fuzzy-metal floor, and the star+nebula environment cube map, camera
15deg from (2680,140,2000).

The reference hardcodes five nested subdivision loops (20^5 = 3.2M
cubes, menger.rs:86-103); `level` counts those loops (default 5), a parameter
here — lower levels render the same structure smaller for
tests and previews.
"""

from __future__ import annotations

import numpy as np

from . import register
from ..core.camera import Camera
from ..geometry.scene import SceneBuilder
from ..geometry.shapes import cube
from ..materials.table import MaterialBuilder
from .envmaps import environment
from ..textures.atlas import AtlasBuilder

# The 20 of 27 sub-cells kept by the sponge (menger.rs:105-126).
_SIDES = [(0, 1, 1), (1, 0, 1), (1, 1, 0), (0, -1, -1), (-1, 0, -1),
          (-1, -1, 0), (0, -1, 1), (-1, 0, 1), (-1, 1, 0), (0, 1, -1),
          (1, 0, -1), (1, -1, 0), (-1, -1, 1), (-1, 1, -1), (1, -1, -1),
          (-1, 1, 1), (1, -1, 1), (1, 1, -1), (1, 1, 1), (-1, -1, -1)]


def sponge_positions(level, dims=2.0):
    """All cube centers for a level-n sponge (menger.rs:86-103)."""
    sides = np.asarray(_SIDES, np.float64)
    pos = np.zeros((1, 3))
    for lv in range(level - 1, -1, -1):
        step = dims * (3.0 ** lv)
        pos = (pos[:, None, :] + sides[None, :, :] * step).reshape(-1, 3)
    return pos.astype(np.float32)


@register("menger")
class Menger:
    def __init__(self, aspect_ratio=16.0 / 9.0, level=5):
        self.aspect_ratio = aspect_ratio
        self.level = level

    def generate(self, t=0.0, frame=0, input=None):
        mat = MaterialBuilder()
        atlas = AtlasBuilder()
        white = mat.lambertian((1.0, 1.0, 1.0))
        foggy = mat.metal(0.7, (0.5, 0.5, 0.5))

        background = environment(atlas, "j02", rotation=(0.4, 0.2, 0.1))
        sb = SceneBuilder(mat, background, atlas=atlas.build())

        mesh = sb.add_mesh(cube(size=2.0))
        for p in sponge_positions(self.level):
            sb.add_instance(mesh, tuple(p), material=white)

        sb.add_instance(mesh, (0.0, -244.0, 0.0),
                        scale=(500000.0, 1.0, 500000.0), material=foggy)

        look_from = (2680.0, 140.0, 2000.0)
        camera = Camera.create(
            15.0, look_from, (0.0, 0.0, 0.0), (0.0, 1.0, 0.0),
            self.aspect_ratio, aperture=0.0,
            focus_distance=float(np.linalg.norm(look_from)))
        return sb.build(), camera
