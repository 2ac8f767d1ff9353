"""Interactive dynamic scene — the Mario-scene capability without SM64.

The reference's Mario scene ticks a physics engine with controller
input every frame, rebuilds dynamic geometry, and moves a dielectric
platform (reference: src/scenes/mario.rs:121-276; libsm64 provides the
physics).  The C library isn't available here, so this scene exercises
the same *framework* capabilities with simple built-in kinematics:

  - per-frame regenerated geometry (player + platform move every frame)
  - controller input consumed via InputCollection (stick to run,
    button_a to jump), replayable bit-exactly through
    runtime.input.InputReplay (mario.rs:318-343 record/replay)
  - a time-animated dielectric platform (mario.rs:143-155)
  - mutable per-scene state across generate() calls (the reference's
    `&mut self` Scene::generate contract, scenes.rs:25-33)
"""

from __future__ import annotations

import numpy as np

from . import register
from ..core.camera import Camera
from ..geometry.scene import SceneBuilder
from ..geometry.shapes import cube
from ..materials.table import MaterialBuilder
from ..materials.background import SkyBackground

GRAVITY = -30.0
RUN_SPEED = 8.0
JUMP_SPEED = 12.0
DT = 1.0 / 30.0


@register("playground")
class Playground:
    def __init__(self, aspect_ratio=16.0 / 9.0):
        self.aspect_ratio = aspect_ratio
        self.pos = np.array([0.0, 1.0, 0.0])
        self.vel = np.zeros(3)

    def _tick(self, inp):
        """One kinematics step from controller input."""
        if inp is not None:
            self.vel[0] = inp.stick_x * RUN_SPEED
            self.vel[2] = -inp.stick_y * RUN_SPEED
            if inp.button_a and self.pos[1] <= 1.0 + 1e-6:
                self.vel[1] = JUMP_SPEED
        self.vel[1] += GRAVITY * DT
        self.pos += self.vel * DT
        if self.pos[1] < 1.0:   # ground plane at sphere radius
            self.pos[1] = 1.0
            self.vel[1] = 0.0

    def generate(self, t=0.0, frame=0, input=None):
        self._tick(input)

        mat = MaterialBuilder()
        ground = mat.lambertian((0.45, 0.55, 0.35))
        player = mat.metal(0.1, (0.9, 0.3, 0.2))
        block = mat.lambertian((0.6, 0.5, 0.4))
        glass = mat.dielectric(1.5)

        sb = SceneBuilder(mat, SkyBackground.create())
        mesh = sb.add_mesh(cube(size=2.0))
        sb.add_instance(mesh, (0.0, -1000.0, 0.0), scale=1000.0,
                        material=ground)
        for i, (x, z) in enumerate([(-6, -4), (5, -7), (8, 3), (-4, 6)]):
            sb.add_instance(mesh, (x, 1.0 + (i % 2), z),
                            scale=(1.0, 1.0 + (i % 2), 1.0),
                            material=block)

        # Oscillating dielectric platform (mario.rs:143-155).
        px = 4.0 * np.sin(2.0 * np.pi * t)
        sb.add_instance(mesh, (px, 3.0, -3.0), scale=(2.0, 0.2, 2.0),
                        material=glass)

        sb.add_sphere(tuple(self.pos), 1.0, player)

        cam_yaw = (input.cam_x if input is not None else 0.0) * np.pi
        eye = self.pos + np.array([8.0 * np.sin(cam_yaw), 6.0,
                                   10.0 * np.cos(cam_yaw)])
        camera = Camera.create(
            45.0, tuple(eye), tuple(self.pos + [0.0, 1.0, 0.0]),
            (0.0, 1.0, 0.0), self.aspect_ratio, aperture=0.0,
            focus_distance=float(np.linalg.norm(eye - self.pos)))
        return sb.build(), camera
