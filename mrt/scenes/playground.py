"""Interactive dynamic scene — the Mario-scene capability without SM64.

The reference's Mario scene loads a castle OBJ as level + collision
geometry, ticks the libsm64 physics engine with controller input every
frame, rebuilds Mario's posed mesh per frame, and animates a dielectric
platform (reference: src/scenes/mario.rs:47-89 level ingestion, 121-276
per-frame tick/rebuild, 143-155 platform).  libsm64 and its ROM aren't
available; this scene reproduces each capability from scratch:

  - a real level mesh (`assets/level/playground_level.obj`, written by
    tools/make_level.py) loaded through the full OBJ loader with .mtl
    materials, used BOTH for rendering and as the collision soup
    (mario.rs:55-63 dual use);
  - a capsule character controller (mrt/runtime/physics.py) ticked per
    frame from `InputCollection` — gravity, slopes, stairs, jumping,
    moving-platform carry (the handle.tick(input) role);
  - a per-frame REBUILT posed character mesh (limbs swing with the run
    cycle, body yaws with the velocity heading) — the Mario-geometry-
    per-frame contract (mario.rs:205-246), not just an instance move;
  - the oscillating+rotating dielectric platform, which is also a
    dynamic collision surface (mario.rs:143-155 DynamicSurface);
  - input record/replay for deterministic animations
    (runtime/input.py, mario.rs:318-343); a 150-frame recording ships
    at assets/playground_input.bin (tools/record_playground.py).
"""

from __future__ import annotations

import os

import numpy as np

from . import register
from ..core.camera import Camera
from ..geometry.scene import SceneBuilder
from ..geometry.shapes import cube
from ..geometry.triangles import Triangles
from ..materials.table import MaterialBuilder
from ..materials.background import SkyBackground
from ..runtime import physics
from ..runtime.physics import CharacterState, CollisionMesh

LEVEL_OBJ = os.path.join(os.path.dirname(__file__), "..", "..",
                         "assets", "level", "playground_level.obj")

SPAWN = (0.0, physics.RADIUS + 0.2, 2.0)

# Platform path (mario.rs:138-155: y oscillates, yaw advances per frame).
PLATFORM_SCALE = (2.0, 0.2, 2.0)


def platform_state(frame):
    """(position, yaw_turns, velocity) of the dielectric platform."""
    f = float(frame)
    x = -3.0 + 2.5 * np.sin(f / 40.0)
    y = 1.1 + 0.6 * np.sin(f / 25.0)
    pos = np.array([x, y, -5.0])
    yaw = f / 380.0
    vel = np.array([2.5 * np.cos(f / 40.0) / 40.0,
                    0.6 * np.cos(f / 25.0) / 25.0, 0.0]) / physics.DT
    return pos, yaw, vel


def _yaw_m4(yaw_turns):
    a = 2.0 * np.pi * yaw_turns
    c, s = np.cos(a), np.sin(a)
    m = np.eye(4)
    m[0, 0], m[0, 2], m[2, 0], m[2, 2] = c, s, -s, c
    return m


def _trs(translation, yaw_turns, scale):
    m = _yaw_m4(yaw_turns)
    m[:3, :3] *= np.asarray(scale)[None, :]
    m[:3, 3] = translation
    return m


def player_mesh(state: CharacterState, material):
    """Posed character rebuilt every frame (the Mario-mesh role,
    mario.rs:205-246): torso+head+limbs as boxes, limbs swinging with
    the run phase, body yawed along the velocity heading."""
    vel = state.vel
    speed = float(np.hypot(vel[0], vel[2]))
    yaw = float(np.arctan2(vel[0], vel[2])) if speed > 0.3 else 0.0
    swing = 0.7 * np.sin(state.phase * 2.0 * np.pi) * min(speed / 4, 1.0)

    parts = []

    def limb(offset, size, pitch):
        t = cube((0.0, -size[1] / 2.0, 0.0), size, material=material)
        va = np.asarray(t.va)
        vb = va + np.asarray(t.e_ab)
        vc = va + np.asarray(t.e_ac)
        c, s = np.cos(pitch), np.sin(pitch)
        rot = np.array([[1, 0, 0], [0, c, -s], [0, s, c]])
        out = []
        for v in (va, vb, vc):
            out.append(v @ rot.T + np.asarray(offset))
        parts.append(Triangles.from_soup(*out, material=material))

    def piece(center, size):
        parts.append(cube(center, size, material=material))

    piece((0.0, 0.95, 0.0), (0.5, 0.7, 0.3))          # torso
    piece((0.0, 1.45, 0.0), (0.32, 0.32, 0.32))       # head
    limb((-0.18, 0.6, 0.0), (0.16, 0.6, 0.16), swing)   # left leg
    limb((0.18, 0.6, 0.0), (0.16, 0.6, 0.16), -swing)   # right leg
    limb((-0.35, 1.25, 0.0), (0.14, 0.5, 0.14), -swing)  # left arm
    limb((0.35, 1.25, 0.0), (0.14, 0.5, 0.14), swing)    # right arm

    import jax
    soup = jax.tree.map(lambda *xs: np.concatenate(xs, 0), *parts)
    # Yaw the whole figure, then translate to the capsule foot.
    c, s = np.cos(yaw), np.sin(yaw)
    rot = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], np.float32)
    foot = state.pos - np.array([0.0, physics.RADIUS, 0.0])
    va = np.asarray(soup.va) @ rot.T + foot
    vb = (np.asarray(soup.va) + np.asarray(soup.e_ab)) @ rot.T + foot
    vc = (np.asarray(soup.va) + np.asarray(soup.e_ac)) @ rot.T + foot
    return Triangles.from_soup(va.astype(np.float32),
                               vb.astype(np.float32),
                               vc.astype(np.float32), material=material)


@register("playground")
class Playground:
    def __init__(self, aspect_ratio=16.0 / 9.0, level=LEVEL_OBJ):
        self.aspect_ratio = aspect_ratio
        self.level_path = level
        self.state = CharacterState.spawn(SPAWN)
        self._level_collision = None
        self._platform_collision = None

    def _collision(self):
        if self._level_collision is None:
            from ..loaders import load_obj, SimpleTexturedBuilder
            from ..textures.atlas import AtlasBuilder

            mats = MaterialBuilder()
            b = SimpleTexturedBuilder(mats, AtlasBuilder())
            load_obj(self.level_path, b)
            self._level_collision = CollisionMesh.from_triangles(
                b.finish())
            self._platform_collision = CollisionMesh.from_triangles(
                cube(size=2.0))
        return self._level_collision, self._platform_collision

    def tick(self, frame, input):
        """Advance physics one frame (exposed for tests/recording)."""
        level, plat = self._collision()
        pos, yaw, vel = platform_state(frame)
        # cube(size=2) spans +-1: scale by PLATFORM_SCALE/2.
        plat_world = plat.transformed(
            _trs(pos, yaw, np.asarray(PLATFORM_SCALE) / 2.0))
        colliders = level.concat(plat_world)
        self.state = physics.tick(self.state, input, colliders,
                                  platform_velocity=vel)
        return self.state

    def generate(self, t=0.0, frame=0, input=None):
        from ..loaders import load_obj, SimpleTexturedBuilder
        from ..textures.atlas import AtlasBuilder

        self.tick(frame, input)

        mat = MaterialBuilder()
        atlas = AtlasBuilder()
        sb = SceneBuilder(mat, SkyBackground.create())

        builder = SimpleTexturedBuilder(mat, atlas)
        load_obj(self.level_path, builder)
        sb.add_model(builder.finish())

        glass = mat.dielectric(1.7)     # mario.rs:164 Dielectric(1.7)
        pos, yaw, _ = platform_state(frame)
        pmesh = sb.add_mesh(cube(size=2.0))
        sb.add_instance(pmesh, tuple(pos), rotation=(0.0, yaw, 0.0),
                        scale=tuple(np.asarray(PLATFORM_SCALE) / 2.0),
                        material=glass)

        player = mat.metal(0.25, (0.85, 0.25, 0.2))
        sb.add_model(player_mesh(self.state, player))

        # Camera follows like the reference (mario.rs:136: look_from y
        # tracks the character, look_at = character).
        look_at = self.state.pos + np.array([0.0, 0.8, 0.0])
        cam_yaw = (input.cam_x if input is not None else 0.0) * np.pi
        eye = look_at + np.array([7.0 * np.sin(cam_yaw + 0.35), 4.0,
                                  9.0 * np.cos(cam_yaw + 0.35)])
        camera = Camera.create(
            50.0, tuple(eye), tuple(look_at), (0.0, 1.0, 0.0),
            self.aspect_ratio, aperture=0.0,
            focus_distance=float(np.linalg.norm(eye - look_at)))
        return sb.build(), camera
