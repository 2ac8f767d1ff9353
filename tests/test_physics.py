"""Character physics + deterministic input replay (the Mario-scene
capability, reference: src/scenes/mario.rs:121-343)."""

import os

import numpy as np
import pytest

from mrt.runtime import physics
from mrt.runtime.input import InputCollection, InputReplay
from mrt.runtime.physics import (CharacterState, CollisionMesh,
                                 closest_point_on_triangles)
from mrt.scenes.playground import Playground

RECORDING = os.path.join(os.path.dirname(__file__), "..", "assets",
                         "playground_input.bin")


class TestClosestPoint:
    def setup_method(self):
        self.va = np.array([[-10.0, 0.0, -10.0]])
        self.vb = np.array([[10.0, 0.0, -10.0]])
        self.vc = np.array([[0.0, 0.0, 10.0]])

    def q(self, p):
        return closest_point_on_triangles(np.asarray(p, float), self.va,
                                          self.vb, self.vc)[0]

    def test_interior_projects(self):
        np.testing.assert_allclose(self.q([0, 3, 0]), [0, 0, 0])
        np.testing.assert_allclose(self.q([0, -3, 0]), [0, 0, 0])

    def test_vertex_regions(self):
        np.testing.assert_allclose(self.q([12, 1, -11]), [10, 0, -10])
        np.testing.assert_allclose(self.q([-12, 1, -11]), [-10, 0, -10])
        np.testing.assert_allclose(self.q([0, 1, 13]), [0, 0, 10])

    def test_edge_region(self):
        q = self.q([0, 2, -15])
        np.testing.assert_allclose(q, [0, 0, -10])


class TestController:
    def _flat(self):
        return CollisionMesh(
            np.array([[-50.0, 0, -50], [-50.0, 0, -50]]),
            np.array([[50.0, 0, -50], [50.0, 0, 50]]),
            np.array([[50.0, 0, 50], [-50.0, 0, 50]]))

    def test_falls_lands_and_rests(self):
        st = CharacterState.spawn((0, 3.0, 0))
        for _ in range(60):
            st = physics.tick(st, None, self._flat())
        assert st.grounded
        assert abs(st.pos[1] - physics.RADIUS) < 1e-6

    def test_jump_arc(self):
        st = CharacterState.spawn((0, physics.RADIUS, 0))
        st = physics.tick(st, None, self._flat())
        jump = InputCollection(button_a=True)
        st = physics.tick(st, jump, self._flat())
        ys = []
        for _ in range(40):
            st = physics.tick(st, None, self._flat())
            ys.append(st.pos[1])
        assert max(ys) > 1.5            # left the ground
        assert abs(ys[-1] - physics.RADIUS) < 1e-6   # came back down

    def test_run_moves_and_wall_blocks(self):
        wall = CollisionMesh(
            np.array([[5.0, -5, -50], [5.0, -5, -50]]),
            np.array([[5.0, -5, 50], [5.0, 10, 50]]),
            np.array([[5.0, 10, 50], [5.0, 10, -50]]))
        col = self._flat().concat(wall)
        st = CharacterState.spawn((0, physics.RADIUS, 0))
        run = InputCollection(stick_x=1.0)
        for _ in range(60):
            st = physics.tick(st, run, col)
        assert st.pos[0] > 3.0
        assert st.pos[0] <= 5.0 - physics.RADIUS + 1e-6  # wall stops it


@pytest.mark.skipif(not os.path.exists(RECORDING),
                    reason="no checked-in recording")
class TestReplay:
    def _run(self):
        rep = InputReplay(RECORDING)
        sc = Playground()
        trace = []
        for f in range(len(rep.frames)):
            st = sc.tick(f, rep.frame(f))
            trace.append(st.pos.copy())
        return np.stack(trace), st

    def test_deterministic_replay(self):
        t1, _ = self._run()
        t2, _ = self._run()
        np.testing.assert_array_equal(t1, t2)   # bit-identical

    def test_trajectory_hits_the_beats(self):
        trace, final = self._run()
        # Climbed the ramp onto platform A (top at y=2).
        assert trace[:, 1].max() > 2.2 + physics.RADIUS
        # Jumped at least twice (two upward-velocity arcs off ground).
        airborne = trace[:, 1] > 2.8
        assert airborne.any()
        # Ends riding the moving glass platform: off the ground, and
        # carried sideways during the idle tail frames.
        assert final.pos[1] > 0.9
        drift = abs(trace[-1, 0] - trace[-10, 0])
        assert drift > 0.05, "platform should carry the idle character"

    def test_generate_renders_character(self):
        from mrt.runtime.render import render

        rep = InputReplay(RECORDING)
        sc = Playground(aspect_ratio=1.0)
        for f in range(20):
            sc.tick(f, rep.frame(f))
        scene, cam = sc.generate(20 / 30.0, 20, rep.frame(20))
        film = render(scene, cam, 24, 24, spp=4, max_depth=4, seed=2)
        img = np.asarray(film.mean())
        assert np.isfinite(img).all() and img.max() > 1e-3
