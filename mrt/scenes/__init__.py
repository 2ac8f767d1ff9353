"""The scene zoo.

Mirrors the reference's `Scene` trait (reference: src/scenes.rs:25-33):
a scene object exposes ``generate(t, frame, input) -> (Scene, Camera)``
where ``t`` is the animation parameter in [0,1].  Construction happens on
host (numpy) and produces the SoA arrays the integrator consumes.

Registry replaces the reference's edit-the-source scene selection
(main.rs:97-102) with a name lookup for the CLI.
"""

from __future__ import annotations

_REGISTRY = {}


def register(name):
    def deco(cls):
        _REGISTRY[name] = cls
        return cls
    return deco


def get(name):
    if name not in _REGISTRY:
        raise KeyError(
            f"unknown scene {name!r}; available: {sorted(_REGISTRY)}")
    return _REGISTRY[name]


def names():
    return sorted(_REGISTRY)


from . import rtiow, cornell, sphere_grid, lucy, menger, eve, playground  # noqa: E402,F401
