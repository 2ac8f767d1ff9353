"""Asset path resolution — real-asset drop-in detection.

The reference loads meshes/textures from a `models/` directory next to
the binary (e.g. `models/lucy.ply`, lucy.rs:30; the EVE hull registry,
eve.rs:203-340).  Those assets aren't shipped with either repo, so the
scenes here synthesize stand-ins when the files are missing — but real
assets must activate WITHOUT code changes.  `resolve()` makes the
lookup independent of the working directory:

  1. absolute paths pass through;
  2. $MRT_MODELS_DIR, if set, replaces the leading `models/` component;
  3. the current working directory (the reference's behavior);
  4. the repository root (so `python -m mrt` works from anywhere).

The first candidate that EXISTS wins; if none exists the original
relative path is returned (callers treat missing paths as "use the
stand-in").
"""

from __future__ import annotations

import os

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def resolve(path: str) -> str:
    if os.path.isabs(path):
        return path
    candidates = []
    env = os.environ.get("MRT_MODELS_DIR")
    if env:
        parts = path.replace("\\", "/").split("/")
        sub = parts[1:] if parts and parts[0] == "models" else parts
        candidates.append(os.path.join(env, *sub))
    candidates.append(path)
    candidates.append(os.path.join(_REPO_ROOT, path))
    for c in candidates:
        if os.path.exists(c):
            return c
    return path
