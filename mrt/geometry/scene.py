"""The compiled scene: flat SoA arrays + a closest-hit dispatcher.

Replaces the reference's `World { objects: Vec<Box<dyn Intersect>> }` and
its linear closest-hit loop (src/world.rs:95-145).  A Scene is a pytree of
typed primitive sets; `intersect` runs each set's batched kernel and folds
results with a per-ray nearest-t select — the SPMD analogue of the
reference's `closest_so_far` shrink loop.

Primitive sets are optional (None == absent); their presence is static so
each scene shape compiles its own specialised program.
"""

from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
from flax import struct

from . import spheres as sphere_mod
from .hit import Hits
from ..materials.table import MaterialTable

T_MIN = 1e-3  # reference: world.rs:68 / main.rs — intersect(ray, 0.001, inf)


@struct.dataclass
class Scene:
    materials: MaterialTable
    background: Any
    spheres: Optional[sphere_mod.Spheres] = None
    triangles: Optional[Any] = None        # geometry.triangles.Triangles
    bvh: Optional[Any] = None              # geometry.bvh.FlatBVH
    tlas: Optional[Any] = None             # geometry.instance.TLAS
    atlas: Optional[Any] = None            # textures.atlas.TextureAtlas

    def intersect(self, o, d, t_min=T_MIN, t_max=jnp.inf) -> Hits:
        """Closest hit of each ray against every primitive set.

        o, d: (N, 3). Returns a Hits record of length N.
        """
        hits = Hits.none(o.shape[0])
        if self.spheres is not None:
            hits = hits.closer_of(
                sphere_mod.intersect(self.spheres, o, d, t_min, t_max))
        if self.triangles is not None:
            from . import triangles as tri_mod  # local: avoid import cycle
            if self.bvh is not None:
                hits = hits.closer_of(tri_mod.intersect_bvh(
                    self.triangles, self.bvh, o, d, t_min, t_max,
                    scene=self))
            else:
                hits = hits.closer_of(tri_mod.intersect_brute(
                    self.triangles, o, d, t_min, t_max, scene=self))
        if self.tlas is not None:
            from . import instance as inst_mod
            hits = hits.closer_of(inst_mod.intersect_tlas(
                self.tlas, o, d, t_min, t_max, scene=self))
        return hits

    def background_eval(self, d):
        return self.background.eval(d, atlas=self.atlas)
