"""EVE ship asset subsystem + fleet scene (reference: src/eve.rs +
src/scenes/eve.rs).

Capabilities mirrored:
  - `EveFilter` keep-list OBJ group filter (eve.rs:10-29)
  - faction palettes test/caldari/ore/soe (eve.rs:136-198)
  - 10-hull registry mapping hulls to OBJ + 3 packed textures
    (eve.rs:203-340)
  - `load_ship` -> mesh with the packed-PBR EVE material class
  - the fleet scene: wormhole environment, fog volume around the
    flagship, sun, 6x6 instanced fleet, defocus camera
    (scenes/eve.rs:21-98)

The CCP game assets are not shipped with the reference repo; when a
hull's files are absent a procedural stand-in ship mesh + synthetic
packed textures exercise the identical material path.  Drop the real
assets under models/ to render the originals.
"""

from __future__ import annotations

import os
import zlib

import numpy as np

from . import register
from ..core.camera import Camera
from ..geometry.scene import SceneBuilder
from ..geometry.triangles import Triangles
from ..materials.table import MaterialBuilder
from ..textures.atlas import AtlasBuilder, REPEAT

# Groups kept by the reference's filter (eve.rs:14-18) — a KEEP-list,
# unlike SimpleTexturedBuilder's blocklist.
EVE_KEEP_GROUPS = ("Hull", "hull", "Glass", "glass", "DarkHull",
                   "exhaust", "Exhaust")

GLOW = (0.5, 0.85, 2.0)

PALETTES = {
    # eve.rs:142-198
    "test": [(1.0, 0.0, 0.0), (0.0, 1.0, 0.0), (0.0, 0.0, 1.0),
             (1.0, 0.0, 1.0)],
    "caldari": [(0.02, 0.02, 0.02), (0.1, 0.1, 0.1), (0.03, 0.05, 0.1),
                (0.08, 0.08, 0.08)],
    "ore": [(0.02, 0.02, 0.02), (0.1, 0.1, 0.1), (0.15, 0.26, 0.39),
            (0.85, 0.62, 0.2)],
    "soe": [(0.02, 0.02, 0.02), (0.2, 0.2, 0.2), (1.0, 1.0, 1.0),
            (0.5, 0.0, 0.0)],
}

# Hull registry (eve.rs:216-340): name -> (asset dir, texture prefix,
# obj filename, palette).
HULLS = {
    "venture": ("models/oref1_t1", "oref1_t1", "OreF1_TShape1.obj", "ore"),
    "raven": ("models/cb1_t1", "cb1_t1", "CB1_TShape1.obj", "caldari"),
    "avatar": ("models/at1_t1", "at1_t1", "AT1_TShape1.obj", "ore"),
    "buzzard": ("models/cf3_t2", "cf3_t2", "CF3_TShape2.obj", "caldari"),
    "rifter": ("models/mf4_t1", "mf4_t1", "MF4_TShape1.obj", "ore"),
    "astero": ("models/soef1_t1", "soef1_t1", "SoEF1_TShape1.obj", "soe"),
    "stratios": ("models/soec1_t1", "soec1_t1", "SoEC1_TShape1.obj",
                 "soe"),
    "nestor": ("models/soeb1_t1", "soeb1_t1", "SoEB1_TShape2.obj", "soe"),
    "orca": ("models/orefr1_t1", "orefr1_t1", "OreFr1_TShape1.obj",
             "ore"),
    "crow": ("models/cf2_t2a", "cf2_t2a", "CF2_T2aShape.obj", "ore"),
}

# The raven's navy pmdg variant (eve.rs:230).
_PMDG_SUFFIX = {"raven": "_navy_pmdg"}


def eve_group_filter(group):
    """Keep-list include_group (eve.rs:13-28)."""
    if group is None:
        return False
    return group in EVE_KEEP_GROUPS


def _synth_packed_textures(atlas: AtlasBuilder, rng, size=64):
    """Synthetic no/ar/pmdg texture triple with plausible channel
    content for the packed-PBR decode paths."""
    # normal+occlusion: G/A hold tangent XY (centered), B = occlusion.
    no = np.full((size, size, 4), 0.5, np.float32)
    no[..., 1] = 0.5 + 0.2 * (rng.random((size, size)) - 0.5)
    no[..., 3] = 0.5 + 0.2 * (rng.random((size, size)) - 0.5)
    no[..., 2] = 0.8 + 0.2 * rng.random((size, size))
    # albedo+roughness: grey hull plates, varying roughness.
    ar = np.zeros((size, size, 4), np.float32)
    plate = 0.35 + 0.3 * rng.random((size // 8, size // 8))
    ar[..., :3] = np.kron(plate, np.ones((8, 8)))[..., None]
    ar[..., 3] = np.kron(rng.random((size // 8, size // 8)),
                         np.ones((8, 8)))
    # pmdg masks.
    pmdg = np.zeros((size, size, 4), np.float32)
    pmdg[..., 0] = (rng.random((size, size)) > 0.7)           # paint
    pmdg[..., 1] = rng.random((size, size))                   # material
    pmdg[..., 2] = 0.2 * rng.random((size, size))             # dirt
    glow = np.zeros((size, size))
    glow[size // 2 - 2:size // 2 + 2, ::8] = 1.0              # windows
    pmdg[..., 3] = glow
    return (atlas.add_raw(no, wrap=REPEAT),
            atlas.add_raw(ar, wrap=REPEAT),
            atlas.add_raw(pmdg, wrap=REPEAT))


def _standin_ship(material, seed=0):
    """A procedural winged-hull mesh with UVs + smooth normals (pure
    NumPy: scene generate() must not dispatch device ops)."""
    from ..geometry.shapes import cube, sphere_mesh
    import jax

    body = sphere_mesh((0, 0, 0), 1.0, lat=6, lon=10, material=material)
    stretch = np.asarray([[3.0, 0.6, 1.0]], np.float32)
    body = body.replace(va=body.va * stretch, e_ab=body.e_ab * stretch,
                        e_ac=body.e_ac * stretch)
    wing = cube((0.0, 0.0, 0.0), (1.2, 0.1, 4.0), material=material)
    tail = cube((-2.2, 0.4, 0.0), (1.4, 0.8, 0.3), material=material)
    return jax.tree.map(lambda *xs: np.concatenate(xs, 0),
                        body, wing, tail)


def load_ship(sb: SceneBuilder, mats: MaterialBuilder,
              atlas: AtlasBuilder, hull: str, seed=0):
    """Register a hull's mesh; returns (mesh_id, material_row)
    (eve.rs:216-340 + load via ObjLoader with EveFilter)."""
    from ..runtime.assets import resolve

    asset_dir, prefix, obj_name, palette = HULLS[hull]
    pmdg_suffix = _PMDG_SUFFIX.get(hull, "_pmdg")
    asset_dir = resolve(asset_dir)
    obj_path = os.path.join(asset_dir, obj_name)
    # Stable string hash: Python's hash() is PYTHONHASHSEED-randomised
    # per process, which made the procedural stand-in textures (and so
    # EVE film means) differ run to run.
    rng = np.random.default_rng(
        seed + zlib.crc32(hull.encode()) % (1 << 16))

    if os.path.exists(obj_path):
        no = atlas.add_png(os.path.join(asset_dir, f"{prefix}_no.png"),
                           wrap=REPEAT)
        ar = atlas.add_png(os.path.join(asset_dir, f"{prefix}_ar.png"),
                           wrap=REPEAT)
        pmdg = atlas.add_png(
            os.path.join(asset_dir, f"{prefix}{pmdg_suffix}.png"),
            wrap=REPEAT)
        row = mats.eve(ar, no, pmdg, PALETTES[palette], glow=GLOW)

        from ..loaders import load_obj, FnObjBuilder
        corners = []
        load_obj(obj_path, FnObjBuilder(
            uv_fn=lambda u, v: (u, v),
            face_fn=lambda a, b, c: corners.append((a, b, c)),
            group_filter=eve_group_filter))
        va = np.array([f[0][0] for f in corners], np.float32)
        vb = np.array([f[1][0] for f in corners], np.float32)
        vc = np.array([f[2][0] for f in corners], np.float32)
        tris = Triangles.from_soup(
            va, vb, vc,
            normals=tuple(np.array([f[i][1] for f in corners], np.float32)
                          for i in range(3)),
            uvs=tuple(np.array([f[i][2] for f in corners], np.float32)
                      for i in range(3)),
            material=row)
    else:
        no, ar, pmdg = _synth_packed_textures(atlas, rng)
        row = mats.eve(ar, no, pmdg, PALETTES[palette], glow=GLOW)
        tris = _standin_ship(row, seed=seed)

    return sb.add_mesh(tris), row


@register("eve")
class Eve:
    """The fleet scene (scenes/eve.rs:21-98)."""

    def __init__(self, aspect_ratio=16.0 / 9.0, seed=1):
        self.aspect_ratio = aspect_ratio
        self.seed = seed

    def generate(self, t=0.0, frame=0, input=None):
        from .envmaps import environment

        rng = np.random.default_rng(self.seed)
        mats = MaterialBuilder()
        atlas = AtlasBuilder()
        background = environment(atlas, "wormhole_class_05",
                                 rotation=(0.0, 0.0, 0.0))

        sb = SceneBuilder(mats, background)
        flagship_mesh, _ = load_ship(sb, mats, atlas, "nestor",
                                     seed=self.seed)
        fighter_mesh, _ = load_ship(sb, mats, atlas, "stratios",
                                    seed=self.seed + 1)

        orca_pos = (-1250.0, 5.0, 0.0)
        # Flagship scaled up so the stand-in reads as capital-class.
        sb.add_instance(flagship_mesh, orca_pos,
                        rotation=tuple((rng.random(3) - 0.5) / 60.0),
                        scale=120.0)
        sb.add_volume_sphere(orca_pos, 1700.0, 0.0006, (0.4, 0.4, 0.4))

        sun = mats.diffuse_light((40.0, 40.0, 50.0))
        sb.add_sphere((10000.0, -4000.0, 4800.0), 1500.0, sun)

        look_from = np.array([0.0, -20.0, 500.0])
        rotation = np.array([-0.03, 0.0, 0.0])
        for x in range(6):
            for z in range(6):
                px = (x - 3.0) * 190.0
                pz = (z - 3.0) * 190.0
                py = (rng.random() * 2.0 - 1.0) * 150.0
                pos = np.array([px, py, pz])
                if np.linalg.norm(pos - look_from) > 50.0:
                    sb.add_instance(
                        fighter_mesh, tuple(pos),
                        rotation=tuple(rotation
                                       + (rng.random(3) - 0.5) / 30.5),
                        scale=0.2 * 100.0)  # stand-in spans ~6u, not ~600

        # Atlas built last: ship textures were added during load_ship.
        from ..geometry.scene import with_atlas
        scene = with_atlas(sb.build(), atlas.build())

        focus_distance = float(np.linalg.norm(look_from
                                              - np.asarray(orca_pos)))
        camera = Camera.create(
            50.0, tuple(look_from), orca_pos, (0.0, 1.0, 0.0),
            self.aspect_ratio, aperture=0.2,
            focus_distance=focus_distance)
        return scene, camera
