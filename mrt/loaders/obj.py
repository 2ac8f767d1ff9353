"""Wavefront OBJ + MTL loader.

Mirrors the reference's line parser and pluggable builder
(reference: src/obj_loader.rs:331-453): handles v/vn/vt/f/o/g/usemtl/
mtllib, 1-based indices, triangular faces, the `v//n` form (which — a
reference quirk we preserve — uses uv[0] for all corners,
obj_loader.rs:398-408), group include-filtering, and a
SimpleTexturedBuilder equivalent that parses .mtl newmtl/Kd/map_Kd
(obj_loader.rs:191-234) and emits textured/solid Lambertian triangles
with the UV v-flip (obj_loader.rs:274-276).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Callable, Optional

import numpy as np


@dataclass
class ObjContext:
    """Parser context handed to builder callbacks
    (obj_loader.rs ObjContext)."""
    group: Optional[str] = None
    material: Optional[str] = None
    material_library: Optional[str] = None


class ObjBuilder:
    """Callback protocol (obj_loader.rs:23-43). Subclass and override."""

    def include_group(self, context: ObjContext) -> bool:
        return True

    def load_materials(self, context: ObjContext):
        pass

    def build_vertex(self, context, x, y, z):
        return (x, y, z)

    def build_normal(self, context, x, y, z):
        return (x, y, z)

    def build_uv(self, context, u, v):
        return (u, v)

    def build_face(self, context, a, b, c):
        """a/b/c are (vertex, normal, uv) triples."""
        raise NotImplementedError


def load_obj(path, builder: ObjBuilder):
    """Stream an OBJ file through the builder; returns the face list.

    Parsing matches obj_loader.rs:331-453: unknown keywords ignored,
    malformed v/vn/vt/f lines raise, faces use only the first three
    vertices, indices are 1-based.
    """
    vertexes, normals, uvs, faces = [], [], [], []
    context = ObjContext()
    include_faces = builder.include_group(context)

    def read_corner(s):
        if "//" in s:
            vi, ni = (int(x) for x in s.split("/") if x)
            if not uvs:
                return None
            # Reference quirk: v//n corners read uvs[0] (uvs.get(0)).
            return (vertexes[vi - 1], normals[ni - 1], uvs[0])
        parts = s.split("/")
        vi = int(parts[0])
        uvi = int(parts[1]) if len(parts) > 1 and parts[1] else None
        ni = int(parts[2]) if len(parts) > 2 and parts[2] else None
        if uvi is None or ni is None:
            return None  # reference zips all three; missing -> None
        return (vertexes[vi - 1], normals[ni - 1], uvs[uvi - 1])

    with open(path, "r", errors="replace") as f:
        for line in f:
            parts = line.split()
            if not parts:
                continue
            kw = parts[0]
            if kw == "v":
                try:
                    x, y, z = (float(p) for p in parts[1:4])
                except (ValueError, IndexError):
                    raise ValueError(f"unable to parse vertex: {line!r}")
                vertexes.append(builder.build_vertex(context, x, y, z))
            elif kw == "vn":
                try:
                    x, y, z = (float(p) for p in parts[1:4])
                except (ValueError, IndexError):
                    raise ValueError(f"unable to parse normal: {line!r}")
                normals.append(builder.build_normal(context, x, y, z))
            elif kw == "vt":
                try:
                    u, v = float(parts[1]), float(parts[2])
                except (ValueError, IndexError):
                    raise ValueError(
                        f"unable to parse texture coord: {line!r}")
                uvs.append(builder.build_uv(context, u, v))
            elif kw == "f":
                if not include_faces:
                    continue
                corners = [read_corner(s) for s in parts[1:4]]
                if any(c is None for c in corners) or len(corners) < 3:
                    raise ValueError(f"unable to parse face: {line!r}")
                faces.append(builder.build_face(context, *corners))
            elif kw in ("o", "g"):
                if len(parts) > 1:
                    context.group = parts[1]
                    include_faces = builder.include_group(context)
            elif kw == "usemtl":
                if len(parts) > 1:
                    context.material = parts[1]
            elif kw == "mtllib":
                lib = " ".join(parts[1:])
                context.material_library = os.path.join(
                    os.path.dirname(os.path.abspath(path)), lib)
                builder.load_materials(context)
    return faces


@dataclass
class FnObjBuilder(ObjBuilder):
    """Closure-based builder (obj_loader.rs:45-159)."""
    vertex_fn: Callable = lambda x, y, z: (x, y, z)
    normal_fn: Callable = lambda x, y, z: (x, y, z)
    uv_fn: Callable = lambda u, v: (u, v)
    face_fn: Callable = lambda a, b, c: (a, b, c)
    group_filter: Optional[Callable[[Optional[str]], bool]] = None

    def include_group(self, context):
        if self.group_filter is None:
            return True
        return self.group_filter(context.group)

    def build_vertex(self, context, x, y, z):
        return self.vertex_fn(x, y, z)

    def build_normal(self, context, x, y, z):
        return self.normal_fn(x, y, z)

    def build_uv(self, context, u, v):
        return self.uv_fn(u, v)

    def build_face(self, context, a, b, c):
        return self.face_fn(a, b, c)


class SimpleTexturedBuilder(ObjBuilder):
    """Emits corner tuples + per-face Lambertian materials from the .mtl
    (obj_loader.rs:160-308).  `finish()` assembles device arrays.

    Args:
      materials: mrt MaterialBuilder (rows added per .mtl material).
      atlas: mrt AtlasBuilder (map_Kd textures registered here).
      filtered_groups: group names to EXCLUDE (blocklist, like
        SimpleTexturedBuilder::with_filter).
      wrap: atlas wrap mode for map_Kd textures.
    """

    def __init__(self, materials, atlas, filtered_groups=(), wrap=None):
        from ..textures.atlas import REPEAT

        self.materials = materials
        self.atlas = atlas
        self.filtered = set(filtered_groups)
        self.wrap = REPEAT if wrap is None else wrap
        self._mtl_rows = {}     # material name -> row id
        self._faces = []        # (corner_a, corner_b, corner_c, row)

    def include_group(self, context):
        if context.group is None:
            return True
        return context.group not in self.filtered

    def load_materials(self, context):
        path = context.material_library
        try:
            self._parse_mtl(path)
        except OSError as e:
            print(f"unable to load material library: {e}")

    def _parse_mtl(self, path):
        """newmtl/Kd/map_Kd parse (obj_loader.rs:191-234)."""
        current = None
        diffuse = {}
        texture = {}
        with open(path, "r", errors="replace") as f:
            for line in f:
                parts = line.strip().split()
                if not parts:
                    continue
                if parts[0] == "newmtl" and len(parts) > 1:
                    current = parts[1]
                elif parts[0] == "Kd" and current is not None:
                    try:
                        diffuse[current] = tuple(
                            float(p) for p in parts[1:4])
                    except ValueError:
                        pass
                elif parts[0] == "map_Kd" and current and len(parts) > 1:
                    tex_path = os.path.join(os.path.dirname(path), parts[1])
                    texture[current] = self.atlas.add_png(
                        tex_path, wrap=self.wrap)
        for name, tid in texture.items():
            self._mtl_rows[name] = self.materials.lambertian(tex=tid)
        for name, kd in diffuse.items():
            if name not in self._mtl_rows:
                self._mtl_rows[name] = self.materials.lambertian(
                    tuple(kd) + (1.0,))

    def build_uv(self, context, u, v):
        return (u, 1.0 - v)  # the reference's V-flip (obj_loader.rs:276)

    def build_face(self, context, a, b, c):
        row = self._mtl_rows.get(context.material)
        if row is None:
            raise ValueError("No material found for face")
        self._faces.append((a, b, c, row))
        return len(self._faces) - 1

    def finish(self):
        """Assemble a Triangles set from the collected faces."""
        from ..geometry.triangles import Triangles

        if not self._faces:
            raise ValueError("no faces loaded")
        va = np.array([f[0][0] for f in self._faces], np.float32)
        vb = np.array([f[1][0] for f in self._faces], np.float32)
        vc = np.array([f[2][0] for f in self._faces], np.float32)
        na = np.array([f[0][1] for f in self._faces], np.float32)
        nb = np.array([f[1][1] for f in self._faces], np.float32)
        nc = np.array([f[2][1] for f in self._faces], np.float32)
        ua = np.array([f[0][2] for f in self._faces], np.float32)
        ub = np.array([f[1][2] for f in self._faces], np.float32)
        uc = np.array([f[2][2] for f in self._faces], np.float32)
        mat = np.array([f[3] for f in self._faces], np.int32)
        return Triangles.from_soup(va, vb, vc, normals=(na, nb, nc),
                                   uvs=(ua, ub, uc), material=mat)
