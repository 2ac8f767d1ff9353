"""Generate the playground level OBJ (assets/level/playground_level.obj).

The reference loads `Peaches Castle.obj` as both render and collision
geometry (reference: src/scenes/mario.rs:55-63); that asset isn't
shipped, so this writes an original level of the same kind — ground,
ramp, stairs, platforms, walls — as a real .obj + .mtl pair consumed
through the full OBJ loader path (mtllib/usemtl/groups/normals/uvs).

Run: python tools/make_level.py   (re-writes the checked-in asset)
"""

import os

V = []      # vertices
VN = []     # normals
VT = []     # uvs
FACES = []  # (group, mtl, [(vi, ti, ni) x3])


def box(center, size, group, mtl, top_only=False):
    cx, cy, cz = center
    sx, sy, sz = (s / 2.0 for s in size)
    corners = {}

    def vid(x, y, z):
        key = (x, y, z)
        if key not in corners:
            V.append(key)
            corners[key] = len(V)
        return corners[key]

    def nid(n):
        VN.append(n)
        return len(VN)

    def tid(u, v):
        VT.append((u, v))
        return len(VT)

    def quad(p0, p1, p2, p3, n):
        ni = nid(n)
        t = [tid(0, 0), tid(1, 0), tid(1, 1), tid(0, 1)]
        a, b, c, d = (vid(*p) for p in (p0, p1, p2, p3))
        FACES.append((group, mtl, [(a, t[0], ni), (b, t[1], ni),
                                   (c, t[2], ni)]))
        FACES.append((group, mtl, [(a, t[0], ni), (c, t[2], ni),
                                   (d, t[3], ni)]))

    x0, x1 = cx - sx, cx + sx
    y0, y1 = cy - sy, cy + sy
    z0, z1 = cz - sz, cz + sz
    quad((x0, y1, z0), (x0, y1, z1), (x1, y1, z1), (x1, y1, z0),
         (0, 1, 0))                                        # top
    if top_only:
        return
    quad((x0, y0, z0), (x1, y0, z0), (x1, y0, z1), (x0, y0, z1),
         (0, -1, 0))                                       # bottom
    quad((x0, y0, z1), (x1, y0, z1), (x1, y1, z1), (x0, y1, z1),
         (0, 0, 1))
    quad((x1, y0, z0), (x0, y0, z0), (x0, y1, z0), (x1, y1, z0),
         (0, 0, -1))
    quad((x1, y0, z1), (x1, y0, z0), (x1, y1, z0), (x1, y1, z1),
         (1, 0, 0))
    quad((x0, y0, z0), (x0, y0, z1), (x0, y1, z1), (x0, y1, z0),
         (-1, 0, 0))


def ramp(x0, x1, z0, z1, y0, y1, group, mtl):
    """Wedge rising from y0 at x0 to y1 at x1."""
    import math
    n_len = math.hypot(y1 - y0, x1 - x0)
    n = ((y0 - y1) / n_len, (x1 - x0) / n_len, 0.0)

    def vid(p):
        V.append(p)
        return len(V)

    def nid(nv):
        VN.append(nv)
        return len(VN)

    def tid(u, v):
        VT.append((u, v))
        return len(VT)

    ni = nid(n)
    t = [tid(0, 0), tid(1, 0), tid(1, 1), tid(0, 1)]
    a = vid((x0, y0, z0))
    b = vid((x1, y1, z0))
    c = vid((x1, y1, z1))
    d = vid((x0, y0, z1))
    FACES.append((group, mtl, [(a, t[0], ni), (b, t[1], ni),
                               (c, t[2], ni)]))
    FACES.append((group, mtl, [(a, t[0], ni), (c, t[2], ni),
                               (d, t[3], ni)]))
    # Wedge sides: two triangles, a back quad and a bottom quad.
    base = y0

    def tri(p0, p1, p2, nv):
        nj = nid(nv)
        tj = [tid(0, 0), tid(1, 0), tid(1, 1)]
        i0, i1, i2 = (vid(p) for p in (p0, p1, p2))
        FACES.append((group, mtl, [(i0, tj[0], nj), (i1, tj[1], nj),
                                   (i2, tj[2], nj)]))

    tri((x0, base, z0), (x1, base, z0), (x1, y1, z0), (0, 0, -1))
    tri((x0, base, z1), (x1, y1, z1), (x1, base, z1), (0, 0, 1))
    ni2 = nid((1, 0, 0))
    t2 = [tid(0, 0), tid(1, 0), tid(1, 1), tid(0, 1)]
    a2 = vid((x1, base, z0))
    b2 = vid((x1, base, z1))
    c2 = vid((x1, y1, z1))
    d2 = vid((x1, y1, z0))
    FACES.append((group, mtl, [(a2, t2[0], ni2), (b2, t2[1], ni2),
                               (c2, t2[2], ni2)]))
    FACES.append((group, mtl, [(a2, t2[0], ni2), (c2, t2[2], ni2),
                               (d2, t2[3], ni2)]))


def main():
    # Ground slab.
    box((0, -0.5, 0), (44, 1, 44), "ground", "grass")
    # Ramp up to platform A.
    ramp(2.0, 8.0, -2.0, 2.0, 0.0, 2.0, "ramp", "stone")
    # Platform A continues the ramp top.
    box((10, 1.0, 0), (4, 2.0, 4), "platformA", "stone")
    # Stairs (4 steps) on the -x side.
    for i in range(4):
        box((-4.0 - i * 1.2, 0.25 + i * 0.5, 4.0),
            (1.2, 0.5 + i * 1.0, 3.0), "stairs", "brick")
    # High platform past the stairs.
    box((-9.5, 1.0, 4.0), (3.6, 4.0, 3.0), "platformB", "brick")
    # Back wall.
    box((0, 1.5, -9.0), (20, 3, 1), "wall", "brick")
    # Scatter of blocks.
    box((5, 0.75, 6), (1.5, 1.5, 1.5), "blocks", "stone")
    box((-2, 0.5, -5), (1.0, 1.0, 1.0), "blocks", "stone")

    out_dir = os.path.join(os.path.dirname(__file__), "..", "assets",
                           "level")
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "playground_level.mtl"), "w") as f:
        f.write("newmtl grass\nKd 0.45 0.55 0.35\n\n"
                "newmtl stone\nKd 0.55 0.55 0.58\n\n"
                "newmtl brick\nKd 0.58 0.35 0.28\n")
    with open(os.path.join(out_dir, "playground_level.obj"), "w") as f:
        f.write("mtllib playground_level.mtl\n")
        for v in V:
            f.write(f"v {v[0]} {v[1]} {v[2]}\n")
        for vt in VT:
            f.write(f"vt {vt[0]} {vt[1]}\n")
        for vn in VN:
            f.write(f"vn {vn[0]} {vn[1]} {vn[2]}\n")
        cur = (None, None)
        for group, mtl, corners in FACES:
            if cur != (group, mtl):
                f.write(f"g {group}\nusemtl {mtl}\n")
                cur = (group, mtl)
            f.write("f " + " ".join(f"{v}/{t}/{n}"
                                    for (v, t, n) in corners) + "\n")
    print(f"wrote {len(FACES)} faces, {len(V)} verts ->"
          f" {out_dir}/playground_level.obj")


if __name__ == "__main__":
    main()
