"""VoxelGrid DDA vs the baked triangle surface it replaces.

The Menger voxel path (geometry/voxels.py) must find the same surface
as the greedy-meshed cube geometry (scenes/menger.sponge_block_mesh):
same hit set, same t, same axis-aligned normals, same front_face — up
to rays that pass within float epsilon of a cell edge, where both
representations are genuinely ambiguous.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from mrt.geometry import voxels
from mrt.geometry.triangles import intersect_brute
from mrt.geometry.scene import T_MIN
from mrt.scenes.menger import sponge_block_mesh, sponge_occupancy

LEVEL = 2
N = 3 ** LEVEL
CELL = 2.0
HALF = N * CELL / 2.0


def _grid(rule="menger"):
    occ = sponge_occupancy(LEVEL) if rule == "dense" else None
    return voxels.VoxelGrid.create(
        origin=(-HALF, -HALF, -HALF), cell=CELL, levels=LEVEL,
        material=7, rule=rule, occupancy=occ)


def _random_rays(n, seed, inside_frac=0.0):
    rng = np.random.default_rng(seed)
    # Origins on a sphere well outside the grid, directions toward a
    # jittered point near the body (so most rays actually hit).
    o = rng.normal(size=(n, 3))
    o = o / np.linalg.norm(o, axis=-1, keepdims=True) * (HALF * 3.0)
    target = rng.uniform(-HALF, HALF, size=(n, 3))
    d = target - o
    k = int(n * inside_frac)
    if k:
        o[:k] = rng.uniform(-HALF, HALF, size=(k, 3))
        d[:k] = rng.normal(size=(k, 3))
    return jnp.asarray(o, jnp.float32), jnp.asarray(d, jnp.float32)


def _edge_distance(p):
    """Distance (in cells) from a hit point to the nearest cell-edge
    lattice line — ambiguity metric for mismatch forgiveness."""
    f = np.asarray(p) / CELL + HALF / CELL
    fr = np.abs(f - np.round(f))
    fr = np.sort(fr, axis=-1)
    # On a face one coordinate is integral; ambiguity = next-nearest.
    return fr[:, 1]


def test_occupancy_matches_closed_form():
    g = _grid()
    occ_np = sponge_occupancy(LEVEL)
    ii, jj, kk = np.mgrid[0:N, 0:N, 0:N]
    got, _ = voxels._occupancy(g, jnp.asarray(ii.ravel()),
                               jnp.asarray(jj.ravel()),
                               jnp.asarray(kk.ravel()))
    np.testing.assert_array_equal(np.asarray(got).reshape(N, N, N),
                                  occ_np)


def test_skip_levels_sound():
    """The advertised skip block is genuinely all-empty."""
    g = _grid()
    occ_np = sponge_occupancy(LEVEL)
    ii, jj, kk = np.mgrid[0:N, 0:N, 0:N]
    c = [jnp.asarray(x.ravel()) for x in (ii, jj, kk)]
    occ, skip = voxels._occupancy(g, *c)
    occ, skip = np.asarray(occ), np.asarray(skip)
    flat = occ_np.ravel()
    for idx in np.flatnonzero(~flat)[::7]:
        b = skip[idx]
        ci, cj, ck = (ii.ravel()[idx], jj.ravel()[idx], kk.ravel()[idx])
        bi, bj, bk = (ci // b) * b, (cj // b) * b, (ck // b) * b
        assert not occ_np[bi:bi + b, bj:bj + b, bk:bk + b].any()


@pytest.mark.parametrize("rule", ["menger", "dense"])
def test_voxel_matches_mesh(rule):
    g = _grid(rule)
    tris = sponge_block_mesh(LEVEL, dims=CELL, material=7)
    o, d = _random_rays(512, seed=1)
    hv = voxels.intersect(g, o, d, T_MIN, jnp.inf)
    hm = intersect_brute(tris, o, d, T_MIN, jnp.inf)

    hit_v = np.asarray(hv.hit)
    hit_m = np.asarray(hm.hit)
    near_edge = _edge_distance(hv.point) < 1e-3
    mismatch = hit_v != hit_m
    assert mismatch.mean() < 0.01
    both = hit_v & hit_m & ~near_edge & ~mismatch
    assert both.sum() > 300
    np.testing.assert_allclose(np.asarray(hv.t)[both],
                               np.asarray(hm.t)[both],
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(hv.normal)[both],
                               np.asarray(hm.normal)[both], atol=1e-5)
    np.testing.assert_array_equal(np.asarray(hv.front_face)[both],
                                  np.asarray(hm.front_face)[both])
    assert (np.asarray(hv.material)[hit_v] == 7).all()


def test_inside_start_marches_to_backface():
    """Rays from strictly inside a solid cell exit at the first
    solid->empty boundary as a back-face hit (what the interior-culled
    mesh's exposed face returns for the same ray)."""
    g = _grid()
    tris = sponge_block_mesh(LEVEL, dims=CELL, material=7)
    occ = sponge_occupancy(LEVEL)
    solid = np.argwhere(occ)
    rng = np.random.default_rng(3)
    pick = solid[rng.integers(0, len(solid), size=64)]
    centers = (pick + 0.5) * CELL - HALF
    o = jnp.asarray(centers + rng.uniform(-0.3, 0.3, centers.shape),
                    jnp.float32)
    d = jnp.asarray(rng.normal(size=centers.shape), jnp.float32)
    hv = voxels.intersect(g, o, d, T_MIN, jnp.inf)
    hm = intersect_brute(tris, o, d, T_MIN, jnp.inf)
    assert np.asarray(hv.hit).all()
    assert not np.asarray(hv.front_face).any()
    good = _edge_distance(hv.point) > 1e-3
    assert good.sum() > 48
    np.testing.assert_allclose(np.asarray(hv.t)[good],
                               np.asarray(hm.t)[good],
                               rtol=1e-4, atol=1e-4)


def test_tmax_truncation_no_phantom_hit():
    g = _grid()
    # y = z = -5 -> cell row (x, 2, 2), which is solid at x = 0 (the
    # central tunnel rows like (x, 4, 4) would be genuine misses).
    o = jnp.asarray([[-HALF * 3, -5.0, -5.0]], jnp.float32)
    d = jnp.asarray([[1.0, 0.0, 0.0]], jnp.float32)
    full = voxels.intersect(g, o, d, T_MIN, jnp.inf)
    assert bool(full.hit[0])
    t_hit = float(full.t[0])
    cut = voxels.intersect(g, o, d, T_MIN, t_hit * 0.5)
    assert not bool(cut.hit[0])
    # Truncation exactly at the surface still reports the hit.
    at = voxels.intersect(g, o, d, T_MIN, t_hit)
    assert bool(at.hit[0])


def test_axis_parallel_and_grazing_rays_finish():
    g = _grid()
    o = jnp.asarray([[-HALF - 5.0, 0.0, 0.0],     # on a lattice plane
                     [-HALF - 5.0, CELL, CELL],   # along cell edges
                     [0.0, HALF + 5.0, 0.0]], jnp.float32)
    d = jnp.asarray([[1.0, 0.0, 0.0],
                     [1.0, 0.0, 0.0],
                     [0.0, -1.0, 0.0]], jnp.float32)
    h = voxels.intersect(g, o, d, T_MIN, jnp.inf)
    assert np.isfinite(np.asarray(h.t)[np.asarray(h.hit)]).all()


def test_scene_renders_voxel_menger():
    from mrt.scenes import get
    from mrt.runtime.render import render

    scene, camera = get("menger")(aspect_ratio=1.0, level=2).generate()
    assert scene.voxels is not None and scene.tlas is not None
    film = render(scene, camera, 24, 24, spp=4, max_depth=6, seed=2)
    img = np.asarray(film.mean())
    assert np.isfinite(img).all() and img.max() > 1e-4


def test_voxel_scene_matches_mesh_scene_mean():
    """Monte-Carlo means of the voxel and instanced-mesh Menger scenes
    agree (same surface, same materials, same environment)."""
    from mrt.scenes import get
    from mrt.runtime.render import render

    sv, cam = get("menger")(aspect_ratio=1.0, level=2).generate()
    sm, _ = get("menger")(aspect_ratio=1.0, level=2, bake=1,
                          voxel=False).generate()
    fv = render(sv, cam, 24, 24, spp=32, max_depth=6, seed=9)
    fm = render(sm, cam, 24, 24, spp=32, max_depth=6, seed=9)
    a, b = np.asarray(fv.mean()), np.asarray(fm.mean())
    # Identical RNG streams and near-identical surfaces: images agree
    # everywhere except FP-tie pixels at cube edges.
    close = np.isclose(a, b, rtol=5e-3, atol=5e-3).mean()
    assert close > 0.95, f"only {close:.1%} of pixels agree"
