"""HBM-streamed packet TLAS (mrt/ops/pallas_stream.py) equivalence.

The streamed kernel must produce the identical winner set as the XLA
two-level traversal (geometry/instance.py) for every static
resident/streamed group combination — the combination only changes
where tables live, never the traversal semantics.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from mrt.geometry.instance import MeshRegistry, intersect_tlas
from mrt.geometry.shapes import cube, sphere_mesh
from mrt.ops import pallas_stream


def _build_tlas(seed=0, n_inst=40):
    rng = np.random.default_rng(seed)
    reg = MeshRegistry()
    m_cube = reg.add_mesh(cube(size=1.0))
    m_sphere = reg.add_mesh(sphere_mesh(radius=0.6, lat=5, lon=7))
    for i in range(n_inst):
        reg.add_instance(
            m_cube if i % 2 else m_sphere,
            translation=rng.uniform(-6, 6, 3),
            rotation=rng.uniform(0, 1, 3),
            scale=rng.uniform(0.4, 1.8),
            material=int(rng.integers(0, 5)))
    return reg.build()


def _rays(seed=1, n=513):
    rng = np.random.default_rng(seed)
    o = rng.uniform(-10, 10, (n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    return jnp.asarray(o), jnp.asarray(d)


STREAM_PLANS = [
    dict(tlas=False, inst=False, blas=False, tri=False),
    dict(tlas=True, inst=True, blas=True, tri=True),
    dict(tlas=True, inst=True, blas=False, tri=False),
    dict(tlas=False, inst=False, blas=True, tri=True),
]


@pytest.mark.parametrize("plan", STREAM_PLANS,
                         ids=["resident", "all-streamed", "top-streamed",
                              "bottom-streamed"])
def test_streamed_matches_xla(plan):
    tlas = _build_tlas()
    o, d = _rays()
    want = intersect_tlas(tlas, o, d, 1e-3, jnp.inf)
    got = pallas_stream.intersect_tlas(tlas, o, d, 1e-3, jnp.inf,
                                       interpret=True, streamed=plan)
    np.testing.assert_array_equal(np.asarray(want.hit),
                                  np.asarray(got.hit))
    m = np.asarray(want.hit)
    np.testing.assert_allclose(np.asarray(want.t)[m],
                               np.asarray(got.t)[m], rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(want.material)[m],
                                  np.asarray(got.material)[m])
    np.testing.assert_allclose(np.asarray(want.normal)[m],
                               np.asarray(got.normal)[m], atol=1e-5)
    np.testing.assert_allclose(np.asarray(want.uv)[m],
                               np.asarray(got.uv)[m], atol=1e-5)


def test_choose_streaming_menger_scale():
    """The level-5 baked Menger TLAS streams its node+instance tables
    but keeps the (small) BLAS + triangles resident."""
    from mrt.scenes.menger import Menger

    scene, _ = Menger(level=5, bake=2, voxel=False).generate()
    plan = pallas_stream.choose_streaming(scene.tlas)
    assert plan["tlas"] and plan["inst"]
    assert not plan["blas"] and not plan["tri"]
    from mrt.ops import budget
    assert not budget.fits(budget.tlas_tables_bytes(scene.tlas))


def test_budget_gate_consistency():
    """The resident-kernel gate and the kernels' actual table layouts
    agree: bytes-per-element constants match the (rows x dtype) SoA
    shapes the kernels allocate in SMEM."""
    from mrt.ops import budget

    # tri kernel: nodes (8,M) f32 + meta (4,M) i32; tris (9,T) f32.
    assert budget.TRI_NODE_BYTES == 8 * 4 + 4 * 4
    assert budget.TRI_BYTES == 9 * 4
    # sphere kernel: nodes+meta as above; spheres (4,S) f32.
    assert budget.SPHERE_NODE_BYTES == 48 and budget.SPHERE_BYTES == 16
    # TLAS kernel: tnodes (8,Mt) f32 + tmeta (3,Mt) i32 (t_inst,
    # t_escape, split axis); inst (12,I) f32 + imeta (2,I) i32.
    assert budget.TLAS_NODE_BYTES == 8 * 4 + 3 * 4
    assert budget.INSTANCE_BYTES == 12 * 4 + 2 * 4
