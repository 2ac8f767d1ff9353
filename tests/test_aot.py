"""TPU compile-ability regression gate (no TPU needed).

libtpu ships in the image, so an unattached v5e topology client runs
the full XLA+Mosaic pipeline locally (tools/aot_check.py).  This test
keeps the megastep kernel compilable for TPU: interpret-mode tests
can't catch unimplemented Mosaic primitives (e.g. jnp.cbrt) or tiling
violations.
"""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest


@pytest.fixture(scope="module")
def topo_sharding():
    os.environ.setdefault("TPU_ACCELERATOR_TYPE", "v5litepod-4")
    os.environ.setdefault("TPU_WORKER_HOSTNAMES", "localhost")
    from jax.experimental import topologies
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    try:
        topo = topologies.get_topology_desc("v5e:2x2", "tpu")
    except Exception as e:  # pragma: no cover - image without libtpu
        pytest.skip(f"no local TPU compiler: {e}")
    mesh = Mesh(np.array(topo.devices[:1]), ("d",))
    return NamedSharding(mesh, P())


def test_megastep_compiles_for_tpu(topo_sharding):
    from mrt.scenes import get
    from mrt.ops import pallas_megastep as mk
    import mrt.integrator.persistent as PP

    scene, camera = get("rtiow")(aspect_ratio=2.0, grid=6).generate()
    scene = mk.with_sphere_bvh(scene)
    w, h, samples, pool, depth = 64, 32, 2, 2048, 8

    (total, make_rays, step, maybe_flush, finalize, layout,
     neutral) = PP._build(scene, camera, w, h, 1, 0, samples, depth,
                          pool, 0, None, 1, None, None)
    slots_eff, slab, npix_pad, big_mode = layout
    dest = jnp.zeros((slots_eff if big_mode else npix_pad, 4),
                     jnp.float32)
    state = PP._init_state(make_rays, pool, dest, jnp.float32(0),
                           jnp.int32(0), PP._BIG, neutral, mega=True)

    def blk(st):
        return mk.run_block(
            scene, camera, st, width=w, height=h, seed=1,
            sample_start=0, samples=samples, max_depth=depth, pool=pool,
            slots_eff=slots_eff if big_mode else npix_pad,
            big_mode=big_mode, k_steps=8, t_min=PP.T_MIN,
            neutral=neutral, rr_depth=2)

    avals = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(jnp.shape(x),
                                       jnp.asarray(x).dtype,
                                       sharding=topo_sharding), state)
    compiled = jax.jit(blk).lower(avals).compile()
    assert compiled.as_text()  # compiled artifact exists
