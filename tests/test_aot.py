"""TPU compile-ability regression gate (no TPU needed).

libtpu ships in the image, so an unattached v5e topology client runs
the full XLA+Mosaic pipeline locally (tools/aot_check.py).  This test
keeps the PRODUCTION persistent step — with the packet kernels the
TPU dispatch actually selects — compilable for TPU: interpret-mode
tests can't catch unimplemented Mosaic primitives (e.g. jnp.cbrt) or
tiling violations.
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


@pytest.mark.parametrize("scene_name", ["rtiow", "eve"])
def test_production_step_compiles_for_tpu(topo_sharding, scene_name,
                                          monkeypatch):
    """One persistent wavefront step per kernel family (sphere packet
    BVH for rtiow's class, two-level packet TLAS for eve's) through
    the REAL TPU kernel selection, compiled by the local Mosaic
    pipeline."""
    from mrt.scenes import get
    import mrt.integrator.persistent as PP
    import mrt.geometry.spheres as sph_mod

    monkeypatch.setattr(sph_mod, "_use_pallas",
                        lambda kind="packet": True)
    scene, camera = get(scene_name)(aspect_ratio=2.0).generate()
    w, h, samples, pool, depth = 64, 32, 2, 2048, 8

    (total, make_rays, step, maybe_flush, finalize, layout,
     neutral, _fp) = PP._build(scene, camera, w, h, 1, 0, samples, depth,
                          pool, 0, None, 1, None, None)
    slots_eff, slab, npix_pad, big_mode = layout
    dest = jnp.zeros((slots_eff if big_mode else npix_pad, 4),
                     jnp.float32)
    state = PP._init_state(make_rays, pool, dest, jnp.float32(0),
                           jnp.int32(0), PP._BIG, neutral)

    avals = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(jnp.shape(x),
                                       jnp.asarray(x).dtype,
                                       sharding=topo_sharding), state)
    compiled = jax.jit(step).lower(avals).compile()
    assert compiled.as_text()  # compiled artifact exists
