"""Single audited on-chip budget for the packet kernels' tables.

Round-1 had two inconsistent gates: the mesh-BVH gate admitted 8 MB
"VMEM" while its kernel put tables in SMEM, whose real budget the TLAS
gate measured at ~512 KB — a ~50k-triangle mesh could pass the gate and
fault Mosaic.  This module is now the only source of truth:

  * every resident packet kernel places its tables in SMEM
    (mrt/ops/pallas_bvh.py, pallas_spheres.py);
  * `SMEM_TABLE_BUDGET` is the measured usable table allocation
    (`tools/probe_stream.py probe_c` binary-searches the Mosaic
    boundary on hardware; tests/test_budget.py keeps the bytes-per-
    element accounting in sync with the kernels' actual BlockSpecs);
  * scenes whose tables exceed it route to the HBM-streamed kernel
    (mrt/ops/pallas_stream.py) instead of a fallback that faults.

Per-element byte costs (must match the kernel table layouts):
  sphere kernel  : nodes (8,M) f32 + meta (4,M) i32 -> 48 B/node,
                   spheres (4,S) f32                -> 16 B/sphere
  tri kernel     : nodes 48 B/node, tris (9,T) f32  -> 36 B/tri
  TLAS kernel    : tnodes (8,Mt) f32 + tmeta (3,Mt) i32 -> 44 B/node
                   inst (12,I) f32 + imeta (2,I) i32    -> 56 B/inst
                   bnodes 48 B/node, tris 36 B/tri
(meta row 3 of every node table carries the split axis for ordered
front-to-back descent; tmeta grew 2 -> 3 rows for it.)
"""

from __future__ import annotations

# Usable SMEM for kernel tables, bytes.  The hardware ceiling probed on
# TPU v5e is ~512 KB of scratch; keep headroom for kernel scalars,
# semaphores and the streamed kernel's page caches.
SMEM_TABLE_BUDGET = 448 * 1024

SPHERE_NODE_BYTES = 48
SPHERE_BYTES = 16
TRI_NODE_BYTES = 48
TRI_BYTES = 36
TLAS_NODE_BYTES = 44
INSTANCE_BYTES = 56


def sphere_tables_bytes(n_nodes: int, n_spheres: int) -> int:
    return n_nodes * SPHERE_NODE_BYTES + n_spheres * SPHERE_BYTES


def tri_tables_bytes(n_nodes: int, n_tris: int) -> int:
    return n_nodes * TRI_NODE_BYTES + n_tris * TRI_BYTES


def tlas_group_bytes(tlas) -> dict:
    """Per-group table bytes of a TLAS; groups can be resident/streamed
    independently (mrt/ops/pallas_stream.py)."""
    return dict(
        tlas=tlas.n_tlas_nodes * TLAS_NODE_BYTES,
        inst=tlas.transform.shape[0] * INSTANCE_BYTES,
        blas=tlas.bmin.shape[0] * TRI_NODE_BYTES,
        tri=tlas.tris.count * TRI_BYTES,
    )


def tlas_tables_bytes(tlas) -> int:
    return sum(tlas_group_bytes(tlas).values())


def fits(total_bytes: int) -> bool:
    return total_bytes < SMEM_TABLE_BUDGET
