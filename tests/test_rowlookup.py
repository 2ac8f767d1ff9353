"""Bit-exactness of the one-hot MXU row lookup (mrt/ops/rowlookup.py)
against the plain gather, on real scene tables and adversarial values.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from mrt.ops import rowlookup


def _check_table(table, mtype):
    n = table.shape[0]
    rows = jnp.asarray(
        np.random.RandomState(0).randint(0, n, size=4096), jnp.int32)
    got = rowlookup.take_rows(table, rows)
    want = table[rows]
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    got_p, got_i = rowlookup.take_rows_with_int(table, mtype, rows)
    np.testing.assert_array_equal(np.asarray(got_p), np.asarray(want))
    np.testing.assert_array_equal(np.asarray(got_i),
                                  np.asarray(mtype[rows]))


def test_adversarial_values():
    # Values with long mantissas, tiny/huge magnitudes, negatives.
    vals = np.array(
        [[0.0, 1.0, 0.1, 1.0 / 3.0],
         [np.pi, 1e-20, 1e20, -0.7],
         [np.nextafter(1.0, 2.0), 1.5, 2.4, 1e-8],
         [123456.789, -1e-15, 0.30000001, 7.7]], np.float32)
    table = jnp.asarray(np.tile(vals, (100, 1)))
    mtype = jnp.asarray(np.arange(400) % 9, jnp.int32)
    _check_table(table, mtype)


@pytest.mark.parametrize("scene_name", ["rtiow", "cornell", "lucy"])
def test_scene_tables(scene_name):
    from mrt.scenes import get

    scene, _ = get(scene_name)(aspect_ratio=1.0).generate()
    _check_table(scene.materials.params, scene.materials.mtype)


def test_big_table_falls_back_to_gather(monkeypatch):
    table = jnp.asarray(
        np.random.RandomState(1).randn(rowlookup.MAX_ROWS + 1, 3)
        .astype(np.float32))
    rows = jnp.asarray([0, 5, rowlookup.MAX_ROWS], jnp.int32)
    got = rowlookup.take_rows(table, rows)
    np.testing.assert_array_equal(np.asarray(got),
                                  np.asarray(table[rows]))
