"""Slot-space (Pallas fast-path) multilevel refinement vs the portable
implementation (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import graph_embed_tpu as gt
from graph_embed_tpu.forceatlas import multilevel as ml
from graph_embed_tpu.forceatlas import multilevel_tiled as mlt
from graph_embed_tpu.utils.params import MultilevelFAParams


def _level(rng, n=120, m=10, d=2, weighted=False):
    mm = n * 3
    s = rng.integers(0, n, size=mm)
    r = rng.integers(0, n, size=mm)
    keep = s != r
    w = rng.uniform(0.5, 2.0, size=keep.sum()) if weighted else None
    g = gt.from_edges(s[keep], r[keep], w, n=n, symmetrize=True,
                      dtype=jnp.float32)
    v2a = rng.integers(0, m, size=n).astype(np.int32)
    v2a[:m] = np.arange(m)
    part = gt.Partition(jnp.asarray(v2a), m)
    coords_A = rng.uniform(-1, 1, size=(m, d)).astype(np.float32)
    return g, part, v2a, coords_A


def test_refine_forces_match_portable(rng):
    g, part, v2a, coords_A = _level(rng)
    params = MultilevelFAParams()
    layout = mlt.prepare_refine(g, part, params, tile=128)
    coords_v = rng.uniform(-1, 1, size=(g.n, 2)).astype(np.float32)

    # portable reference forces (gram repulsion, f32 weights)
    members = ml.build_member_buckets(part)
    deg_loc = ml.local_degrees(g, part, True)
    pull_vec = ml.external_pull(g, part, jnp.asarray(coords_A),
                                pull=params.pull, eps=params.epsilon)
    want = np.asarray(ml.ml_forces(jnp.asarray(coords_v), g, part, members,
                                   deg_loc, pull_vec, params))

    slot = np.asarray(layout.slot_of_vertex)
    coords_s = np.zeros((layout.n_slots, 2), np.float32)
    coords_s[slot] = coords_v
    pull_s = np.zeros((layout.n_slots, 2), np.float32)
    pull_s[slot] = np.asarray(pull_vec)
    got_s = mlt.refine_forces(jnp.asarray(coords_s), layout,
                              jnp.asarray(pull_s), params, 2,
                              interpret=True)
    got = np.asarray(got_s)[slot]
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


def test_refine_level_tiled_runs_and_packs(rng):
    g, part, v2a, coords_A = _level(rng, n=90, m=8)
    r_A = rng.uniform(0.5, 1.0, size=8).astype(np.float32)
    out = np.asarray(mlt.refine_level_tiled(
        g, part, jnp.asarray(coords_A), jnp.asarray(r_A), 2,
        key=jax.random.PRNGKey(0), iterations=4, interpret=True))
    assert out.shape == (g.n, 2)
    assert np.isfinite(out).all()
    dist = np.linalg.norm(out - coords_A[v2a], axis=1)
    assert (dist <= r_A[v2a] + 1e-5).all()


def test_layout_invariants(rng):
    g, part, v2a, _ = _level(rng, n=200, m=16)
    layout = mlt.prepare_refine(g, part, MultilevelFAParams())
    slot = np.asarray(layout.slot_of_vertex)
    assert len(set(slot.tolist())) == g.n          # injective
    agg = np.asarray(layout.agg_of_slot)
    np.testing.assert_array_equal(agg[slot], v2a)  # consistent
    valid = np.asarray(layout.valid_slot)
    assert valid.sum() == g.n
    # slots of one aggregate are contiguous
    for a in range(part.num_aggs):
        ss = np.sort(slot[v2a == a])
        assert (np.diff(ss) == 1).all()
