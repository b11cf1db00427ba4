"""Pallas edge-SpMM kernel vs the XLA attraction path (interpret mode)."""

import numpy as np
import jax.numpy as jnp
import pytest

import graph_embed_tpu as gt
from graph_embed_tpu.forceatlas import forces as F
from graph_embed_tpu.ops.pallas import edge_spmm as ES

from conftest import random_graph


def _attraction_xla(g, coords, deg, **kw):
    return F.attraction_csr(coords, g.senders, g.receivers, g.weights,
                            deg + 1.0, g.num_edges, attract=kw.get("attract", 1.0),
                            eps=1e-5, linlog=kw.get("linlog", False),
                            delta=kw.get("delta", 1.0),
                            nohubs=kw.get("nohubs", False),
                            use_weights=kw.get("use_weights", True))


@pytest.mark.parametrize("n,linlog", [(100, False), (300, True), (130, False)])
def test_tiled_attraction_matches_xla(rng, n, linlog):
    g = random_graph(rng, n, avg_deg=6, dtype="float32")
    coords = rng.uniform(-1, 1, size=(n, 3)).astype(np.float32)
    deg = np.asarray(g.degrees(True))
    tiles = ES.build_edge_tiles(g, tile=128)
    xT = ES.pad_coords_T(jnp.asarray(coords), tiles.n_pad)
    out_T = ES.attraction_tiled(xT, tiles, linlog=linlog, interpret=True)
    got = np.asarray(ES.unpad_coords_T(out_T, n, 3))
    want = np.asarray(_attraction_xla(g, jnp.asarray(coords),
                                      jnp.asarray(deg), linlog=linlog))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_tiled_attraction_folded_variants(rng):
    n = 90
    g = random_graph(rng, n, avg_deg=5, dtype="float32")
    coords = rng.uniform(-1, 1, size=(n, 2)).astype(np.float32)
    deg = np.asarray(g.degrees(True))
    s, r, w = g.to_coo_numpy()
    folded = ES.fold_edge_weights(w, deg[s], use_weights=True, delta=0.5,
                                  nohubs=True)
    tiles = ES.build_edge_tiles(g, tile=128, weights=folded)
    xT = ES.pad_coords_T(jnp.asarray(coords), tiles.n_pad)
    out_T = ES.attraction_tiled(xT, tiles, interpret=True)
    got = np.asarray(ES.unpad_coords_T(out_T, n, 2))
    want = np.asarray(_attraction_xla(g, jnp.asarray(coords),
                                      jnp.asarray(deg), delta=0.5,
                                      nohubs=True))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_tiles_cover_all_edges(rng):
    g = random_graph(rng, 200, avg_deg=4, dtype="float32")
    tiles = ES.build_edge_tiles(g, tile=64)
    # every edge appears exactly once: total nonzero weight count matches
    assert int((tiles.wt != 0).sum()) == int(
        (np.asarray(g.weights)[: g.num_edges] != 0).sum())
    # sender blocks contiguous in grid order
    sb = tiles.sb
    seen = set()
    prev = -1
    for b in sb:
        if b != prev:
            assert b not in seen
            seen.add(b)
            prev = b
    # every block appears
    assert seen == set(range(tiles.n_blocks))
    assert 0 < tiles.fill <= 1


def test_edge_mask(rng):
    n = 64
    g = random_graph(rng, n, avg_deg=4, dtype="float32")
    coords = rng.uniform(-1, 1, size=(n, 3)).astype(np.float32)
    mask = np.zeros(g.num_edges, dtype=bool)  # all edges masked out
    tiles = ES.build_edge_tiles(g, tile=128, edge_mask=mask)
    xT = ES.pad_coords_T(jnp.asarray(coords), tiles.n_pad)
    out_T = ES.attraction_tiled(xT, tiles, interpret=True)
    np.testing.assert_allclose(np.asarray(out_T), 0.0)


def test_chunked_spmv_matches_single_call(rng):
    """Tilings over the scalar-prefetch SMEM budget split into block-aligned
    pallas calls whose concatenated output equals the single-call result."""
    import jax.numpy as jnp

    from graph_embed_tpu.ops.pallas import edge_spmm as ES

    n = 1600
    s = rng.integers(0, n, size=4000)
    r = rng.integers(0, n, size=4000)
    keep = s != r
    g = gt.from_edges(s[keep], r[keep], None, n=n, symmetrize=True,
                      dtype=jnp.float32)
    tiles = ES.build_window_tiles(g, tile=128)
    assert not tiles.chunks
    # force chunking at a tiny budget
    chunks = ES._slab_chunks(tiles.sbf, max_slabs=max(tiles.num_tiles // 3, 2))
    assert len(chunks) > 1
    assert chunks[0][0] == 0 and chunks[-1][1] == tiles.num_tiles
    assert chunks[0][2] == 0 and chunks[-1][3] == tiles.n_sblocks
    for (lo, hi, blo, bhi), (lo2, _, blo2, _) in zip(chunks, chunks[1:]):
        assert hi == lo2 and bhi == blo2
    import dataclasses
    tiles_c = dataclasses.replace(tiles, chunks=chunks)
    xT = jnp.asarray(rng.uniform(-1, 1, size=(ES.D_PAD, tiles.n_pad)),
                     jnp.float32)
    want = np.asarray(ES.spmv_windowed(xT, tiles, interpret=True))
    got = np.asarray(ES.spmv_windowed(xT, tiles_c, interpret=True))
    cols = tiles.n_sblocks * tiles.sender_block
    np.testing.assert_allclose(got[:, :cols], want[:, :cols], rtol=1e-6)
