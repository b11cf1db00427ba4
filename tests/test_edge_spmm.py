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


def test_windowed_unit_large_blocks_scattered(rng):
    """Unit packing at large (sender_block, window) on a SCATTERED graph --
    the shape regime bench.py's power-law workload uses (small cells go
    near-empty on scattered graphs; 1024-4096-wide cells are dense again).
    Exercises G = window/128 > 8 hi-mask paths of the v7 kernel."""
    n = 2500
    m = 9000
    s = rng.integers(0, n, size=m)
    r = rng.integers(0, n, size=m)
    keep = s != r
    g = gt.from_edges(s[keep], r[keep], None, n=n, symmetrize=True,
                      dtype=jnp.float32)
    sco, rco, wco = g.to_coo_numpy()
    g = gt.from_edges(sco, rco, np.ones(sco.size, np.float32), n=n,
                      symmetrize=False, dtype=jnp.float32)
    tiles = ES.build_window_tiles(g, tile=128, sender_block=1024,
                                  window=2048, packing="unit")
    assert tiles.packing == "unit"
    xT = jnp.asarray(rng.uniform(-1, 1, size=(ES.D_PAD, tiles.n_pad)),
                     jnp.float32)
    got = np.asarray(ES.spmv_windowed(xT, tiles, interpret=True))
    # dense oracle: y[:, i] = sum_j over edges (i, j) of x[:, j]
    x = np.asarray(xT)
    want = np.zeros_like(x)
    np.add.at(want.T, sco, x.T[rco])
    np.testing.assert_allclose(got[:, :n], want[:, :n], rtol=2e-4,
                               atol=2e-5)


def test_tiered_tiles_exact_partition_and_spmv(rng):
    """Tiered tiling: every edge claimed by exactly one tier; the summed
    SpMV equals the dense oracle.  Community-blocked graph + scattered
    residual -- the bimodal structure tiers exist for."""
    # 4 communities x 640 vertices, dense-ish intra, scattered inter
    k, m = 4, 640
    n = k * m
    ss, rr = [], []
    for c in range(k):
        s = rng.integers(0, m, size=4000) + c * m
        r = rng.integers(0, m, size=4000) + c * m
        ss.append(s)
        rr.append(r)
    ss.append(rng.integers(0, n, size=1500))
    rr.append(rng.integers(0, n, size=1500))
    s = np.concatenate(ss)
    r = np.concatenate(rr)
    keep = s != r
    g = gt.from_edges(s[keep], r[keep], None, n=n, symmetrize=True,
                      dtype=jnp.float32)
    sco, rco, wco = g.to_coo_numpy()

    tiles = ES.build_tiered_tiles(
        g, specs=[(256, 256, 128), (1024, 2048, 128)], thresholds=[32])
    assert len(tiles.tiers) == 2
    # exact partition: per-tier live slots sum to the edge count (the
    # 'wide' jumbo tier counts its weight plane; index word 0 is a live
    # (0, 0)-local edge there)
    live = sum(int((t.packed[:, -1] != 0).sum()) + t.num_overflow
               for t in tiles.tiers)
    assert live == g.num_edges
    assert tiles.tiers[0].fill > tiles.tiers[1].fill * 0  # both built

    xT = jnp.asarray(rng.uniform(-1, 1, size=(ES.D_PAD, tiles.n_pad)),
                     jnp.float32)
    got = np.asarray(ES.spmv_tiered(xT, tiles, interpret=True))
    x = np.asarray(xT)
    want = np.zeros_like(x)
    np.add.at(want.T, sco, (wco[:, None] * x.T[rco]))
    np.testing.assert_allclose(got[:, :n], want[:, :n], rtol=2e-3,
                               atol=2e-4)
    # row sums match the weighted degree
    degs = np.zeros(n)
    np.add.at(degs, sco, wco)
    np.testing.assert_allclose(ES.tiered_row_sums(tiles)[:n], degs,
                               rtol=2e-3, atol=1e-4)


def test_windowed_v9_matches_v7_bitwise(rng):
    """The full-vreg-join jumbo kernel (v9) must be BIT-identical to v7:
    same products, and every slot matches exactly one hi digit so all other
    join terms are true zeros."""
    n = 2500
    m = 9000
    s = rng.integers(0, n, size=m)
    r = rng.integers(0, n, size=m)
    keep = s != r
    g = gt.from_edges(s[keep], r[keep], None, n=n, symmetrize=True,
                      dtype=jnp.float32)
    sco, rco, _ = g.to_coo_numpy()
    g = gt.from_edges(sco, rco, np.ones(sco.size, np.float32), n=n,
                      symmetrize=False, dtype=jnp.float32)
    tiles = ES.build_window_tiles(g, tile=128, sender_block=2048,
                                  window=2048, packing="unit")
    xT = jnp.asarray(rng.uniform(-1, 1, size=(ES.D_PAD, tiles.n_pad)),
                     jnp.float32)
    a = np.asarray(ES.spmv_windowed(xT, tiles, interpret=True,
                                    variant="v9"))
    v7 = np.asarray(ES.spmv_windowed(xT, tiles, interpret=True,
                                     variant="v7"))
    # the claim in the name: BIT-identical to the previously shipped v7
    # (round-3 ADVICE -- this was only evidenced by an on-chip checksum)
    np.testing.assert_array_equal(a, v7)
    p4 = ES.pair_window_tiles(tiles, 4)
    a4 = np.asarray(ES.spmv_windowed(xT, p4, interpret=True, variant="v9p4"))
    np.testing.assert_array_equal(a4, v7)
    b = np.asarray(ES.spmv_windowed(xT, tiles, interpret=True,
                                    variant="v6"))
    got = np.asarray(a)
    x = np.asarray(xT)
    want = np.zeros_like(x)
    np.add.at(want.T, sco, x.T[rco])
    np.testing.assert_allclose(got[:, :n], want[:, :n], rtol=2e-4, atol=2e-5)
    # v9 vs the plain one-hot kernel agree to f32 exactness of the shared
    # bf16 hi/lo split structure
    np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-5)


def test_windowed_v12_dynamic_gather(rng):
    """v12 (two-stage tpu.dynamic_gather join): exact-f32 gather side, the
    v9 scatter join -- matches the scipy oracle at least as tightly as v7,
    and v12p4 is bitwise v12 on pair-padded tiles.  Unknown variants and
    out-of-range v11 must raise (round-3 ADVICE)."""
    import pytest

    n = 2500
    m = 9000
    s = rng.integers(0, n, size=m)
    r = rng.integers(0, n, size=m)
    keep = s != r
    g = gt.from_edges(s[keep], r[keep], None, n=n, symmetrize=True,
                      dtype=jnp.float32)
    sco, rco, _ = g.to_coo_numpy()
    g = gt.from_edges(sco, rco, np.ones(sco.size, np.float32), n=n,
                      symmetrize=False, dtype=jnp.float32)
    tiles = ES.build_window_tiles(g, tile=128, sender_block=2048,
                                  window=2048, packing="unit")
    xT = jnp.asarray(rng.uniform(-1, 1, size=(ES.D_PAD, tiles.n_pad)),
                     jnp.float32)
    got = np.asarray(ES.spmv_windowed(xT, tiles, interpret=True,
                                      variant="v12", dmax=4))
    x = np.asarray(xT)
    want = np.zeros_like(x)
    np.add.at(want.T, sco, x.T[rco])
    np.testing.assert_allclose(got[:4, :n], want[:4, :n], rtol=2e-4,
                               atol=2e-5)
    p4 = ES.pair_window_tiles(tiles, 4)
    got4 = np.asarray(ES.spmv_windowed(xT, p4, interpret=True,
                                       variant="v12p4", dmax=4))
    np.testing.assert_array_equal(got4, got)
    # k=8 grouping (the round-4 measured default for long slab runs,
    # ES.jumbo_group) is bitwise k=1 too
    p8 = ES.pair_window_tiles(tiles, 8)
    got8 = np.asarray(ES.spmv_windowed(xT, p8, interpret=True,
                                       variant="v12p8", dmax=4))
    np.testing.assert_array_equal(got8, got)
    assert ES.jumbo_group(tiles) in (4, 8)
    with pytest.raises(ValueError, match="unknown spmv_windowed variant"):
        ES.spmv_windowed(xT, tiles, interpret=True, variant="v9p16")
    with pytest.raises(ValueError, match="v11"):
        ES.spmv_windowed(xT, tiles, interpret=True, variant="v11", dmax=8)


def test_windowed_paired_chunked_matches(rng):
    """Paired tiles whose slab count crosses the scalar-prefetch budget run
    as multiple k-aligned chunked calls; output must equal the unpaired
    single-call result (chunk boundaries split at sender blocks, whose
    slab counts pair_window_tiles pads to k-multiples)."""
    import dataclasses

    n = 1600
    s = rng.integers(0, n, size=4000)
    r = rng.integers(0, n, size=4000)
    keep = s != r
    g = gt.from_edges(s[keep], r[keep], None, n=n, symmetrize=True,
                      dtype=jnp.float32)
    sco, rco, _ = g.to_coo_numpy()
    g = gt.from_edges(sco, rco, np.ones(sco.size, np.float32), n=n,
                      symmetrize=False, dtype=jnp.float32)
    tiles = ES.build_window_tiles(g, tile=128, packing="unit")
    paired = ES.pair_window_tiles(tiles, 2)
    chunks = ES._slab_chunks(paired.sbf,
                             max_slabs=max(paired.num_tiles // 3, 2))
    assert len(chunks) > 1
    for (lo, hi, _, _) in chunks:
        assert lo % 2 == 0 and hi % 2 == 0
    paired_c = dataclasses.replace(paired, chunks=chunks)
    xT = jnp.asarray(rng.uniform(-1, 1, size=(ES.D_PAD, tiles.n_pad)),
                     jnp.float32)
    want = np.asarray(ES.spmv_windowed(xT, tiles, interpret=True,
                                       variant="v9"))
    got = np.asarray(ES.spmv_windowed(xT, paired_c, interpret=True,
                                      variant="v9p2"))
    cols = tiles.n_sblocks * tiles.sender_block
    np.testing.assert_array_equal(got[:, :cols], want[:, :cols])


def test_v12b_bf16_pair_gather_matches_reference(rng):
    """The v12b bf16-pair x layout (round 5): half the window DMA and half
    the gather shuffle chains; error bounded by the bf16 quantization of x
    times the row degree (the bf16-packing tolerance class)."""
    n, E = 4000, 50000
    s = rng.integers(0, n, E)
    r = rng.integers(0, n, E)
    keep = s != r
    s, r = s[keep].astype(np.int64), r[keep].astype(np.int64)
    w1 = np.ones(s.size, np.float32)
    x0 = rng.uniform(-1, 1, size=(n, 3)).astype(np.float32)
    yref = np.zeros((n, 3), np.float32)
    np.add.at(yref, s, x0[r])
    deg = np.bincount(s, minlength=n).astype(np.float32)
    from graph_embed_tpu.parallel.sharded import _CooShim
    for B, W, k in ((2048, 2048, 4), (1024, 4096, 2)):
        t = ES.build_window_tiles(_CooShim(s, r, w1, n), tile=1024,
                                  sender_block=B, window=W, packing="unit")
        tk = ES.pair_window_tiles(t, k)
        xT = jnp.zeros((ES.D_PAD, t.n_pad), jnp.float32).at[:3, :n].set(
            jnp.asarray(x0).T)
        y = ES.spmv_windowed(xT, tk, dmax=4, variant=f"v12bp{k}",
                             interpret=True)
        got = np.asarray(y[:3, :n]).T
        tol = 0.004 * np.maximum(deg, 1.0)[:, None]
        assert (np.abs(got - yref) <= tol).all()


def test_spmv_rejects_unknown_x_precision(rng):
    n, E = 500, 4000
    s = rng.integers(0, n, E)
    r = rng.integers(0, n, E)
    keep = s != r
    from graph_embed_tpu.parallel.sharded import _CooShim
    t = ES.build_window_tiles(
        _CooShim(s[keep].astype(np.int64), r[keep].astype(np.int64),
                 np.ones(int(keep.sum()), np.float32), n),
        tile=512, sender_block=256, window=256, packing="unit")
    xT = jnp.zeros((ES.D_PAD, t.n_pad), jnp.float32)
    with pytest.raises(ValueError, match="x_precision"):
        ES.spmv_windowed(xT, t, dmax=4, x_precision="fp16", interpret=True)
