"""Round-4 verdict fixes: distributed region dissolve, dedup_clusters
pointer jumping, layer_viewshed extent guard."""

import numpy as np
import pytest

from geotrellis_spark.core import raster_ops


def _tile_layer_df(spark, world, T, zoom):
    import pandas as pd

    from geotrellis_spark.core import codecs, sfc

    rows = []
    for kr in range(world.shape[0] // T):
        for kc in range(world.shape[1] // T):
            tile = world[kr * T : (kr + 1) * T, kc * T : (kc + 1) * T]
            rows.append({
                "layer": "l", "zoom": zoom, "key_col": kc, "key_row": kr,
                "cell_id": int(sfc.zorder(kc, kr)),
                "tile": codecs.encode_tile(tile, "raw16"),
                "fmt": "raw16",
            })
    return spark.createDataFrame(pd.DataFrame(rows))


def _assemble(out, T, shape):
    got = np.zeros(shape, dtype=np.int64)
    for r in out.collect():
        lab = np.frombuffer(bytes(r["labels"]), dtype=np.int64).reshape(T, T)
        got[r["key_row"] * T : (r["key_row"] + 1) * T,
            r["key_col"] * T : (r["key_col"] + 1) * T] = lab
    return got


def test_region_group_layer_distributed_path_bit_identical(spark):
    """max_driver_edges=0 trips the guard: the dedup_clusters min-label
    propagation dissolve must produce region ids BIT-IDENTICAL to the
    driver union-find (both fixpoints are the component minimum packed
    node id), and bijective with the whole-array labeling."""
    from geotrellis_spark.operators import iterative

    T = 16
    rng = np.random.default_rng(5)
    world = rng.choice([1, 1, 2, 3], size=(2 * T, 2 * T)).astype(np.uint16)
    world[rng.random((2 * T, 2 * T)) < 0.08] = 65535
    df = _tile_layer_df(spark, world, T, zoom=1)

    driver = _assemble(
        iterative.region_group_layer(df, tile_size=T), T, world.shape
    )
    dist = _assemble(
        iterative.region_group_layer(df, tile_size=T, max_driver_edges=0),
        T, world.shape,
    )
    np.testing.assert_array_equal(driver, dist)

    want = raster_ops.region_group(world, 4)
    np.testing.assert_array_equal(dist == 0, want == 0)
    fwd, bwd = {}, {}
    for g, w in zip(dist.ravel(), want.ravel()):
        if w == 0:
            continue
        assert fwd.setdefault(w, g) == g
        assert bwd.setdefault(g, w) == w
    assert len(fwd) == int(want.max())


def test_region_group_layer_distributed_8conn_snake(spark):
    """A snake region threading all tiles of a 4x4 layout (long label-
    graph diameter — the pointer-jump case) dissolves to one region on
    the distributed path, 8-conn corner junctions included."""
    from geotrellis_spark.operators import iterative

    T = 8
    n = 4
    world = np.zeros((n * T, n * T), dtype=np.uint16)
    # boustrophedon one-pixel snake: row 0 L->R, then down, row 2T-1
    # R->L, etc. — a single 4-connected region crossing every tile
    for band in range(n):
        r = band * T
        world[r, :] = 7
        if band + 1 < n:
            col = (n * T - 1) if band % 2 == 0 else 0
            world[r : r + T + 1, col] = 7
    world[world == 0] = 1
    df = _tile_layer_df(spark, world, T, zoom=2)
    for conn in (4, 8):
        out = iterative.region_group_layer(
            df, tile_size=T, connectivity=conn, max_driver_edges=0
        )
        got = _assemble(out, T, world.shape)
        want = raster_ops.region_group(world, conn)
        fwd, bwd = {}, {}
        for g, w in zip(got.ravel(), want.ravel()):
            assert fwd.setdefault(w, g) == g, (conn, w, g)
            assert bwd.setdefault(g, w) == w, (conn, g, w)
        # the snake is ONE region everywhere
        snake_ids = set(got[world == 7].ravel().tolist())
        assert len(snake_ids) == 1


def test_dedup_clusters_shortcut_fixpoint_on_chain(spark):
    """Pointer jumping: a 40-node path graph (diameter 40) converges
    well inside 25 rounds and every node maps to the chain minimum."""
    from geotrellis_spark.operators.dedup import dedup_clusters

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(100, 140)], "doc_a long, doc_b long"
    )
    out = {r["doc_id"]: r["cluster"] for r in dedup_clusters(pairs).collect()}
    assert len(out) == 41
    assert set(out.values()) == {100}

    # shortcut off: same fixpoint (sanity that the knob is semantic-free)
    out2 = {
        r["doc_id"]: r["cluster"]
        for r in dedup_clusters(pairs, max_iters=60, shortcut=False).collect()
    }
    assert out == out2


def test_layer_viewshed_gather_guard(spark):
    """Extent guard: a tiny max_gather_bytes refuses before shuffling
    terrain; the default budget leaves small layers working."""
    from geotrellis_spark.operators import iterative

    T = 16
    rng = np.random.default_rng(9)
    world = (rng.random((2 * T, 2 * T)) * 50).astype(np.uint16)
    df = _tile_layer_df(spark, world, T, zoom=1)
    with pytest.raises(ValueError, match="max_gather_bytes"):
        iterative.layer_viewshed(
            df, vr=10, vc=10, tile_size=T, max_gather_bytes=1024
        )
    out = iterative.layer_viewshed(df, vr=10, vc=10, tile_size=T)
    got = np.zeros_like(world, dtype=bool)
    for r in out.collect():
        vis = np.frombuffer(bytes(r["visible"]), dtype=bool).reshape(T, T)
        got[r["key_row"] * T : (r["key_row"] + 1) * T,
            r["key_col"] * T : (r["key_col"] + 1) * T] = vis
    np.testing.assert_array_equal(got, raster_ops.viewshed(world, 10, 10))


def test_minhash_candidates_from_precomputed_signatures(spark):
    """The incremental-ingest seam: candidate pairs from a stored
    signature table must equal pairs computed from the raw text, and
    the signature join must ignore signatures of absent docs."""
    from geotrellis_spark.operators import dedup

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).limit(200)
    sigs = dedup.minhash_signatures(docs)
    # extra signature rows for docs NOT in the corpus must not leak in
    ghost = sigs.selectExpr("doc_id + 1000000 as doc_id", *[
        f"mh{i}" for i in range(8)
    ])
    direct = {
        (r["doc_a"], r["doc_b"])
        for r in dedup.minhash_candidates(docs).collect()
    }
    via_sigs = {
        (r["doc_a"], r["doc_b"])
        for r in dedup.minhash_candidates(
            docs, signatures=sigs.unionByName(ghost)
        ).collect()
    }
    assert direct == via_sigs
    # capped production entry agrees with itself through the seam too
    capped_direct = {
        (r["doc_a"], r["doc_b"]) for r in dedup.minhash_dedup(docs).collect()
    }
    capped_sigs = {
        (r["doc_a"], r["doc_b"])
        for r in dedup.minhash_dedup(docs, signatures=sigs).collect()
    }
    assert capped_direct == capped_sigs
