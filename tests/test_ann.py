"""ANN quality gates: measured recall vs brute force, candidate-set
sublinearity, and the Jaccard hot-shingle cap."""

from __future__ import annotations

import numpy as np
import pandas as pd

from fupi_spark import pipeline_queries as P
from fupi_spark import queries as Q


def _brute_top20(sf_dir):
    import duckdb

    con = duckdb.connect()
    rows = con.execute(
        f"SELECT vec_id, embedding FROM '{sf_dir}/embeddings.parquet'"
    ).fetchall()
    ids = np.array([r[0] for r in rows])
    m = np.array([r[1] for r in rows], dtype=np.float64)
    d2 = ((m - np.array(Q.QUERY_VEC)) ** 2).sum(axis=1)
    return set(ids[np.lexsort((ids, d2))[:20]]), len(ids)


def test_quantized_rerank_recall(spark, sf_dir):
    true20, _n = _brute_top20(sf_dir)
    got = {r.vec_id for r in Q.QUERIES["ann_quantized_rerank"](spark, sf_dir).collect()}
    recall = len(true20 & got) / 20
    assert recall >= 0.9, f"quantized rerank recall {recall}"


def test_lsh_topk_sublinear_and_floor(spark, sf_dir):
    """Multi-probe LSH must scan a sublinear candidate set; recall on
    the structureless synthetic embeddings is low by nature (documented
    in the query docstring) but must stay above the measured floor."""
    from pyspark.sql import functions as F

    from fupi_spark.ann import bucket_expr

    true20, n = _brute_top20(sf_dir)
    emb = Q.load(spark, sf_dir, "embeddings")
    cands = (
        emb.withColumn("bucket", bucket_expr("embedding", P.LSH_PLANES))
        .filter(F.col("bucket").isin(P._LSH_PROBES))
        .count()
    )
    assert cands < 0.3 * n, f"candidate set not sublinear: {cands}/{n}"

    got = {r.vec_id for r in Q.QUERIES["ann_lsh_topk"](spark, sf_dir).collect()}
    # every returned id must be a true candidate-set top hit; recall
    # floor is intentionally loose (see docstring)
    assert len(got) == min(20, cands)
    assert len(true20 & got) / 20 >= 0.05


def test_jaccard_hot_shingle_cap(spark):
    """A corpus where one shingle appears in every doc must not create
    quadratic candidate pairs."""
    from pyspark.sql import functions as F

    n_docs = 300
    rows = [(i, f"common one two unique{i} alpha{i} beta{i} gamma{i}") for i in range(n_docs)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    ds0 = P._spark_shingles(docs).distinct()
    hot = (
        ds0.groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") > P.JACCARD_DF_CAP)
        .select("shingle")
    )
    ds = ds0.join(hot, "shingle", "left_anti")
    a, b = ds.alias("a"), ds.alias("b")
    pairs = a.join(
        b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.doc_id") < F.col("b.doc_id"))
    ).count()
    # 'common one two' appears in all 300 docs -> 300*299/2 = 44850
    # pairs without the cap; with it, zero shared shingles remain
    assert pairs == 0

    # and with the cap disabled the explosion is real (sanity of the test)
    a0, b0 = ds0.alias("a"), ds0.alias("b")
    pairs0 = a0.join(
        b0, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.doc_id") < F.col("b.doc_id"))
    ).count()
    assert pairs0 == n_docs * (n_docs - 1) // 2


def test_quantization_roundtrip_bounds():
    """int8 scalar quantization error is bounded by half a step."""
    rng = np.random.default_rng(3)
    v = rng.uniform(-1, 1, 10_000)
    code = np.clip(np.floor((v + 1) * 127.5), 0, 255)
    deq = code / 127.5 - 1
    assert np.abs(deq - v).max() <= 1 / 127.5 + 1e-12


def test_cosine_neardup_over_stored_banded_index(spark, tmp_path):
    """VERDICT r4 #7: the dedup path and the 100 TB path are the same
    code. Build a SKEWED corpus (one viral near-constant cluster),
    persist the banded-bucket index to parquet, and run
    cosine_neardup_drops over the STORED columns with a hot-bucket cap:
    the hot bucket must be reported (never silently dropped), every
    surviving band bucket must respect the cap, and the drop set must
    equal a python brute-force replay of the same banded semantics."""
    import itertools

    from pyspark.sql import functions as F

    from fupi_spark.ann import banded_bucket_cols, cosine_neardup_drops, lsh_planes

    dim, n_bands, ppb, cap = 16, 2, 6, 40
    rng = np.random.default_rng(7)
    base = rng.normal(size=dim)
    rows = []
    for i in range(120):  # viral cluster: near-identical vectors
        rows.append((i, (base + rng.normal(scale=1e-3, size=dim)).tolist()))
    for i in range(120, 320):  # background: independent vectors
        rows.append((i, rng.normal(size=dim).tolist()))
    df = spark.createDataFrame(rows, "vec_id int, embedding array<double>")
    bands = banded_bucket_cols("embedding", n_bands, ppb, dim)
    idx_path = str(tmp_path / "stored_index")
    df.select(
        "vec_id", "embedding",
        *[b.alias(f"band_{i}") for i, b in enumerate(bands)],
    ).write.parquet(idx_path)

    stored = spark.read.parquet(idx_path)  # bucketing NOT recomputed
    band_cols = [f"band_{i}" for i in range(n_bands)]
    drops, report = cosine_neardup_drops(
        stored, "vec_id", "embedding", band_cols, tau=0.9, hot_bucket_cap=cap
    )
    got = sorted(r.vec_id for r in drops.collect())

    # the viral cluster lands in one bucket per band -> both reported
    assert report, "hot buckets must be reported, not silently skipped"
    assert all(r["rows"] >= 120 for r in report)
    # surviving buckets are bounded in every band
    for bc in band_cols:
        hot = {r["bucket"] for r in report if f"band_{band_cols.index(bc)}" == bc}
        sizes = (
            stored.filter(~F.col(bc).isin(list(hot)) if hot else F.lit(True))
            .groupBy(bc).count().collect()
        )
        assert all(r["count"] <= cap for r in sizes)

    # python replay of the same semantics (buckets from the same planes)
    planes = lsh_planes(n_bands * ppb, dim)
    vecs = {i: np.array(v) for i, v in rows}
    buckets = {}
    for i, v in vecs.items():
        bl = []
        for b in range(n_bands):
            bits = 0
            for j, p in enumerate(planes[b * ppb : (b + 1) * ppb]):
                dot = 0.0
                for x, w in zip(v, p):
                    dot += float(x) * float(w)
                if dot > 0:
                    bits |= 1 << j
            bl.append(bits)
        buckets[i] = bl
    hot_per_band = []
    for b in range(n_bands):
        from collections import Counter

        c = Counter(buckets[i][b] for i in vecs)
        hot_per_band.append({k for k, n in c.items() if n > cap})
    expected = set()
    for a, b_ in itertools.combinations(sorted(vecs), 2):
        collide = any(
            buckets[a][band] == buckets[b_][band]
            and buckets[a][band] not in hot_per_band[band]
            for band in range(n_bands)
        )
        if not collide:
            continue
        va, vb = vecs[a], vecs[b_]
        cos = float(va @ vb) / (np.sqrt(va @ va) * np.sqrt(vb @ vb))
        if cos >= 0.9:
            expected.add(max(a, b_))
    assert got == sorted(expected)


# -- product quantization ----------------------------------------------------


def test_pq_recall_and_determinism(spark):
    """PQ (S=8, K=16, 50-candidate rerank) must keep recall@10 >= 0.7
    vs the exact top-10 (measured 0.8 on this corpus — deterministic:
    seeded trainer, first-min tie-breaks), and encoding must be
    identical across parallelism levels."""
    from fupi_spark.pq import pq_encode, pq_lut, pq_topk, pq_train
    from fupi_spark.queries import QUERY_VEC, _l2_col, load

    emb = load(spark, "/root/testdata/sf0.01", "embeddings").select("vec_id", "embedding")
    books = pq_train(emb, "embedding", "vec_id", dim=64, iters=2)
    assert len(books) == 8 and all(len(b) == 16 for b in books)
    codes = pq_encode(emb, "embedding", "vec_id", books, dim=64)
    lut = pq_lut(QUERY_VEC, books)
    got = {
        r.vec_id
        for r in pq_topk(emb, codes, "embedding", "vec_id", lut, QUERY_VEC).collect()
    }
    exact = {
        r.vec_id
        for r in emb.withColumn("d", _l2_col("embedding", QUERY_VEC))
        .orderBy("d", "vec_id")
        .limit(10)
        .collect()
    }
    assert len(got & exact) >= 7

    # codes invariant under repartitioning (pure per-row expressions)
    a = sorted(map(tuple, codes.collect()))
    b = sorted(map(tuple, pq_encode(emb.repartition(13), "embedding", "vec_id", books, dim=64).collect()))
    assert a == b


def test_residual_pq_recall_floor(spark):
    """Residual encoding (quantize vec − cell centroid, per-cell query
    LUTs) keeps a recall@10 floor at the same code budget scanning ALL
    cells. Superiority over flat PQ is NOT asserted here: on this
    synthetic corpus the embeddings are near-isotropic, so K=4 coarse
    cells explain almost no variance and residual ≈ raw (measured: the
    two paths land within single-query noise of each other); the
    residual win materializes when cells capture real structure. The
    entry's hard contract is the oracle equality, not recall."""
    from fupi_spark.kmeans import assign_cells, kmeans_fit
    from fupi_spark.pq import (
        adc_distance,
        pq_encode,
        pq_lut,
        pq_topk,
        pq_train,
        query_residual,
        residual_col,
    )
    from fupi_spark.queries import QUERY_VEC, _l2_col, load
    from pyspark.sql import functions as F

    emb = load(spark, "/root/testdata/sf0.01", "embeddings").select(
        "vec_id", "embedding"
    )
    exact = {
        r.vec_id
        for r in emb.withColumn("d", _l2_col("embedding", QUERY_VEC))
        .orderBy("d", "vec_id")
        .limit(10)
        .collect()
    }

    # flat PQ
    books_f = pq_train(emb, "embedding", "vec_id", dim=64, iters=2)
    codes_f = pq_encode(emb, "embedding", "vec_id", books_f, dim=64)
    lut_f = pq_lut(QUERY_VEC, books_f)
    flat = {
        r.vec_id
        for r in pq_topk(emb, codes_f, "embedding", "vec_id", lut_f, QUERY_VEC).collect()
    }

    # residual PQ over ALL cells (no probe pruning: isolate encoding)
    cents = kmeans_fit(emb, "embedding", "vec_id", 4, iters=2)
    resid = (
        assign_cells(emb, "embedding", cents)
        .withColumn("_resid", residual_col("embedding", "cell", cents))
        .select("vec_id", "cell", "_resid")
        .cache()
    )
    resid.count()
    books_r = pq_train(resid, "_resid", "vec_id", dim=64, iters=2)
    codes_r = pq_encode(resid, "_resid", "vec_id", books_r, dim=64).cache()
    codes_r.count()
    per_cell = [
        codes_r.join(
            resid.select("vec_id", "cell").filter(F.col("cell") == c), "vec_id"
        ).withColumn(
            "_adc",
            adc_distance(pq_lut(query_residual(QUERY_VEC, cents[c]), books_r)),
        )
        for c in range(4)
    ]
    allc = per_cell[0]
    for p in per_cell[1:]:
        allc = allc.unionByName(p)
    cand = (
        allc.orderBy(F.col("_adc").asc(), F.col("vec_id").asc())
        .limit(50)
        .select("vec_id")
    )
    res = {
        r.vec_id
        for r in cand.join(emb, "vec_id")
        .withColumn("_d", _l2_col("embedding", QUERY_VEC))
        .orderBy("_d", "vec_id")
        .limit(10)
        .collect()
    }
    resid.unpersist(); codes_r.unpersist()
    assert len(flat & exact) >= 7  # flat-PQ recall (also gated above)
    assert len(res & exact) >= 5  # residual floor (0.6 measured)


def test_pq_train_fused_matches_sequential(spark, sf_dir):
    """r6: the shared-job PQ trainer must produce exactly the codebooks
    of the per-subspace kmeans_fit recipe (same init rows, same
    assignment arithmetic, same rounded means)."""
    from fupi_spark.kmeans import kmeans_fit
    from fupi_spark.pq import _sub_col, pq_train

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    fused = pq_train(emb, "embedding", "vec_id", dim=64, iters=2)
    seq = [
        kmeans_fit(
            emb.select("vec_id", _sub_col("embedding", s, 8).alias("_subv")),
            "_subv",
            "vec_id",
            16,
            iters=2,
        )
        for s in range(8)
    ]
    assert fused == seq


def test_l2_multi_col_bitwise_matches_l2_col(spark, sf_dir):
    """r6: the single nested-transform distance array is bit-identical
    to K independent _l2_col folds."""
    from pyspark.sql import functions as F

    from fupi_spark.queries import _l2_col, _l2_multi_col

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    cents = [[round(0.1 * ((i * 7 + j) % 13) - 0.5, 6) for j in range(64)] for i in range(9)]
    a = emb.select(
        "vec_id", F.array(*[_l2_col("embedding", c) for c in cents]).alias("d")
    )
    b = emb.select("vec_id", _l2_multi_col("embedding", cents).alias("d"))
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
