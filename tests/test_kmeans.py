"""Distributed Lloyd k-means (kmeans.py): determinism across
partitioning (the seeded-init + rounding contract, VERDICT r4 #5) and
argmin correctness vs numpy."""

from __future__ import annotations

import numpy as np

from fupi_spark.kmeans import assign_cells, kmeans_fit, update_centroids


def _vec_df(spark, n=200, dim=16, parts=4, seed=3):
    rng = np.random.default_rng(seed)
    centers = rng.normal(scale=4.0, size=(3, dim))
    rows = [
        (i, (centers[i % 3] + rng.normal(size=dim)).tolist())
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "vec_id int, embedding array<double>").repartition(parts)


def test_kmeans_deterministic_across_partitioning(spark):
    df = _vec_df(spark)
    c_a = kmeans_fit(df.repartition(2), "embedding", "vec_id", 3, iters=3)
    c_b = kmeans_fit(df.repartition(8), "embedding", "vec_id", 3, iters=3)
    assert c_a == c_b, "rounded Lloyd must not depend on partitioning"
    # and re-running is bit-stable
    assert c_a == kmeans_fit(df, "embedding", "vec_id", 3, iters=3)


def test_assign_cells_is_argmin(spark):
    df = _vec_df(spark, n=80)
    cents = kmeans_fit(df, "embedding", "vec_id", 3, iters=2)
    got = {
        r.vec_id: r.cell
        for r in assign_cells(df, "embedding", cents).select("vec_id", "cell").collect()
    }
    vecs = {r.vec_id: np.array(r.embedding) for r in df.collect()}
    cen = np.array(cents)
    for vid, v in vecs.items():
        d = ((cen - v) ** 2).sum(axis=1)
        assert got[vid] == int(np.argmin(d))


def test_update_centroids_are_means(spark):
    df = _vec_df(spark, n=60)
    cents = kmeans_fit(df, "embedding", "vec_id", 3, iters=1)
    assigned = assign_cells(df, "embedding", cents)
    nxt = update_centroids(assigned, "embedding", cents)
    pdf = assigned.select("vec_id", "cell", "embedding").toPandas()
    for cell in sorted(pdf["cell"].unique()):
        m = np.mean(np.stack(pdf[pdf.cell == cell]["embedding"].to_numpy()), axis=0)
        assert nxt[cell] == [round(float(x), 6) for x in m]


def test_ivf_kmeans_recall_floor(spark, sf_dir):
    """Trained-IVF probe recall@10 vs brute force on the driver
    embeddings — structureless synthetic vectors put a natural ceiling
    on 2-of-4-cell probing (measured: 0.7 at sf0.001, 0.3 at sf0.01 —
    deterministic per dataset); the floor pins against regressions in
    the trainer or the probe selection."""
    import duckdb

    from fupi_spark import pipeline_queries  # noqa: F401 (registers entries)
    from fupi_spark import queries as Q

    row = Q.QUERIES["ann_ivf_kmeans"](spark, sf_dir).collect()[0]
    got = set(row.topk_ids.split(","))

    con = duckdb.connect()
    rows = con.execute(
        f"SELECT vec_id, embedding FROM '{sf_dir}/embeddings.parquet'"
    ).fetchall()
    ids = np.array([str(r[0]) for r in rows])
    m = np.array([r[1] for r in rows], dtype=np.float64)
    d2 = ((m - np.array(Q.QUERY_VEC)) ** 2).sum(axis=1)
    true10 = set(ids[np.lexsort((ids, d2))[:10]])
    recall = len(true10 & got) / 10
    assert row.assign_mismatch == 0 and row.centroid_mismatch == 0
    assert recall >= 0.3, f"ivf-kmeans recall {recall}"
