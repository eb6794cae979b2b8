"""Product quantization (PQ) for vector search at compression scale.

The reference delegates vector indexing to Lance's IVF_PQ
(/root/reference/fupi/utils.py:149-161); ann.py + kmeans.py rebuild the
IVF half from scratch — this module is the PQ half: split each vector
into S subspaces, train a K-centroid codebook per subspace with the
SAME deterministic Lloyd trainer (kmeans.py), encode every vector as S
small codes, and answer queries with an ADC (asymmetric distance
computation) scan over the codes plus an exact rerank of the few
survivors.

Why this is the 10^12-vector plan: a 64-dim float vector is 256 bytes;
its PQ code at S=8, K=16 is S·log2(K) = 32 bits — a 64× compression.
The ADC scan touches ONLY the code columns (a codegen expression over
S tiny lookup arrays — no vector arithmetic, no Python), and the exact
rerank reads full vectors for just the top-C ADC candidates. Combined
with the IVF cell pruning (pipeline_queries.ann_ivf_*) this is the
standard IVF-PQ layout end to end.

Determinism (cross-engine contract): codebooks come from the seeded
lowest-id-init Lloyd trainer with per-iteration rounding; codes
tie-break to the lowest code id; the query LUT is computed as a
left-associative fold in position order (bitwise-equal to the oracle's
unrolled SQL); ADC sums the S lookups in fixed subspace order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PQ_SUBS = 8
PQ_K = 16


def _sub_col(vec_col: str, s: int, sub_len: int):
    return F.slice(F.col(vec_col), s * sub_len + 1, sub_len)


def pq_train(
    emb: DataFrame,
    vec_col: str,
    id_col: str,
    dim: int,
    subs: int = PQ_SUBS,
    k: int = PQ_K,
    iters: int = 2,
) -> list[list[list[float]]]:
    """One codebook (k centroids of dim/subs floats) per subspace,
    trained with the SAME deterministic Lloyd recipe as kmeans_fit
    (lowest-id init, first-min tie-break, 6-decimal rounding) — but
    all ``subs`` subspaces share each round's jobs (r6): one init
    collect (the k lowest-id rows, sliced per subspace on the driver)
    and ONE assignment+means aggregation per iteration, instead of
    subs×(1+iters) sequential jobs. The per-(cell, pos) input sets are
    identical to the sequential trainer, so the rounded means agree
    (fused-vs-sequential equality is pytest-pinned); at 10^12 rows each
    iteration is still one scan + one (subs·k·sub_len)-row shuffle.

    At 10^12 rows the fit runs on a sample; the encode pass below is
    the only full-data pass."""
    from .queries import _l2_multi_col

    sub_len = dim // subs
    round_digits = 6
    init_rows = emb.select(id_col, vec_col).orderBy(id_col).limit(k).collect()
    if len(init_rows) < k:
        raise ValueError(f"k={k} but only {len(init_rows)} rows")
    books = [
        [
            [
                round(float(v), round_digits)
                for v in r[vec_col][s * sub_len : (s + 1) * sub_len]
            ]
            for r in init_rows
        ]
        for s in range(subs)
    ]
    for _ in range(iters):
        df = emb.select(
            id_col,
            *[_sub_col(vec_col, s, sub_len).alias(f"_sub{s}") for s in range(subs)],
        )
        for s in range(subs):
            dists = _l2_multi_col(f"_sub{s}", books[s])
            df = df.withColumn(
                f"_cell{s}",
                (F.array_position(dists, F.array_min(dists)) - 1).cast("int"),
            )
        # one update aggregation for every subspace: explode the
        # re-flattened vector, key each position by ITS subspace's cell
        # (pos // sub_len picks the subspace), average per (cell, pos)
        cells = F.array(*[F.col(f"_cell{s}") for s in range(subs)])
        vec = F.flatten(F.array(*[F.col(f"_sub{s}") for s in range(subs)]))
        means = (
            df.select(cells.alias("_cells"), F.posexplode(vec).alias("pos", "v"))
            .withColumn(
                "cell",
                F.element_at(
                    F.col("_cells"), (F.col("pos") / sub_len).cast("int") + 1
                ),
            )
            .groupBy("cell", "pos")
            .agg(F.avg(F.col("v").cast("double")).alias("m"))
            .collect()
        )
        new = [[list(c) for c in b] for b in books]
        for r in means:
            s, p = divmod(int(r["pos"]), sub_len)
            new[s][int(r["cell"])][p] = round(r["m"], round_digits)
        books = new
    return books


def pq_encode(
    emb: DataFrame,
    vec_col: str,
    id_col: str,
    codebooks: list[list[list[float]]],
    dim: int,
) -> DataFrame:
    """(id, c0..c{S-1}): per-subspace argmin code, first-min tie-break
    — one codegen pass, no Python (the zip_with+aggregate fold per
    centroid keeps generated code size linear in K·S)."""
    from .queries import _l2_multi_col

    subs = len(codebooks)
    sub_len = dim // subs
    out = emb.select(
        id_col,
        *[
            _sub_col(vec_col, s, sub_len).alias(f"_sub{s}")
            for s in range(subs)
        ],
    )
    for s, book in enumerate(codebooks):
        dists = _l2_multi_col(f"_sub{s}", book)
        out = out.withColumn(
            f"c{s}",
            (F.array_position(dists, F.array_min(dists)) - 1).cast("int"),
        )
    return out.select(id_col, *[f"c{s}" for s in range(subs)])


def pq_lut(
    query: list[float], codebooks: list[list[list[float]]]
) -> list[list[float]]:
    """lut[s][k] = L2(query_sub_s, codebook[s][k]) as a left fold in
    position order — bitwise-equal to the unrolled left-associative
    SQL sum (0.0 + t0 == t0 exactly; squares are finite)."""
    subs = len(codebooks)
    sub_len = len(query) // subs
    lut: list[list[float]] = []
    for s, book in enumerate(codebooks):
        qs = query[s * sub_len : (s + 1) * sub_len]
        row = []
        for cen in book:
            acc = 0.0
            for qv, cv in zip(qs, cen):
                acc += (qv - cv) * (qv - cv)
            row.append(acc)
        lut.append(row)
    return lut


def adc_distance(lut: list[list[float]]):
    """ADC column over a codes frame (c0..c{S-1}): per-subspace array
    lookup + fixed-order sum — pure codegen, the expression a
    10^12-row code scan evaluates."""
    terms = [
        F.element_at(
            F.array(*[F.lit(float(v)) for v in lut[s]]), F.col(f"c{s}") + 1
        )
        for s in range(len(lut))
    ]
    acc = terms[0]
    for t in terms[1:]:
        acc = acc + t
    return acc


def pq_topk(
    emb: DataFrame,
    codes: DataFrame,
    vec_col: str,
    id_col: str,
    lut: list[list[float]],
    query: list[float],
    rerank: int = 50,
    k: int = 10,
) -> DataFrame:
    """ADC top-``rerank`` candidates from the codes alone, then exact
    rerank of just those vectors: (id, adc, exact) for the final
    top-``k`` by exact distance (ties by id)."""
    from .queries import _l2_col

    cand = (
        codes.withColumn("_adc", adc_distance(lut))
        .orderBy(F.col("_adc").asc(), F.col(id_col).asc())
        .limit(rerank)
        .select(id_col, "_adc")
    )
    return (
        cand.join(emb.select(id_col, vec_col), id_col)
        .withColumn("_exact", _l2_col(vec_col, query))
        .orderBy(F.col("_exact").asc(), F.col(id_col).asc())
        .limit(k)
        .select(id_col, "_adc", "_exact")
    )


def residual_col(vec_col: str, cell_col: str, centroids: list[list[float]]):
    """vec − centroid[cell] as a codegen expression: the centroid
    matrix is a literal array-of-arrays indexed by the row's cell, the
    subtraction a zip_with — residual ENCODING is what IVF_PQ actually
    quantizes (residuals are much smaller than raw vectors, so the same
    codebook budget buys finer resolution near every cell center)."""
    cents = F.array(
        *[F.array(*[F.lit(float(v)) for v in c]) for c in centroids]
    )
    picked = F.element_at(cents, F.col(cell_col) + 1)
    return F.zip_with(
        F.col(vec_col).cast("array<double>"), picked, lambda x, c: x - c
    )


def query_residual(query: list[float], centroid: list[float]) -> list[float]:
    return [float(q) - float(c) for q, c in zip(query, centroid)]
