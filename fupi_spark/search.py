"""fupi query-path parity over the engine's own tables (SURVEY.md §2.2,
Q1-Q11): the reference's two-stage search — ANN top-k on sentence-level,
SQL assembly against text-level — as one DataFrame program.

Reference: /root/reference/searcher.py:179-346 (driver) and
fupi/utils.py:140-263 (dense + colbert searchers). Notable replicated
quirk: the reference GROUPs BY the distance column too
(fupi/utils.py:184-196), so two sentences of one text merge only when
their distances tie exactly — replicated as implemented, not as
presumably intended (SURVEY.md §7 hard part b).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .ingest import EMB_DIM, _embed_tokens, _load_model
from .meta import Table


def embed_query(text: str, dim: int = EMB_DIM, colbert: bool = False) -> list[float]:
    """Q1+Q2: driver-side query embedding (single row — the reference
    tokenizes + runs ONNX once per query, searcher.py:244-263; the
    colbert branch mean-pools per-token vectors, fupi/utils.py:210)."""
    table = _load_model(dim)
    prefix = "cb:" if colbert else ""
    return _embed_tokens([prefix + text] if not colbert else [prefix + text], table)[0]


def _l2_to_query(col: str, qvec: list[float]):
    qlit = F.array(*[F.lit(float(q)) for q in qvec])
    return F.aggregate(
        F.zip_with(F.col(col).cast("array<double>"), qlit, lambda x, q: (x - q) * (x - q)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def search(
    t_text: Table,
    t_sent: Table,
    query_text: str,
    k: int = 10,
    vector_column: str = "dense_embedding",
    dim: int = EMB_DIM,
) -> DataFrame:
    """Dense / ColBERT-centroid search (fupi/utils.py:140-200 and
    :203-263 — both share this shape, differing only in the vector
    column and query reduction)."""
    qvec = embed_query(query_text, dim, colbert=vector_column == "colbert_embedding")

    # Q3+Q4: brute-force top-k with projection pushdown (only 3 columns
    # + the vector leave the scan; TakeOrderedAndProject, no full sort)
    hits = (
        t_sent.scan()
        .select(
            "text_id",
            "sentence_id",
            "sentence",
            _l2_to_query(vector_column, qvec).alias("distance"),
        )
        .orderBy(F.col("distance").asc(), F.col("sentence_id").asc())
        .limit(k)
    )

    # Q5: k rows vs the whole text table → broadcast the hits
    joined = (
        F.broadcast(hits)
        .join(t_text.scan().select("text_id", "date", "title"), "text_id", "inner")
        .filter(F.length("sentence") > 3)  # Q6
    )

    # Q7+Q8: ordered string aggregation, order moved inside the group;
    # grouping includes `distance` — the reference quirk
    grouped = joined.groupBy("distance", "text_id", "date", "title").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("sentence_id", "sentence"))),
                lambda x: x["sentence_id"].cast("string"),
            ),
            ", ",
        ).alias("sentence_ids"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("sentence_id", "sentence"))),
                lambda x: x["sentence"],
            ),
            " -- ",
        ).alias("sentences"),
    )

    # Q9 + Q11: final ranking and fixed column order
    return grouped.select(
        "distance", "text_id", "date", "title", "sentence_ids", "sentences"
    ).orderBy(F.col("distance").asc(), F.col("text_id").asc()).limit(k)


def search_oracle_pandas(
    sent_pdf, text_pdf, qvec: list[float], k: int = 10, vector_column: str = "dense_embedding"
):
    """Slow pandas twin of search() for tests."""
    import pandas as pd

    q = np.array(qvec, dtype=np.float64)

    def dist(e):
        v = np.array(e, dtype=np.float64)
        d = 0.0
        for i in range(len(q)):  # left-assoc like the engine
            d += (v[i] - q[i]) * (v[i] - q[i])
        return d

    s = sent_pdf.copy()
    s["distance"] = s[vector_column].map(dist)
    s = s.sort_values(["distance", "sentence_id"], kind="mergesort").head(k)
    s = s[s["sentence"].str.len() > 3]
    m = s.merge(text_pdf[["text_id", "date", "title"]], on="text_id")
    rows = []
    for (d, tid, date, title), g in m.groupby(["distance", "text_id", "date", "title"], sort=False):
        g = g.sort_values("sentence_id")
        rows.append(
            {
                "distance": d,
                "text_id": tid,
                "date": date,
                "title": title,
                "sentence_ids": ", ".join(str(x) for x in g["sentence_id"]),
                "sentences": " -- ".join(g["sentence"]),
            }
        )
    out = pd.DataFrame(rows).sort_values(["distance", "text_id"], kind="mergesort").head(k)
    return out.reset_index(drop=True)


# ---------------------------------------------------------------------------
# Q12: batch translation map (searcher.py:42-80 — M2M100/CTranslate2
# generate over title/sentence batches, bg→en). The model library is not
# in this container, so the kernel is a deterministic stub; the Spark
# shape (mapInPandas, per-worker model handle, appended columns) is the
# real pattern a production model drops into.
# ---------------------------------------------------------------------------

_TRANSLATION_TABLE = {
    "the": "le", "quick": "rapide", "brown": "brun", "fox": "renard",
    "jumps": "saute", "over": "sur", "lazy": "paresseux", "dog": "chien",
    "data": "données", "spark": "étincelle", "table": "tableau", "row": "rang",
}


def translate_results(results: DataFrame, cols: tuple[str, str] = ("title", "sentences")) -> DataFrame:
    """Append `<col>_translated` columns via an Arrow-batched
    mapInPandas 'model' (token-map stub standing in for CTranslate2
    generate; reference loads the model lazily once per process,
    searcher.py:122-144)."""
    import pandas as pd
    from pyspark.sql import types as T

    out_schema = T.StructType(
        results.schema.fields
        + [T.StructField(f"{c}_translated", T.StringType(), True) for c in cols]
    )

    def run(batches):
        model = dict(_TRANSLATION_TABLE)  # per-worker "model" load
        for pdf in batches:
            for c in cols:
                pdf[f"{c}_translated"] = pdf[c].map(
                    lambda s: " ".join(model.get(t, t) for t in str(s).split(" "))
                )
            yield pdf

    return results.mapInPandas(run, schema=out_schema)


def results_to_records(results: DataFrame) -> list[dict]:
    """Q13: dict-records sink at the API edge (searcher.py:78-80)."""
    return results.toPandas().to_dict("records")
