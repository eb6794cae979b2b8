"""fupi query-path parity: engine search vs pandas oracle, both vector
columns, plus the rows-only maintenance queries smoke."""

from __future__ import annotations

import pandas as pd
import pytest

from fupi_spark import ingest
from fupi_spark.search import embed_query, search, search_oracle_pandas


@pytest.fixture(scope="module")
def corpus(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("corpus")
    jsonl = str(root / "docs.jsonl.gz")
    ingest.write_raw_docs_jsonl(jsonl, 100)
    return ingest.ingest_corpus(spark, jsonl, str(root / "wh"), num_samples=60)


@pytest.mark.parametrize("vcol", ["dense_embedding", "colbert_embedding"])
def test_search_matches_pandas_oracle(spark, corpus, vcol):
    t_text, t_sent = corpus
    qtext = "quick brown fox jumps"
    res = search(t_text, t_sent, qtext, k=10, vector_column=vcol).toPandas()

    sent_pdf = t_sent.scan().toPandas()
    text_pdf = t_text.scan().toPandas()
    qvec = embed_query(qtext, colbert=vcol == "colbert_embedding")
    exp = search_oracle_pandas(sent_pdf, text_pdf, qvec, k=10, vector_column=vcol)

    assert list(res["text_id"]) == list(exp["text_id"])
    assert list(res["sentence_ids"]) == list(exp["sentence_ids"])
    assert list(res["sentences"]) == list(exp["sentences"])
    pd.testing.assert_series_equal(
        res["distance"], exp["distance"], check_exact=True, check_names=False
    )


def test_search_projection_pushdown(spark, corpus):
    """Q4: only the needed columns reach the parquet scan."""
    t_text, t_sent = corpus
    from pyspark.sql import functions as F

    from fupi_spark.search import _l2_to_query

    qvec = embed_query("data table")
    hits = t_sent.scan().select(
        "text_id", "sentence_id", "sentence", _l2_to_query("dense_embedding", qvec).alias("d")
    )
    plan = hits._jdf.queryExecution().executedPlan().toString()
    assert "colbert_embedding" not in plan  # pruned


@pytest.mark.parametrize(
    "name",
    [
        "lakehouse_compact_roundtrip",
        "lakehouse_merge_upsert",
        "audio_verify_snr",
    ],
)
def test_maintenance_queries_deterministic(spark, name):
    from fupi_spark import maintenance_queries  # noqa: F401
    from fupi_spark.queries import QUERIES

    a = sorted(map(str, QUERIES[name](spark, "/root/testdata/sf0.001").collect()))
    b = sorted(map(str, QUERIES[name](spark, "/root/testdata/sf0.001").collect()))
    assert a == b
    assert len(a) >= 1


def test_translation_stage_and_records_sink(spark, corpus):
    """Q12+Q13: translation map appends columns; records sink shapes
    the API payload (searcher.py:42-80, :78-80)."""
    from fupi_spark.search import results_to_records, search, translate_results

    t_text, t_sent = corpus
    res = search(t_text, t_sent, "quick brown fox", k=5)
    tr = translate_results(res)
    rows = tr.collect()
    assert len(rows) == 5
    assert all(hasattr(r, "title_translated") and hasattr(r, "sentences_translated") for r in rows)
    sample = [r for r in rows if "quick" in r.sentences][:1]
    if sample:
        assert "rapide" in sample[0].sentences_translated
    recs = results_to_records(res)
    assert isinstance(recs, list) and isinstance(recs[0], dict)
    assert set(recs[0]) == {"distance", "text_id", "date", "title", "sentence_ids", "sentences"}


def test_search_lsh_probe_matches_bucket_restricted_oracle(spark, corpus):
    """Index-backed search: the LSH probe result must equal brute-force
    search restricted to the probed buckets (exact within candidates),
    and the probe must reach the scan as a pushed filter."""
    import numpy as np
    from pyspark.sql import functions as F

    from fupi_spark.ann import LSH_N_PLANES, hamming_probes, lsh_planes, query_bucket
    from fupi_spark.ingest import EMB_DIM

    t_text, t_sent = corpus
    qtext = "quick brown fox jumps"
    qvec = embed_query(qtext)
    planes = lsh_planes(LSH_N_PLANES, EMB_DIM)
    probes = hamming_probes(query_bucket(qvec, planes), 1, LSH_N_PLANES)

    res = search(t_text, t_sent, qtext, k=10, use_lsh=True, lsh_radius=1)
    plan = res._jdf.queryExecution().executedPlan().toString()
    assert "lsh_bucket" in plan  # the probe filter is in the plan

    # the contiguous bucket-group file layout makes the probe prune at
    # the manifest level
    _df, files_read, files_total = t_sent.scan_pruned_in("lsh_bucket", probes)
    assert files_read < files_total, (files_read, files_total)

    got = res.toPandas()

    sent_pdf = t_sent.scan().toPandas()
    cand = sent_pdf[sent_pdf["lsh_bucket"].isin(probes)]
    text_pdf = t_text.scan().toPandas()
    exp = search_oracle_pandas(cand, text_pdf, qvec, k=10)
    assert list(got["text_id"]) == list(exp["text_id"])
    assert list(got["sentence_ids"]) == list(exp["sentence_ids"])

    # candidate set is a strict subset of the table (sublinear probe)
    assert 0 < len(cand) < len(sent_pdf)

    # stored buckets agree with the driver-side bucketing arithmetic
    m = np.array([np.array(v, dtype=np.float64) for v in sent_pdf["dense_embedding"]])
    p = np.array(planes, dtype=np.float64)
    want_buckets = ((m @ p.T > 0).astype(np.int64) * (1 << np.arange(LSH_N_PLANES))).sum(axis=1)
    assert list(sent_pdf["lsh_bucket"]) == list(want_buckets)
