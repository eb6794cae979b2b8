"""fupi ingestion-path parity tests (SURVEY.md §2.1): filters,
segmentation vs pure-Python, centroid vs numpy, end-to-end snapshot arc."""

from __future__ import annotations

import json
import re

import numpy as np
import pytest

from fupi_spark import ingest


@pytest.fixture(scope="module")
def raw_docs(tmp_path_factory):
    p = tmp_path_factory.mktemp("raw") / "docs.jsonl.gz"
    ingest.write_raw_docs_jsonl(str(p), 120)
    return str(p)


def test_scan_filters_and_ids(spark, raw_docs):
    df = ingest.scan_raw_docs(spark, raw_docs).cache()
    rows = df.collect()
    # nulls and '...' titles dropped
    assert all(r.date and r.title and r.text for r in rows)
    assert all(not r.title.endswith("...") for r in rows)
    assert all("\n" not in r.text for r in rows)  # I4 scrub
    ids = sorted(r.text_id for r in rows)
    assert ids == list(range(1, len(rows) + 1))  # dense sequence (I2)
    assert 60 < len(rows) < 120  # ~10%+10%+5% filtered


def test_segmentation_matches_pure_python(spark, raw_docs):
    texts = ingest.scan_raw_docs(spark, raw_docs)
    seg = ingest.segment(texts).collect()
    src = {r.text_id: r.text for r in texts.collect()}
    expected = []
    for tid in sorted(src):
        for s in [x for x in re.split(r"(?<=[.!?])\s+", src[tid]) if x.strip()]:
            expected.append((tid, s))
    got = [(r.text_id, r.sentence) for r in sorted(seg, key=lambda r: r.sentence_id)]
    assert got == expected
    # sentence_id is a dense global sequence in (text_id, pos) order
    assert sorted(r.sentence_id for r in seg) == list(range(1, len(seg) + 1))


def test_embedding_deterministic_and_fixed_width(spark, raw_docs):
    from pyspark.sql import functions as F

    texts = ingest.scan_raw_docs(spark, raw_docs).limit(20)
    seg = ingest.segment(texts)
    emb = ingest.embed_udf(16)
    a = seg.withColumn("e", emb(F.col("sentence"))).select("sentence_id", "e").collect()
    b = seg.repartition(7).withColumn("e", emb(F.col("sentence"))).select("sentence_id", "e").collect()
    da = {r.sentence_id: r.e for r in a}
    db = {r.sentence_id: r.e for r in b}
    assert da == db  # deterministic across partitioning
    assert all(len(v) == 16 for v in da.values())  # fixed width invariant


def test_centroid_matches_numpy(spark, raw_docs):
    from pyspark.sql import functions as F

    texts = ingest.scan_raw_docs(spark, raw_docs).limit(15)
    seg = ingest.segment(texts)
    emb = ingest.embed_udf(8)
    sent = seg.withColumn("dense_embedding", emb(F.col("sentence")))
    tl = ingest.text_level_from_sentences(sent, 8).collect()
    sent_rows = sent.select("text_id", "dense_embedding").collect()
    by_text = {}
    for r in sent_rows:
        by_text.setdefault(r.text_id, []).append(r.dense_embedding)
    for r in tl:
        expect = np.mean(np.array(by_text[r.text_id], dtype=np.float64), axis=0)
        got = np.array(r.dense_embedding, dtype=np.float64)
        assert np.allclose(got, expect, atol=1e-6), r.text_id


def test_ingest_e2e_snapshot_arc(spark, raw_docs, tmp_path):
    wh = str(tmp_path / "wh")
    t_text, t_sent = ingest.ingest_corpus(spark, raw_docs, wh, num_samples=40)
    # the reference arc create→add→compact (fupi/embedders.py:119-128)
    ops = [s["operation"] for s in t_sent.lineage_chain()]
    assert ops[:2] == ["create", "append"]
    n_sent = t_sent.scan().count()
    n_text = t_text.scan().count()
    assert n_text == 40
    assert n_sent >= n_text  # 1→N explode
    cols = set(t_sent.scan().columns)
    assert cols == {
        "text_id", "sentence_id", "sentence", "dense_embedding",
        "colbert_embedding", "lsh_bucket",
    }
    # FK integrity
    orphan = (
        t_sent.scan()
        .join(t_text.scan().select("text_id"), "text_id", "left_anti")
        .count()
    )
    assert orphan == 0


def test_real_kernel_seams_skipped_unless_available(spark, monkeypatch):
    """The guarded kernel seams activate only by env opt-in; with the
    libraries absent they fall back to the stubs without error."""
    import pytest

    from fupi_spark.ingest import _load_embedder, _load_segmenter

    monkeypatch.setenv("FUPI_ONNX_MODEL", "/nonexistent/model.onnx")
    kind, _ = _load_embedder(16)
    try:
        import onnxruntime  # noqa: F401

        pytest.skip("onnxruntime present: seam exercised by real-model runs")
    except ImportError:
        assert kind == "stub"  # library absent -> graceful stub fallback

    monkeypatch.setenv("FUPI_USE_PYSBD", "1")
    seg = _load_segmenter()
    assert seg("One. Two.") == ["One.", "Two."] or len(seg("One. Two.")) == 2


def test_onnx_path_runs_one_call_per_batch():
    """The real-model branch must execute exactly ONE session.run per
    Arrow batch (tokenize-all + pad-to-longest + masked mean-pool), not
    one per row — reference parity with its padding='longest' batches."""
    import numpy as np
    import pandas as pd

    from fupi_spark.ingest import _embed_batch

    calls = {"n": 0}
    DIM = 8

    class _Inp:
        def __init__(self, name):
            self.name = name

    class MockSession:
        def get_inputs(self):
            return [_Inp("input_ids"), _Inp("attention_mask")]

        def run(self, outputs, feeds):
            calls["n"] += 1
            # the feed must carry every tokenizer output the model
            # declares (reference passes the full tokenizer dict)
            assert set(feeds) == {"input_ids", "attention_mask"}
            ids, mask = feeds["input_ids"], feeds["attention_mask"]
            assert ids.ndim == 2 and ids.shape[0] == 5  # whole batch, padded
            assert mask.shape == ids.shape
            # mask marks exactly the real tokens: row lengths 3,1,1,2,4
            # (empty text tokenizes to the single fallback token [0])
            assert mask.sum(axis=1).tolist() == [3, 1, 1, 2, 4]
            assert set(np.unique(mask)) <= {0, 1}
            # deterministic fake hidden state: (n, seq, hidden)
            rng = np.random.default_rng(1)
            return [rng.standard_normal((ids.shape[0], ids.shape[1], DIM))]

    batch = pd.Series(["a b c", "d", "", "e f", "g g g g"])
    out = _embed_batch("onnx", MockSession(), batch, DIM)
    assert calls["n"] == 1  # ONE run for the whole batch
    assert len(out) == 5 and all(len(v) == DIM for v in out)
    # a second batch -> a second call (per-batch, not cached-forever)
    _embed_batch("onnx", MockSession(), batch, DIM)
    assert calls["n"] == 2


def test_onnx_feed_filtered_to_declared_inputs():
    """A model declaring only input_ids must not receive the mask (the
    feed filters to the session's declared input names)."""
    import numpy as np
    import pandas as pd

    from fupi_spark.ingest import _embed_batch

    DIM = 4

    class _Inp:
        def __init__(self, name):
            self.name = name

    class IdsOnlySession:
        def get_inputs(self):
            return [_Inp("input_ids")]

        def run(self, outputs, feeds):
            assert set(feeds) == {"input_ids"}
            ids = feeds["input_ids"]
            return [np.zeros((ids.shape[0], ids.shape[1], DIM))]

    out = _embed_batch("onnx", IdsOnlySession(), pd.Series(["a b", "c"]), DIM)
    assert len(out) == 2


def test_onnx_masked_pool_ignores_padding():
    """Rows of different lengths in one padded batch must pool only
    their real tokens: a row's embedding equals the one it gets when
    embedded alone (no padding contamination)."""
    import numpy as np
    import pandas as pd

    from fupi_spark.ingest import _embed_batch

    DIM = 4

    class EchoSession:
        """hidden[i, j] = f(input_ids[i, j]) so pooling is checkable."""

        def run(self, outputs, feeds):
            ids = feeds["input_ids"]
            h = np.stack(
                [np.stack([np.full(DIM, float(v % 97)) for v in row]) for row in ids]
            )
            return [h]

    long_short = pd.Series(["alpha beta gamma delta", "alpha"])
    both = _embed_batch("onnx", EchoSession(), long_short, DIM)
    alone = _embed_batch("onnx", EchoSession(), pd.Series(["alpha"]), DIM)
    assert np.allclose(both[1], alone[0])
