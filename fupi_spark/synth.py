"""Deterministic distributed synthesis of the north-rule clip table.

Generates the FIXTURES.md §1 `clips` table as a Spark job: spark.range
partitions the id space, a mapInPandas batch function derives every
column from (seed, id) via splitmix64 — no wall clock, no Python
``random`` — so any two runs (and any two parallelism levels) produce
byte-identical rows. This is the 10^12-row table "represented
semantically": the same code path scales by raising ``n`` and
``parts``.

Skew knobs (FIXTURES.md): hot clip_id prefixes (range-partition skew),
weighted sr_hz (44100-dominant), 80/10/5/5 codec skew.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from .audio import _splitmix64, encode_clip, encode_clips_batch
from .schema import CLIPS_SCHEMA

SR_CHOICES = np.array([8000, 16000, 22050, 44100, 48000])
SR_WEIGHTS_CUM = np.cumsum(np.array([10, 15, 10, 50, 15]))  # /100, 44100-heavy
CODECS = np.array(["pcm_s16le", "flac", "opus", "aac"])
CODEC_WEIGHTS_CUM = np.cumsum(np.array([80, 10, 5, 5]))  # /100

VOCAB = [
    "alpha", "bravo", "charlie", "delta", "echo", "foxtrot", "golf", "hotel",
    "india", "juliett", "kilo", "lima", "mike", "november", "oscar", "papa",
    "quebec", "romeo", "sierra", "tango", "uniform", "victor", "whiskey",
    "xray", "yankee", "zulu", "zero", "one", "two", "three", "four", "five",
    "six", "seven", "eight", "nine", "stop", "go", "left", "right",
]


def _weighted_pick(u: np.ndarray, cum: np.ndarray, choices: np.ndarray) -> np.ndarray:
    idx = np.searchsorted(cum, (u % np.uint64(100)).astype(np.int64), side="right")
    return choices[np.clip(idx, 0, len(choices) - 1)]


def clip_row_params(
    ids: np.ndarray,
    seed: int,
    hot_pct: int,
    dur_range_ms: tuple[int, int],
) -> pd.DataFrame:
    """Vectorized derivation of all non-payload columns from row ids."""
    base = _splitmix64(ids.astype(np.uint64) + np.uint64(seed) * np.uint64(0x5851F42D))
    s1 = _splitmix64(base + np.uint64(1))
    s2 = _splitmix64(base + np.uint64(2))
    s3 = _splitmix64(base + np.uint64(3))
    s4 = _splitmix64(base + np.uint64(4))

    hot = (base % np.uint64(100)).astype(np.int64) < hot_pct
    prefix = np.where(hot, "hot", pd.Series(s1 % np.uint64(16)).map("{:x}".format))
    clip_id = pd.Series(prefix).str.cat(
        pd.Series(ids).map("{:012d}".format), sep="_"
    ).radd("clip_")

    sr = _weighted_pick(s2, SR_WEIGHTS_CUM, SR_CHOICES).astype(np.int32)
    lo, hi = dur_range_ms
    # log-uniform duration
    u = (s3 % np.uint64(10**6)).astype(np.float64) / 1e6
    dur = np.exp(np.log(lo) + u * (np.log(hi) - np.log(lo))).astype(np.int32)
    codec = _weighted_pick(s4, CODEC_WEIGHTS_CUM, CODECS)

    # transcripts: 3-40 seeded tokens
    n_tok = 3 + (s1 % np.uint64(38)).astype(np.int64)
    tok_seed = _splitmix64(base + np.uint64(7))
    transcripts = []
    for ts, k in zip(tok_seed, n_tok):
        toks = _splitmix64(np.uint64(ts) + np.arange(k, dtype=np.uint64))
        transcripts.append(" ".join(VOCAB[int(t % np.uint64(len(VOCAB)))] for t in toks))

    return pd.DataFrame(
        {
            "clip_id": clip_id.astype(str),
            "sr_hz": sr,
            "dur_ms": dur,
            "codec": codec.astype(str),
            "transcript": transcripts,
        }
    )


def synth_clips(
    spark: SparkSession,
    n: int,
    seed: int = 42,
    hot_pct: int = 20,
    dur_range_ms: tuple[int, int] = (200, 2000),
    parts: int | None = None,
) -> DataFrame:
    """Distributed deterministic clip generator → DataFrame(CLIPS_SCHEMA)."""
    parts = parts or max(8, n // 5000)
    base = spark.range(0, n, 1, parts)

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids = pdf["id"].to_numpy()
            params = clip_row_params(ids, seed, hot_pct, dur_range_ms)
            # payload synth: waveform math batched across the whole
            # Arrow batch (bit-identical to per-clip encode_clip)
            params["bytes"] = encode_clips_batch(
                params["clip_id"].tolist(),
                params["sr_hz"].to_numpy(),
                params["dur_ms"].to_numpy(),
                params["codec"].tolist(),
            )
            yield params[[f.name for f in CLIPS_SCHEMA.fields]]

    return base.mapInPandas(gen, schema=CLIPS_SCHEMA)


def synth_clips_pandas(
    n: int,
    seed: int = 42,
    hot_pct: int = 20,
    dur_range_ms: tuple[int, int] = (200, 2000),
) -> pd.DataFrame:
    """Driver-side oracle twin of synth_clips (used by refimpl tests)."""
    params = clip_row_params(np.arange(n, dtype=np.uint64), seed, hot_pct, dur_range_ms)
    params["bytes"] = [
        encode_clip(c, int(s), int(d), k)
        for c, s, d, k in zip(
            params["clip_id"], params["sr_hz"], params["dur_ms"], params["codec"]
        )
    ]  # deliberately per-clip: the oracle twin must not share the batched path
    return params[[f.name for f in CLIPS_SCHEMA.fields]]


def with_clip_prefix(clips: DataFrame, prefix: str) -> DataFrame:
    """Prefix every clip_id AND re-derive the payload from the new id,
    keeping the id↔waveform contract intact (verify_clips re-
    synthesizes by clip_id, so renaming without re-encoding reads as
    corruption — by design)."""

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            pdf = pdf.copy()
            pdf["clip_id"] = prefix + pdf["clip_id"]
            pdf["bytes"] = encode_clips_batch(
                pdf["clip_id"].tolist(),
                pdf["sr_hz"].to_numpy(),
                pdf["dur_ms"].to_numpy(),
                pdf["codec"].tolist(),
            )
            yield pdf[[f.name for f in CLIPS_SCHEMA.fields]]

    return clips.mapInPandas(run, schema=CLIPS_SCHEMA)
