"""Synthesis + audio codec invariants (FIXTURES.md §4.1)."""

from __future__ import annotations

import numpy as np

from fupi_spark import audio
from fupi_spark.synth import synth_clips, synth_clips_pandas


def test_wav_roundtrip():
    pcm = audio.synth_pcm("clip_x_000000000001", 8000, 100)
    buf = audio.wav_encode(pcm, 8000)
    dec, sr = audio.wav_decode(buf)
    assert sr == 8000
    assert np.array_equal(dec, pcm)


def test_fake_roundtrip():
    pcm = audio.synth_pcm("clip_y_000000000002", 16000, 50)
    assert np.array_equal(audio.fake_decode(audio.fake_encode(pcm, "opus")), pcm)


def test_synth_deterministic_across_parallelism(spark):
    a = synth_clips(spark, 200, dur_range_ms=(50, 120), parts=1).collect()
    b = synth_clips(spark, 200, dur_range_ms=(50, 120), parts=7).collect()
    pa = synth_clips_pandas(200, dur_range_ms=(50, 120))
    sa = sorted((r.clip_id, bytes(r.bytes), r.sr_hz, r.dur_ms, r.codec, r.transcript) for r in a)
    sb = sorted((r.clip_id, bytes(r.bytes), r.sr_hz, r.dur_ms, r.codec, r.transcript) for r in b)
    sp = sorted(
        (r.clip_id, bytes(r.bytes), r.sr_hz, r.dur_ms, r.codec, r.transcript)
        for r in pa.itertuples()
    )
    assert sa == sb == sp
    assert len({t[0] for t in sa}) == 200  # unique clip ids


def test_verify_clips_snr_gate(spark):
    clips = synth_clips(spark, 60, dur_range_ms=(50, 150), parts=3)
    res = audio.verify_clips(clips).collect()
    assert len(res) == 60
    assert all(r.pcm_ok for r in res)
    assert all(r.snr_db >= 30.0 for r in res)


def test_verify_catches_corruption(spark):
    """A corrupted payload must fail the SNR gate, not pass silently."""
    import pandas as pd
    from pyspark.sql import functions as F

    pdf = synth_clips_pandas(5, dur_range_ms=(50, 80))
    row = pdf.iloc[0]
    buf = bytearray(row["bytes"])
    buf[44:144] = bytes(100)  # zero out a chunk of samples
    pdf.at[0, "bytes"] = bytes(buf)
    clips = spark.createDataFrame(pdf)
    res = {r.clip_id: r for r in audio.verify_clips(clips).collect()}
    assert not res[row["clip_id"]].pcm_ok
    assert sum(1 for r in res.values() if r.pcm_ok) == 4


def test_extract_features(spark):
    clips = synth_clips(spark, 30, dur_range_ms=(50, 100), parts=2)
    feats = {r.clip_id: r for r in audio.extract_features(clips).collect()}
    rows = clips.collect()
    assert len(feats) == 30
    for r in rows:
        f = feats[r.clip_id]
        assert f.n_samples == int(r.sr_hz * r.dur_ms / 1000) or f.n_samples >= 1
        assert f.rms > 0
        assert f.n_tokens == len(r.transcript.split(" "))


def test_skew_knobs():
    pdf = synth_clips_pandas(2000, dur_range_ms=(50, 60), hot_pct=30)
    hot = pdf["clip_id"].str.startswith("clip_hot_").mean()
    assert 0.25 < hot < 0.35
    codec_share = (pdf["codec"] == "pcm_s16le").mean()
    assert 0.75 < codec_share < 0.85
    assert (pdf["sr_hz"] == 44100).mean() > 0.4


def test_resample_kernel_snr_against_analytic():
    """8k→16k polyphase resample of a pure 440 Hz tone must match the
    analytically synthesized 16 kHz tone at SNR ≥ 30 dB (edges trimmed
    past the filter transient)."""
    import numpy as np

    from fupi_spark.audio import _resample_poly_np

    sr0, sr1, f0 = 8000, 16000, 440.0
    n0 = sr0  # 1 second
    x = np.sin(2 * np.pi * f0 * np.arange(n0) / sr0)
    y = _resample_poly_np(x, sr1, sr0)
    ref = np.sin(2 * np.pi * f0 * np.arange(len(y)) / sr1)
    edge = 400
    err = y[edge:-edge] - ref[edge:-edge]
    snr = 10 * np.log10((ref[edge:-edge] ** 2).sum() / (err**2).sum())
    assert snr >= 30.0, snr
    assert len(y) == n0 * 2


def test_resample_rational_and_identity_lengths():
    import numpy as np

    from fupi_spark.audio import _resample_poly_np

    x = np.random.default_rng(0).standard_normal(1000)
    assert len(_resample_poly_np(x, 1, 1)) == 1000
    assert len(_resample_poly_np(x, 22050, 44100)) == 500
    assert len(_resample_poly_np(x, 48000, 44100)) == int(np.ceil(1000 * 48000 / 44100))


def test_resample_clips_operator(spark):
    """The Spark operator: every clip lands at the target rate with a
    decodable payload of the right length; downsampled audio of a
    band-limited tone keeps SNR vs analytic re-synthesis."""
    import numpy as np
    from pyspark.sql import functions as F

    from fupi_spark.audio import _decode_one, resample_clips
    from fupi_spark.synth import synth_clips

    clips = synth_clips(spark, 40, dur_range_ms=(50, 120), parts=2)
    out = resample_clips(clips, 16000)
    rows = out.collect()
    assert len(rows) == 40
    for r in rows:
        assert r.sr_hz == 16000
        pcm = _decode_one(bytes(r.bytes), r.codec)
        # length = ceil(n0 * 16000/sr0) where n0 = max(1, sr0*dur/1000)
        assert abs(len(pcm) - 16000 * r.dur_ms / 1000) <= 16000 / 8000 + 1
    # operator is schema-stable
    assert [f.name for f in out.schema.fields] == [
        "clip_id", "bytes", "sr_hz", "dur_ms", "codec", "transcript"
    ]


def test_chunk_clips_sample_exact_roundtrip(spark):
    """Concatenating a clip's chunks (in chunk order) must reproduce
    the original decoded PCM byte-for-byte — no padding, loss, or
    boundary drift (the 1->N explode is a pure partition of samples)."""
    import numpy as np

    from fupi_spark.audio import _decode_one, chunk_clips
    from fupi_spark.synth import synth_clips

    clips = synth_clips(spark, 40, dur_range_ms=(300, 700), parts=4)
    chunks = chunk_clips(clips, 200).toPandas()
    orig = clips.toPandas()
    assert len(chunks) > len(orig)  # genuinely 1->N
    for _, r in orig.iterrows():
        mine = chunks[
            chunks.clip_id.str.startswith(r.clip_id + "#")
        ].sort_values("clip_id")
        got = np.concatenate(
            [_decode_one(b, c) for b, c in zip(mine["bytes"], mine["codec"])]
        )
        ref = _decode_one(r["bytes"], r["codec"])
        assert np.array_equal(got, ref)


class TestVad:
    def test_plant_and_recover(self, spark):
        from fupi_spark.audio import plant_silence, vad_segments
        from fupi_spark.synth import synth_clips

        clips = synth_clips(spark, 40, dur_range_ms=(200, 400), parts=2)
        planted = plant_silence(clips, frame_ms=20)
        spec = {r.clip_id: r.sil_frames for r in
                planted.select("clip_id", "sil_frames").collect()}
        out = vad_segments(planted.drop("sil_frames"), frame_ms=20).collect()
        assert len(out) == 40
        for r in out:
            sil = spec[r.clip_id]
            if sil >= r.n_frames:
                assert r.first_voiced is None and r.n_voiced == 0
            else:
                assert r.first_voiced == sil, r
                assert r.n_voiced == r.n_frames - sil, r

    def test_corrupt_payload_counts_zero_frames(self, spark):
        from fupi_spark.audio import vad_segments
        from fupi_spark.schema import CLIPS_SCHEMA

        row = [("clip_bad", b"\x00\x01", 8000, 100, "pcm_s16le", "x")]
        df = spark.createDataFrame(row, CLIPS_SCHEMA)
        r = vad_segments(df).collect()[0]
        assert r.n_frames == 0 and r.first_voiced is None and r.n_voiced == 0


def test_tone_probe_roundtrip_local(spark):
    """plant_tone_drop → detect_missing_tone recovers every planted
    slot with the orthogonality margin, across codecs."""
    from fupi_spark.audio import detect_missing_tone, plant_tone_drop
    from fupi_spark.synth import synth_clips

    clips = synth_clips(spark, 40, dur_range_ms=(300, 500), parts=2)
    planted = plant_tone_drop(clips).cache()
    spec = {r.clip_id: r.dropped for r in planted.select("clip_id", "dropped").collect()}
    got = detect_missing_tone(planted.drop("dropped")).collect()
    assert len(got) == 40
    for r in got:
        assert r.missing_tone == spec[r.clip_id], r.clip_id
        assert r.margin_ok, r.clip_id
    planted.unpersist()


def test_probe_bins_disjoint_and_nyquist_safe():
    from fupi_spark.audio import probe_bins

    for cid in ("a", "b", "clip_000123", "zz"):
        b = probe_bins(cid)
        assert len(set(b.tolist())) == 4
        assert b.min() >= 64 and b.max() < 416
