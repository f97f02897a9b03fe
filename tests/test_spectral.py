"""Spectral feature tier (functions/multimodal.spectral_features): the FFT
output matches the closed-form tone placement, hostile payloads are
contained, and the ragged-batch fallback agrees with the vectorized path."""

from __future__ import annotations

import io
import struct
import wave

from custom_python_etl_data_connector_rohitharumugams_spark.functions import (
    multimodal as M,
)


def _wav_bytes(samples: list[int], nch: int = 1, width: int = 2) -> bytes:
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(nch)
        w.setsampwidth(width)
        w.setframerate(M.WAV_SAMPLE_RATE)
        w.writeframes(struct.pack(f"<{len(samples)}h", *samples))
    return buf.getvalue()


def test_two_tone_bins_recovered_exactly(spark):
    ids = [(i,) for i in (0, 5, 23, 24, 47, 96)]
    df = M.synth_wav_tones(spark.createDataFrame(ids, "doc_id long"))
    out = {r.doc_id: r for r in M.spectral_features(df).collect()}
    assert set(out) == {i for (i,) in ids}
    for (i,) in ids:
        k1, k2 = M._tone_bins(i)
        r = out[i]
        assert (r.dominant_bin, r.second_bin) == (k1, k2)
        assert (r.dominant_hz, r.second_hz) == (k1 * 125, k2 * 125)
        assert (r.n_frames, r.n_bins) == (M.TONE_N_SAMPLES, M.TONE_N_SAMPLES // 2 + 1)


def test_hostile_payloads_contained(spark):
    good = M.synth_wav_tones(spark.createDataFrame([(3,)], "doc_id long"))
    payload = bytes(good.collect()[0].data)
    hostile = [
        (3, payload),
        (100, payload[:16]),                     # truncated header
        (101, b"RIFFgarbage"),                   # bad RIFF body
        (102, None),                             # media-less
        (103, _wav_bytes([1, 2, 3], nch=2)),     # stereo: out of contract
        (104, _wav_bytes([5, -5])),              # too short for a spectrum
    ]
    df = spark.createDataFrame(hostile, "doc_id long, data binary")
    out = M.spectral_features(df).collect()
    assert [r.doc_id for r in out] == [3]


def test_ragged_batch_falls_back_per_clip(spark):
    """Different clip lengths in one batch exercise the per-clip rfft path;
    bins must still land where each clip's own length dictates."""
    import math

    def tone(n: int, k: int) -> list[int]:
        return [int(round(6000 * math.sin(2 * math.pi * k * i / n))) for i in range(n)]

    rows = [(1, _wav_bytes(tone(64, 9))), (2, _wav_bytes(tone(32, 5)))]
    df = spark.createDataFrame(rows, "doc_id long, data binary").coalesce(1)
    out = {r.doc_id: r for r in M.spectral_features(df).collect()}
    assert out[1].dominant_bin == 9 and out[1].n_frames == 64
    assert out[2].dominant_bin == 5 and out[2].n_frames == 32
    assert out[2].dominant_hz == 5 * M.WAV_SAMPLE_RATE // 32
