"""Audio stages (stages/audio.py): real PCM WAV codec round-trip,
known-frequency feature recovery, skip-and-count decode, pipeline."""

import numpy as np
import pyarrow as pa
import pytest

from docling_eval_ray.stages.audio import (
    SAMPLE_RATE,
    AudioFeatures,
    DecodeAudio,
    audio_feature_stats,
    decode_wav,
    synth_audio_payload,
)

SF_DIR = "/root/testdata/sf0.001"


def test_wav_roundtrip_deterministic():
    p = synth_audio_payload("clip/9")
    assert p == synth_audio_payload("clip/9")
    assert p[:4] == b"RIFF" and p[8:12] == b"WAVE"
    rate, pcm = decode_wav(p)
    assert rate == SAMPLE_RATE
    assert 0.1 <= len(pcm) / rate <= 0.6
    assert np.abs(pcm).max() <= 1.0


def test_features_recover_known_tone():
    """A pure synthetic tone's dominant frequency must come back from
    the rFFT within one bin."""
    import io
    import wave

    rate, f = 8000, 440.0
    t = np.arange(rate, dtype=np.float64) / rate  # 1 s
    pcm = (0.7 * np.sin(2 * np.pi * f * t) * 32767).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(pcm.tobytes())
    tbl = pa.table({
        "media_ref": pa.array(["tone"]),
        "payload": pa.array([buf.getvalue()], pa.binary()),
        "n_bytes": pa.array([len(buf.getvalue())], pa.int64()),
    })
    out = AudioFeatures()(tbl)
    assert abs(out["dominant_hz"][0].as_py() - f) <= 1.0
    # RMS of a 0.7-amplitude sine is 0.7/sqrt(2)
    assert abs(out["rms"][0].as_py() - 0.7 / np.sqrt(2)) < 0.01
    # 440 Hz crosses zero ~880 times/s → zcr ≈ 2f/rate
    assert abs(out["zero_cross_rate"][0].as_py() - 2 * f / rate) < 0.005


def test_decode_stage_skip_and_count():
    good = synth_audio_payload("clip/1")
    tbl = pa.table({
        "media_ref": pa.array(["a", "b"]),
        "payload": pa.array([good, b"not a wav"], pa.binary()),
        "n_bytes": pa.array([len(good), 9], pa.int64()),
    })
    out = DecodeAudio()(tbl)
    assert out["decode_ok"].to_pylist() == [True, False]
    assert out["sample_rate"][0].as_py() == SAMPLE_RATE
    assert out["duration_s"][1].as_py() == 0.0
    # features silently skip the bad row
    feats = AudioFeatures()(tbl)
    assert feats["media_ref"].to_pylist() == ["a"]


def test_multichannel_downmix():
    import io
    import wave

    pcm = np.tile(np.array([1000, -1000], "<i2"), 400)  # L/R interleaved
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(8000)
        w.writeframes(pcm.tobytes())
    rate, mono = decode_wav(buf.getvalue())
    assert len(mono) == 400 and np.allclose(mono, 0.0)  # L+R cancel


def test_audio_feature_stats_pipeline(ray_session):
    df = audio_feature_stats(SF_DIR).to_pandas()
    assert len(df) == 434  # one clip per media span at sf0.001
    assert (df["rms"] > 0).all()
    assert (df["dominant_hz"] > 0).all()
    assert df["media_ref"].nunique() == len(df)
    # deterministic across runs
    df2 = audio_feature_stats(SF_DIR).to_pandas()
    a = df.sort_values("media_ref").reset_index(drop=True)
    b = df2.sort_values("media_ref").reset_index(drop=True)
    assert a.equals(b)


def test_audio_fingerprint_properties():
    """pHash contract for audio: deterministic, robust to small noise
    (few bits flip), discriminative across clips (many bits differ),
    and all 64 bit positions are exercised across a clip population."""
    from docling_eval_ray.stages.audio import (
        audio_fingerprint64,
        decode_wav,
        synth_audio_payload,
    )

    rate, pcm = decode_wav(synth_audio_payload("clip/1"))
    h0 = audio_fingerprint64(pcm, rate)
    assert h0 == audio_fingerprint64(pcm.copy(), rate)
    rng = np.random.default_rng(3)
    near = pcm + rng.normal(0, 0.002, len(pcm))
    ham_near = bin(h0 ^ audio_fingerprint64(near, rate)).count("1")
    assert ham_near <= 10, ham_near
    _, other = decode_wav(synth_audio_payload("clip/2"))
    ham_far = bin(h0 ^ audio_fingerprint64(other, rate)).count("1")
    assert ham_far >= 12, ham_far
    seen = 0
    for i in range(12):
        _, p = decode_wav(synth_audio_payload(f"clip/{i}"))
        seen |= audio_fingerprint64(p, rate)
    assert bin(seen).count("1") > 40  # high bit positions populated


def test_audio_fingerprint_census(ray_session):
    from docling_eval_ray.stages.audio import audio_fingerprint_census

    df = audio_fingerprint_census("/root/testdata/sf0.001").to_pandas()
    assert df["n_clips"].sum() == 434
    # refs are unique and payloads are ref-derived → overwhelmingly
    # distinct fingerprints
    assert len(df) > 400
