"""Unit tests for the pure-stdlib WAV (RIFF/PCM) codec.

The decoder does real byte-level work (chunk walk with alignment
padding, fmt parse, int16 de-interleave) with zero non-stdlib
dependencies. Both codec halves are cross-validated against Python's
own ``wave`` module — a third, independent implementation of the
RIFF/WAVE spec — so encode and decode cannot share a bug.
"""

from __future__ import annotations

import io
import struct
import wave

import pytest

from mapreduce_server_development_spark.functions import audio_codec as a


@pytest.mark.parametrize("doc_id", range(10))
def test_round_trip(doc_id):
    rate, channels, n_frames = a.fixture_audio_params(doc_id)
    samples = a.fixture_samples(doc_id, channels, n_frames)
    blob = a.encode_wav_pcm16(rate, samples)
    r, ch, nf, per_ch = a.decode_wav_pcm16(blob)
    assert (r, ch, nf) == (rate, channels, n_frames)
    assert per_ch == samples


@pytest.mark.parametrize("doc_id", [0, 1, 5])
def test_encoder_readable_by_stdlib_wave(doc_id):
    """Python's wave module (independent RIFF implementation) must
    read our encoder's output and agree on every frame byte."""
    rate, channels, n_frames = a.fixture_audio_params(doc_id)
    samples = a.fixture_samples(doc_id, channels, n_frames)
    blob = a.encode_wav_pcm16(rate, samples)
    with wave.open(io.BytesIO(blob)) as w:
        assert w.getframerate() == rate
        assert w.getnchannels() == channels
        assert w.getnframes() == n_frames
        assert w.getsampwidth() == 2
        frames = w.readframes(n_frames)
    flat = struct.unpack(f"<{n_frames * channels}h", frames)
    for ch in range(channels):
        assert list(flat[ch::channels]) == samples[ch]


def test_decoder_reads_stdlib_wave_output():
    """Our decoder must read a WAV produced by the wave module (which
    writes the canonical chunk layout, no LIST chunk)."""
    rate, samples = 22050, [[100, -200, 3000, -4096, 0, 32767, -32768]]
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(b"".join(struct.pack("<h", s) for s in samples[0]))
    r, ch, nf, per_ch = a.decode_wav_pcm16(buf.getvalue())
    assert (r, ch, nf) == (rate, 1, len(samples[0]))
    assert per_ch == samples


def test_decoder_skips_unknown_chunks():
    """A chunk the decoder has never heard of (odd-sized, exercising
    the 2-byte alignment rule) must be skipped, not fatal."""
    rate, samples = 8000, [[1, -2, 3]]
    blob = a.encode_wav_pcm16(rate, samples)
    # splice an odd-length custom chunk right after the WAVE tag
    extra = b"junk" + struct.pack("<I", 3) + b"xyz" + b"\x00"  # pad byte
    patched = blob[:12] + extra + blob[12:]
    patched = (
        patched[:4]
        + struct.pack("<I", struct.unpack("<I", blob[4:8])[0] + len(extra))
        + patched[8:]
    )
    r, ch, nf, per_ch = a.decode_wav_pcm16(patched)
    assert (r, ch, nf, per_ch) == (rate, 1, 3, samples)


@pytest.mark.parametrize(
    "mutate",
    [
        lambda b: b[:1],  # way too short
        lambda b: b"JUNK" + b[4:],  # wrong magic
        lambda b: b[:-4],  # truncated data chunk
        lambda b: b.replace(b"fmt ", b"fmX "),  # fmt chunk missing
    ],
)
def test_malformed_rejected(mutate):
    blob = a.encode_wav_pcm16(8000, [[1, 2, 3]])
    with pytest.raises(ValueError):
        a.decode_wav_pcm16(bytes(mutate(blob)))


def test_non_pcm_rejected():
    blob = bytearray(a.encode_wav_pcm16(8000, [[1, 2, 3]]))
    i = blob.index(b"fmt ")
    struct.pack_into("<H", blob, i + 8, 3)  # wFormatTag = IEEE float
    with pytest.raises(ValueError):
        a.decode_wav_pcm16(bytes(blob))


def test_spark_query_shape(spark):
    """End-to-end through mapInPandas at sf0.001: every document
    decodes, stats match the fixture arithmetic."""
    from mapreduce_server_development_spark.plans.multimodal_queries import (
        q_audio_decode_real,
    )

    from .conftest import SF_SMOKE

    rows = {r.doc_id: r for r in q_audio_decode_real(spark, SF_SMOKE).collect()}
    assert rows
    for doc_id, r in rows.items():
        rate, channels, n_frames = a.fixture_audio_params(doc_id)
        flat = [s for ch in a.fixture_samples(doc_id, channels, n_frames) for s in ch]
        assert (r.sample_rate, r.channels, r.n_frames) == (rate, channels, n_frames)
        assert r.duration_ms == n_frames * 1000 // rate
        assert r.amp_sum == sum(abs(s) for s in flat)
        assert r.amp_max == max(abs(s) for s in flat)
