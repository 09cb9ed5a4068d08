"""Real WAV (RIFF/PCM) audio codec in pure stdlib — no soundfile/librosa.

Companion to ``functions/stdlib_codec.py`` (real image codecs): the
audio half of the multimodal plane gets genuine bytes→samples work
with zero dependencies beyond ``struct``. The encoder writes a real
RIFF/WAVE file against the public format spec (canonical 44-byte-ish
layout plus a junk ``LIST`` chunk so decoders must do an honest chunk
walk, not fixed-offset reads); the decoder walks RIFF chunks, parses
the ``fmt `` block (PCM, format tag 1), de-interleaves the little-
endian int16 frames from ``data``, and reports exact integer sample
statistics. Encode and decode are independent code paths, and the
unit tests additionally cross-validate BOTH against Python's own
``wave`` module — a third, independent stdlib implementation of the
same spec.

Deterministic fixture (mirrored analytically by the DuckDB oracle):

- ``sample_rate`` cycles 8000/16000/44100 by ``doc_id % 3``
- ``channels  = 1 + doc_id % 2`` (mono/stereo)
- ``n_frames  = 64 + doc_id % 64``
- ``sample(ch, i) = ((doc_id * 13 + ch * 5 + i * 11) % 4096) - 2048``
  (signed 16-bit PCM range, exact integers — no float rounding)

Scale posture: encode and decode both run inside Arrow-batched
``mapInPandas`` — one Python worker per partition, no shuffle, no
driver involvement; malformed blobs skip the row (PERMISSIVE, same
posture as the csv/json sources and the image codec).

The reference engine has no binary/audio surface (its data model is
UTF-8 text lines, SURVEY.md §1.2) — this is build-brief-mandated
multimodal depth, not reference parity.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

from pyspark.sql import DataFrame

# ---------------------------------------------------------------------------
# Deterministic fixture arithmetic (mirrored in the oracle SQL)
# ---------------------------------------------------------------------------

_RATES = (8000, 16000, 44100)


def fixture_audio_params(doc_id: int) -> tuple[int, int, int]:
    """(sample_rate, channels, n_frames) for a document."""
    return _RATES[doc_id % 3], 1 + doc_id % 2, 64 + doc_id % 64


def fixture_samples(doc_id: int, channels: int, n_frames: int) -> list[list[int]]:
    """Per-channel int16 sample vectors:
    ``sample(ch, i) = ((doc_id*13 + ch*5 + i*11) % 4096) - 2048``."""
    return [
        [((doc_id * 13 + ch * 5 + i * 11) % 4096) - 2048 for i in range(n_frames)]
        for ch in range(channels)
    ]


# ---------------------------------------------------------------------------
# WAV encode — real RIFF/WAVE writer (PCM 16-bit)
# ---------------------------------------------------------------------------


def encode_wav_pcm16(
    sample_rate: int, channel_samples: list[list[int]]
) -> bytes:
    """Write a real RIFF/WAVE file: ``fmt `` (PCM, tag 1), a junk
    ``LIST`` chunk (forces decoders to chunk-walk instead of reading
    fixed offsets), then interleaved little-endian int16 ``data``."""
    channels = len(channel_samples)
    n_frames = len(channel_samples[0])
    block_align = channels * 2
    fmt = struct.pack(
        "<HHIIHH",
        1,  # wFormatTag = PCM
        channels,
        sample_rate,
        sample_rate * block_align,  # byte rate
        block_align,
        16,  # bits per sample
    )
    interleaved = bytearray()
    for i in range(n_frames):
        for ch in range(channels):
            interleaved += struct.pack("<h", channel_samples[ch][i])
    junk = b"INFOISFT" + struct.pack("<I", 4) + b"mrs\x00"  # LIST/INFO/ISFT
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"LIST" + struct.pack("<I", len(junk)) + junk
        + b"data" + struct.pack("<I", len(interleaved)) + bytes(interleaved)
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


# ---------------------------------------------------------------------------
# WAV decode — RIFF chunk walk + fmt parse + frame de-interleave
# ---------------------------------------------------------------------------


def decode_wav_pcm16(blob: bytes) -> tuple[int, int, int, list[list[int]]]:
    """Parse a RIFF/WAVE file: returns (sample_rate, channels,
    n_frames, per-channel int16 sample vectors).

    Walks chunks (skipping unknown ones, honoring the spec's 2-byte
    alignment padding), requires PCM format tag 1 at 16 bits, and
    rejects truncated payloads — a real decoder, not a fixed-offset
    read of this module's own encoder output.
    """
    if len(blob) < 12 or blob[:4] != b"RIFF" or blob[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    riff_size = struct.unpack_from("<I", blob, 4)[0]
    if riff_size + 8 > len(blob):
        raise ValueError("truncated RIFF payload")
    fmt_fields = None
    data = None
    pos = 12
    while pos + 8 <= riff_size + 8:
        tag = blob[pos : pos + 4]
        size = struct.unpack_from("<I", blob, pos + 4)[0]
        body = blob[pos + 8 : pos + 8 + size]
        if len(body) != size:
            raise ValueError(f"truncated chunk {tag!r}")
        if tag == b"fmt ":
            if size < 16:
                raise ValueError("fmt chunk too small")
            fmt_fields = struct.unpack_from("<HHIIHH", body, 0)
        elif tag == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are 2-byte aligned
    if fmt_fields is None or data is None:
        raise ValueError("missing fmt or data chunk")
    wformat, channels, sample_rate, _byte_rate, block_align, bits = fmt_fields
    if wformat != 1 or bits != 16:
        raise ValueError("only PCM 16-bit supported")
    if channels < 1 or block_align != channels * 2:
        raise ValueError("inconsistent fmt fields")
    if len(data) % block_align:
        raise ValueError("data chunk not frame-aligned")
    n_frames = len(data) // block_align
    flat = struct.unpack(f"<{n_frames * channels}h", data)
    per_channel = [list(flat[ch::channels]) for ch in range(channels)]
    return sample_rate, channels, n_frames, per_channel


# ---------------------------------------------------------------------------
# DataFrame operators (Arrow-batched mapInPandas)
# ---------------------------------------------------------------------------

AUDIO_ENCODE_SCHEMA = "doc_id long, wav binary"
AUDIO_DECODE_SCHEMA = (
    "doc_id long, sample_rate int, channels int, n_frames int, "
    "duration_ms long, amp_sum long, amp_max int"
)


def encode_audio_stdlib(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Emit one REAL WAV file per document from the deterministic
    sample fixture. No shuffle, document-linear."""

    def _enc(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            ids, blobs = [], []
            for doc_id in pdf[id_col]:
                doc_id = int(doc_id)
                rate, channels, n_frames = fixture_audio_params(doc_id)
                ids.append(doc_id)
                blobs.append(
                    encode_wav_pcm16(rate, fixture_samples(doc_id, channels, n_frames))
                )
            yield pd.DataFrame({"doc_id": ids, "wav": blobs})

    return df.select(id_col).mapInPandas(_enc, schema=AUDIO_ENCODE_SCHEMA)


def decode_audio_stdlib(
    df: DataFrame, bin_col: str = "wav", id_col: str = "doc_id"
) -> DataFrame:
    """Decode real WAV bytes into (sample_rate, channels, n_frames,
    duration_ms, amp_sum, amp_max).

    ``amp_sum`` sums ``abs(sample)`` over every frame of every channel
    and ``amp_max`` is the peak amplitude — both exact integers that
    are wrong unless the chunk walk, fmt parse, and int16
    de-interleave all reconstruct the samples bit-for-bit, which is
    what makes this an end-to-end decode check the oracle can
    recompute analytically. Malformed blobs skip the row (PERMISSIVE).
    """

    def _dec(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            out = {
                "doc_id": [], "sample_rate": [], "channels": [],
                "n_frames": [], "duration_ms": [], "amp_sum": [],
                "amp_max": [],
            }
            for doc_id, raw in zip(pdf[id_col], pdf[bin_col]):
                try:
                    rate, channels, n_frames, per_ch = decode_wav_pcm16(bytes(raw))
                except (ValueError, struct.error):
                    continue  # PERMISSIVE: skip malformed rows
                amp_sum = sum(abs(s) for ch in per_ch for s in ch)
                amp_max = max((abs(s) for ch in per_ch for s in ch), default=0)
                out["doc_id"].append(int(doc_id))
                out["sample_rate"].append(rate)
                out["channels"].append(channels)
                out["n_frames"].append(n_frames)
                out["duration_ms"].append(n_frames * 1000 // rate)
                out["amp_sum"].append(amp_sum)
                out["amp_max"].append(amp_max)
            yield pd.DataFrame(out)

    return df.select(id_col, bin_col).mapInPandas(
        _dec, schema=AUDIO_DECODE_SCHEMA
    )
