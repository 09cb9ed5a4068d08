"""Unit tests for the pure-stdlib image codecs (PNG/BMP/PPM).

These decoders do real byte-level work (zlib inflate, scanline
unfiltering, CRC verification, row un-padding) with zero non-stdlib
dependencies — the no-Pillow counterpart of decode_real_image.
"""

from __future__ import annotations

import struct
import zlib

import pytest

from mapreduce_server_development_spark.functions import stdlib_codec as c


def _gridsum(doc_id: int) -> tuple[int, int, int]:
    w, h = c.fixture_dims(doc_id)
    return w, h, sum(sum(r) for r in c.fixture_rows(doc_id, w, h))


@pytest.mark.parametrize("doc_id", range(12))
def test_round_trip_all_formats(doc_id):
    w, h, gsum = _gridsum(doc_id)
    fmt, enc = c._ENCODERS[doc_id % 3]
    blob = enc(c.fixture_rows(doc_id, w, h))
    W, H, channels, pixels = c._DECODERS[blob[:1]](blob)
    assert (W, H) == (w, h)
    assert channels == (1 if fmt == "png" else 3)
    assert sum(pixels) == gsum * channels


def test_png_unfilter_all_filter_types():
    """Hand-build a PNG using every filter type (None/Sub/Up/Average/
    Paeth) and check the decoder reconstructs the exact pixels."""
    rows = [bytes((10 * y + x * 3) % 256 for x in range(6)) for y in range(5)]

    raw = bytearray()
    prev = bytes(6)
    for ft, row in zip([0, 1, 2, 3, 4], rows):
        raw.append(ft)
        if ft == 0:
            raw.extend(row)
        elif ft == 1:  # Sub
            p = 0
            for b in row:
                raw.append((b - p) & 0xFF)
                p = b
        elif ft == 2:  # Up
            raw.extend((b - u) & 0xFF for b, u in zip(row, prev))
        elif ft == 3:  # Average
            for i, b in enumerate(row):
                a = row[i - 1] if i else 0
                raw.append((b - ((a + prev[i]) >> 1)) & 0xFF)
        elif ft == 4:  # Paeth
            for i, b in enumerate(row):
                a = row[i - 1] if i else 0
                up = prev[i]
                cc = prev[i - 1] if i else 0
                p = a + up - cc
                pa, pb, pc = abs(p - a), abs(p - up), abs(p - cc)
                pred = a if pa <= pb and pa <= pc else (up if pb <= pc else cc)
                raw.append((b - pred) & 0xFF)
        prev = row

    ihdr = struct.pack(">IIBBBBB", 6, 5, 8, 0, 0, 0, 0)
    blob = (
        b"\x89PNG\r\n\x1a\n"
        + c._png_chunk(b"IHDR", ihdr)
        + c._png_chunk(b"IDAT", zlib.compress(bytes(raw)))
        + c._png_chunk(b"IEND", b"")
    )
    w, h, channels, pixels = c.decode_png(blob)
    assert (w, h, channels) == (6, 5, 1)
    assert pixels == b"".join(rows)


def test_png_crc_tamper_rejected():
    blob = bytearray(c.encode_png_gray(c.fixture_rows(0, 4, 4)))
    blob[20] ^= 0xFF  # flip a bit inside IHDR data
    with pytest.raises(ValueError, match="CRC"):
        c.decode_png(bytes(blob))


def test_bmp_row_padding_and_bottom_up():
    # width 5 -> 15-byte rows padded to 16; decoder must strip the pad
    # and flip the bottom-up order.
    rows = [bytes((y * 40 + x) % 256 for x in range(5)) for y in range(3)]
    blob = c.encode_bmp24(rows)
    w, h, channels, pixels = c.decode_bmp(blob)
    assert (w, h, channels) == (5, 3, 3)
    expected = b"".join(bytes((v, v, v)) for row in rows for v in row)
    assert pixels == expected


def test_ppm_header_comments_and_whitespace():
    body = bytes(range(4 * 2 * 3))
    blob = b"P6 # a comment\n  4\t2 # dims\n255\n" + body
    w, h, channels, pixels = c.decode_ppm(blob)
    assert (w, h, channels) == (4, 2, 3)
    assert pixels == body


@pytest.mark.parametrize(
    "blob",
    [
        b"\x89PNG\r\n\x1a\njunk",
        b"BMxx",
        b"P6 garbage",
        b"P6\n4 4\n255\nshort",
        b"",
    ],
)
def test_malformed_blobs_rejected(blob):
    dec = c._DECODERS.get(blob[:1])
    if dec is None:
        return  # unsniffable magic: DataFrame path skips the row
    with pytest.raises((ValueError, struct.error, zlib.error, IndexError)):
        dec(blob)


def test_dataframe_path_permissive(spark):
    """decode_images_stdlib skips malformed rows instead of failing the
    stage, and decodes real rows exactly."""
    from pyspark.sql import Row

    good = c.encode_png_gray(c.fixture_rows(3, 4, 4))
    df = spark.createDataFrame(
        [Row(doc_id=3, img=bytearray(good)),
         Row(doc_id=4, img=bytearray(b"\x89PNG\r\n\x1a\nbroken")),
         Row(doc_id=5, img=bytearray(b"??not media"))],
        "doc_id long, img binary",
    )
    rows = {r["doc_id"]: r for r in c.decode_images_stdlib(df).collect()}
    assert set(rows) == {3}
    assert rows[3]["fmt"] == "png"
    assert rows[3]["pixel_sum"] == sum(
        sum(r) for r in c.fixture_rows(3, 4, 4)
    )
