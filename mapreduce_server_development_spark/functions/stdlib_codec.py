"""Real image codecs in pure stdlib (struct + zlib) — no Pillow.

``functions/multimodal.py`` keeps the deterministic header-stub path
(the container has no image libraries, so that module gates real
decode on Pillow). This module closes the gap with REAL byte-level
codecs written against the public format specs, using only the
standard library:

- **PNG** (grayscale, 8-bit): signature check, chunk walk with CRC32
  verification, IHDR parse, IDAT concatenation, ``zlib`` inflate, and
  full scanline unfiltering (filter types 0-4: None/Sub/Up/Average/
  Paeth).
- **BMP** (24-bit BI_RGB): BITMAPFILEHEADER/BITMAPINFOHEADER parse,
  bottom-up row order, 4-byte row padding.
- **PPM** (P6 binary): whitespace/comment-tolerant header tokenizer,
  raw RGB payload.

The encoder twin produces real files of each format from a
deterministic pixel function, so the decode queries exercise genuine
bytes→pixels work while staying exactly reproducible in the DuckDB
oracle (which recomputes the pixel arithmetic in SQL).

Deterministic fixture (mirrored by the oracle):
``width = 4 + doc_id % 9``, ``height = 4 + (doc_id * 3) % 7``,
``pixel(x, y) = (doc_id + 3*x + 7*y) % 256`` — PNG stores it as
grayscale (1 channel), BMP and PPM replicate it across RGB
(3 channels). Formats cycle png/bmp/ppm by ``doc_id % 3``.

Scale posture: encode and decode both run inside Arrow-batched
``mapInPandas`` — one Python worker per partition, no shuffle, no
driver involvement; decode failures skip the row (PERMISSIVE, like
the csv/json sources) instead of failing the stage.
"""

from __future__ import annotations

import struct
import zlib
from collections.abc import Iterator

from pyspark.sql import DataFrame

# ---------------------------------------------------------------------------
# Deterministic fixture arithmetic (mirrored in the oracle SQL)
# ---------------------------------------------------------------------------


def fixture_dims(doc_id: int) -> tuple[int, int]:
    """(width, height) of the synthetic image for a document."""
    # (doc_id * 3) % 7 cycles through every residue — an earlier
    # (doc_id * 7) % 7 was identically zero, collapsing every
    # fixture image to height 4 and never exercising varying
    # scanline counts.
    return 4 + doc_id % 9, 4 + (doc_id * 3) % 7


def fixture_rows(doc_id: int, w: int, h: int) -> list[bytes]:
    """Grayscale pixel rows: ``pixel(x, y) = (doc_id + 3x + 7y) % 256``."""
    return [
        bytes((doc_id + 3 * x + 7 * y) % 256 for x in range(w))
        for y in range(h)
    ]


# ---------------------------------------------------------------------------
# PNG (grayscale 8-bit) — encode + decode
# ---------------------------------------------------------------------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunk(tag: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + tag
        + data
        + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
    )


def encode_png_gray(rows: list[bytes]) -> bytes:
    """Minimal-but-real PNG writer: grayscale 8-bit, no interlace.

    Odd scanlines use filter type 1 (Sub) so the decoder's unfilter
    path does real reconstruction work, not just byte copies.
    """
    h, w = len(rows), len(rows[0])
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)  # bit depth 8, gray
    raw = bytearray()
    for y, row in enumerate(rows):
        if y % 2 == 1:  # Sub filter: delta vs left neighbor
            raw.append(1)
            prev = 0
            for b in row:
                raw.append((b - prev) & 0xFF)
                prev = b
        else:  # None filter
            raw.append(0)
            raw.extend(row)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _png_chunk(b"IEND", b"")
    )


def _png_unfilter(raw: bytes, w: int, h: int, bpp: int) -> bytes:
    """Reverse PNG scanline filtering (spec section 9: types 0-4)."""
    stride = w * bpp
    out = bytearray()
    prev = bytearray(stride)
    pos = 0
    for _ in range(h):
        ft = raw[pos]
        pos += 1
        row = bytearray(raw[pos : pos + stride])
        if len(row) != stride:
            raise ValueError("truncated scanline")
        pos += stride
        if ft == 1:  # Sub
            for i in range(bpp, stride):
                row[i] = (row[i] + row[i - bpp]) & 0xFF
        elif ft == 2:  # Up
            for i in range(stride):
                row[i] = (row[i] + prev[i]) & 0xFF
        elif ft == 3:  # Average
            for i in range(stride):
                a = row[i - bpp] if i >= bpp else 0
                row[i] = (row[i] + ((a + prev[i]) >> 1)) & 0xFF
        elif ft == 4:  # Paeth predictor
            for i in range(stride):
                a = row[i - bpp] if i >= bpp else 0
                b = prev[i]
                c = prev[i - bpp] if i >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                row[i] = (row[i] + pred) & 0xFF
        elif ft != 0:
            raise ValueError(f"unknown PNG filter type {ft}")
        out += row
        prev = row
    return bytes(out)


def decode_png(blob: bytes) -> tuple[int, int, int, bytes]:
    """Parse a PNG: returns (width, height, channels, pixel bytes).

    Verifies the signature and every chunk CRC, walks chunks to IEND,
    inflates the IDAT stream, and unfilters scanlines. Supports the
    shapes this engine writes (8-bit grayscale and truecolor).
    """
    if blob[:8] != _PNG_SIG:
        raise ValueError("bad PNG signature")
    pos = 8
    w = h = color_type = None
    idat = bytearray()
    while pos + 8 <= len(blob):
        (length,) = struct.unpack(">I", blob[pos : pos + 4])
        tag = blob[pos + 4 : pos + 8]
        data = blob[pos + 8 : pos + 8 + length]
        if len(data) != length:
            raise ValueError("truncated chunk")
        (crc,) = struct.unpack(
            ">I", blob[pos + 8 + length : pos + 12 + length]
        )
        if crc != zlib.crc32(tag + data) & 0xFFFFFFFF:
            raise ValueError(f"CRC mismatch in {tag!r}")
        if tag == b"IHDR":
            w, h, depth, color_type, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", data
            )
            if depth != 8 or comp or filt or interlace:
                raise ValueError("unsupported PNG variant")
        elif tag == b"IDAT":
            idat += data
        elif tag == b"IEND":
            break
        pos += 12 + length
    if w is None or not idat:
        raise ValueError("missing IHDR/IDAT")
    channels = {0: 1, 2: 3}.get(color_type)
    if channels is None:
        raise ValueError(f"unsupported color type {color_type}")
    pixels = _png_unfilter(zlib.decompress(bytes(idat)), w, h, channels)
    return w, h, channels, pixels


# ---------------------------------------------------------------------------
# BMP (24-bit BI_RGB) — encode + decode
# ---------------------------------------------------------------------------


def encode_bmp24(rows: list[bytes]) -> bytes:
    """Real BMP writer: 24-bit uncompressed, bottom-up, padded rows.

    Grayscale input rows are replicated across B, G, R bytes.
    """
    h, w = len(rows), len(rows[0])
    pad = (-(w * 3)) % 4
    body = bytearray()
    for row in reversed(rows):  # BMP stores rows bottom-up
        for v in row:
            body += bytes((v, v, v))
        body += b"\x00" * pad
    file_header = b"BM" + struct.pack("<IHHI", 14 + 40 + len(body), 0, 0, 54)
    info_header = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0
    )
    return file_header + info_header + bytes(body)


def decode_bmp(blob: bytes) -> tuple[int, int, int, bytes]:
    """Parse a 24-bit BI_RGB BMP: (width, height, channels, pixels).

    Handles the bottom-up row order and 4-byte row padding; returns
    pixels top-down as packed BGR triples.
    """
    if blob[:2] != b"BM":
        raise ValueError("bad BMP magic")
    (data_offset,) = struct.unpack("<I", blob[10:14])
    header_size, w, h_raw, planes, bpp, compression = struct.unpack(
        "<IiiHHI", blob[14:34]
    )
    if header_size < 40 or planes != 1 or bpp != 24 or compression != 0:
        raise ValueError("unsupported BMP variant")
    bottom_up = h_raw > 0
    h = abs(h_raw)
    stride = (w * 3 + 3) & ~3
    rows = []
    for r in range(h):
        start = data_offset + r * stride
        row = blob[start : start + w * 3]
        if len(row) != w * 3:
            raise ValueError("truncated BMP pixel data")
        rows.append(row)
    if bottom_up:
        rows.reverse()
    return w, h, 3, b"".join(rows)


# ---------------------------------------------------------------------------
# PPM (P6 binary) — encode + decode
# ---------------------------------------------------------------------------


def encode_ppm(rows: list[bytes]) -> bytes:
    """Real P6 PPM writer; grayscale rows replicated across RGB."""
    h, w = len(rows), len(rows[0])
    body = bytearray()
    for row in rows:
        for v in row:
            body += bytes((v, v, v))
    return b"P6\n%d %d\n255\n" % (w, h) + bytes(body)


def decode_ppm(blob: bytes) -> tuple[int, int, int, bytes]:
    """Parse a binary P6 PPM: (width, height, channels, pixels).

    Tokenizes the header per the spec: fields separated by arbitrary
    whitespace, ``#`` comments allowed, single whitespace byte before
    the raster.
    """
    if blob[:2] != b"P6":
        raise ValueError("bad PPM magic")
    pos, fields = 2, []
    while len(fields) < 3:
        if pos >= len(blob):
            raise ValueError("truncated PPM header")
        c = blob[pos : pos + 1]
        if c.isspace():
            pos += 1
        elif c == b"#":  # comment to end of line
            while pos < len(blob) and blob[pos : pos + 1] != b"\n":
                pos += 1
        elif c.isdigit():
            start = pos
            while pos < len(blob) and blob[pos : pos + 1].isdigit():
                pos += 1
            fields.append(int(blob[start:pos]))
        else:
            raise ValueError("bad PPM header byte")
    w, h, maxval = fields
    if maxval != 255:
        raise ValueError("unsupported PPM maxval")
    pos += 1  # exactly one whitespace byte before the raster
    pixels = blob[pos : pos + w * h * 3]
    if len(pixels) != w * h * 3:
        raise ValueError("truncated PPM raster")
    return w, h, 3, pixels


# ---------------------------------------------------------------------------
# DataFrame operators (Arrow-batched mapInPandas)
# ---------------------------------------------------------------------------

#: doc_id % 3 -> (format name, encoder)
_ENCODERS = {0: ("png", encode_png_gray), 1: ("bmp", encode_bmp24), 2: ("ppm", encode_ppm)}
_DECODERS = {b"\x89": decode_png, b"B": decode_bmp, b"P": decode_ppm}

ENCODE_SCHEMA = "doc_id long, img binary"
DECODE_REAL_SCHEMA = (
    "doc_id long, fmt string, width int, height int, channels int, "
    "pixel_sum long"
)


def encode_images_stdlib(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Emit one REAL image file (png/bmp/ppm by ``doc_id % 3``) per
    document from the deterministic pixel fixture."""

    def _enc(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            ids, blobs = [], []
            for doc_id in pdf[id_col]:
                doc_id = int(doc_id)
                w, h = fixture_dims(doc_id)
                _, encoder = _ENCODERS[doc_id % 3]
                ids.append(doc_id)
                blobs.append(encoder(fixture_rows(doc_id, w, h)))
            yield pd.DataFrame({"doc_id": ids, "img": blobs})

    return df.select(id_col).mapInPandas(_enc, schema=ENCODE_SCHEMA)


def decode_images_stdlib(
    df: DataFrame, bin_col: str = "img", id_col: str = "doc_id"
) -> DataFrame:
    """Decode real image bytes (format sniffed from the first byte)
    into (fmt, width, height, channels, pixel_sum).

    ``pixel_sum`` sums every decoded channel byte — it is wrong unless
    inflate + unfilter (PNG), row un-padding (BMP), and header
    tokenizing (PPM) all reconstruct the exact pixel bytes, which is
    what makes it an end-to-end decode check the oracle can recompute.
    Malformed blobs skip the row (PERMISSIVE).
    """

    def _dec(batches: Iterator) -> Iterator:
        import pandas as pd

        fmt_by_magic = {b"\x89": "png", b"B": "bmp", b"P": "ppm"}
        for pdf in batches:
            out = {"doc_id": [], "fmt": [], "width": [], "height": [],
                   "channels": [], "pixel_sum": []}
            for doc_id, raw in zip(pdf[id_col], pdf[bin_col]):
                blob = bytes(raw)
                decoder = _DECODERS.get(blob[:1])
                if decoder is None:
                    continue
                try:
                    w, h, channels, pixels = decoder(blob)
                except (ValueError, zlib.error, struct.error):
                    continue  # PERMISSIVE: skip malformed rows
                out["doc_id"].append(int(doc_id))
                out["fmt"].append(fmt_by_magic[blob[:1]])
                out["width"].append(w)
                out["height"].append(h)
                out["channels"].append(channels)
                out["pixel_sum"].append(sum(pixels))
            yield pd.DataFrame(out)

    return df.select(id_col, bin_col).mapInPandas(
        _dec, schema=DECODE_REAL_SCHEMA
    )
