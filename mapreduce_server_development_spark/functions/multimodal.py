"""Multimodal column operators: opaque binary payloads + typed metadata.

The posture for image/audio/video at 100 TB (build-brief mandate; the
reference has no binary surface — its data model is UTF-8 text lines,
SURVEY.md §1.2):

- media are opaque ``binary`` columns with typed metadata columns
  beside them; nothing decodes on the JVM;
- metadata extraction (size, content hash, format sniffing) is
  built-in expressions over the binary column — codegen'd, no Python;
- decode / feature-extract / frame-sample run as Arrow-batched
  ``mapInPandas`` (one Python process per partition, zero-copy
  batches) — never row-at-a-time UDFs;
- the actual codec step is STUBBED: the image/audio libraries are not
  in this container, so ``decode_real_image`` gates on Pillow and
  raises ``NotImplementedError`` without it, while the synthetic
  deterministic header format below exercises the full Spark plumbing
  (schema, batching, 1→N explode) end-to-end and is reproducible in
  the DuckDB oracle.

Synthetic payload format (deterministic from the documents fixture):
``{magic}:{width}x{height}:{utf8-payload}`` where magic cycles
IMG1/AUD1/VID1 by ``doc_id % 3``, ``width = 16 + doc_id % 48``,
``height = 16 + (doc_id * 7) % 48``.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Magic prefixes for the synthetic modalities.
MAGICS = ("IMG1", "AUD1", "VID1")


def synth_media_col(id_col: Column, text_col: Column) -> Column:
    """Deterministic synthetic media payload (binary) for a document."""
    magic = (
        F.when(id_col % 3 == 0, MAGICS[0])
        .when(id_col % 3 == 1, MAGICS[1])
        .otherwise(MAGICS[2])
    )
    width = (F.lit(16) + id_col % 48).cast("string")
    height = (F.lit(16) + (id_col * 7) % 48).cast("string")
    header = F.concat(magic, F.lit(":"), width, F.lit("x"), height, F.lit(":"))
    return F.encode(F.concat(header, text_col), "UTF-8")


def binary_metadata(df: DataFrame, bin_col: str = "media", id_col: str = "doc_id") -> DataFrame:
    """Typed metadata for an opaque binary column — all JVM built-ins.

    content hash is md5 over the hex encoding of the bytes (DuckDB's
    md5 only accepts VARCHAR, so both engines hash the hex string).
    Returns (id, n_bytes, content_hash, magic, modality).
    """
    b = F.col(bin_col)
    magic = F.decode(F.expr(f"substring({bin_col}, 1, 4)"), "UTF-8")
    modality = (
        F.when(magic == "IMG1", "image")
        .when(magic == "AUD1", "audio")
        .when(magic == "VID1", "video")
        .otherwise("unknown")
    )
    return df.select(
        F.col(id_col),
        F.length(b).cast("long").alias("n_bytes"),
        F.md5(F.hex(b)).alias("content_hash"),
        magic.alias("magic"),
        modality.alias("modality"),
    )


#: Output schema of the decode stub (Arrow-transferred).
DECODE_SCHEMA = "doc_id long, modality string, width int, height int, n_payload_bytes long"


def decode_media_stub(df: DataFrame, bin_col: str = "media", id_col: str = "doc_id") -> DataFrame:
    """Parse binary headers with Arrow-batched ``mapInPandas``.

    This is the real plumbing a production decode would use — binary
    column in, typed struct out, one Python worker per partition,
    pyarrow batch transfer — with the codec replaced by deterministic
    header parsing (see module docstring). Swap ``_parse`` for a real
    decoder (``decode_real_image``) when codec libs are present.
    """

    def _parse(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            out = {"doc_id": [], "modality": [], "width": [], "height": [],
                   "n_payload_bytes": []}
            for doc_id, raw in zip(pdf[id_col], pdf[bin_col]):
                # PERMISSIVE posture: malformed payloads skip the row
                # instead of failing the whole stage from inside
                # mapInPandas.
                try:
                    magic, dims, payload = bytes(raw).split(b":", 2)
                    w, h = (int(v) for v in dims.split(b"x"))
                    modality = magic.decode("utf-8")
                except (ValueError, UnicodeDecodeError):
                    continue
                out["doc_id"].append(doc_id)
                out["modality"].append(modality)
                out["width"].append(w)
                out["height"].append(h)
                out["n_payload_bytes"].append(len(payload))
            yield pd.DataFrame(out)

    return df.select(id_col, bin_col).mapInPandas(_parse, schema=DECODE_SCHEMA)


#: Output schema of the frame sampler.
FRAME_SCHEMA = "doc_id long, frame_idx int"


def sample_frames_stub(
    df: DataFrame,
    bin_col: str = "media",
    id_col: str = "doc_id",
    stride: int = 4,
) -> DataFrame:
    """1→N frame sampling over video payloads via ``mapInPandas``.

    Synthetic frame count = ``8 + doc_id % 16``; emits every
    ``stride``-th frame index for video rows, nothing for other
    modalities — the exact batch shape of a real frame sampler
    (decode loop replaced by the deterministic stub).
    """

    def _sample(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            ids, idxs = [], []
            for doc_id, raw in zip(pdf[id_col], pdf[bin_col]):
                if not bytes(raw).startswith(b"VID1"):
                    continue
                n_frames = 8 + int(doc_id) % 16
                for i in range(0, n_frames, stride):
                    ids.append(doc_id)
                    idxs.append(i)
            yield pd.DataFrame({"doc_id": ids, "frame_idx": idxs})

    return df.select(id_col, bin_col).mapInPandas(_sample, schema=FRAME_SCHEMA)


#: Output schema of the patch tiler.
PATCH_SCHEMA = "doc_id long, patch_row int, patch_col int, x0 int, y0 int"


def tile_patches_stub(
    df: DataFrame,
    bin_col: str = "media",
    id_col: str = "doc_id",
    patch: int = 16,
) -> DataFrame:
    """ViT-style patch tiling over image payloads via ``mapInPandas``:
    each image explodes into its ceil(h/patch) x ceil(w/patch) grid of
    patch coordinates — the exact 1→N batch shape of a real
    patch-embed preprocessor (decode replaced by deterministic header
    parsing; a real tiler would additionally slice pixel buffers into
    the output batch). Non-image modalities emit nothing.
    """

    def _tile(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            out = {"doc_id": [], "patch_row": [], "patch_col": [],
                   "x0": [], "y0": []}
            for doc_id, raw in zip(pdf[id_col], pdf[bin_col]):
                b = bytes(raw)
                if not b.startswith(b"IMG1"):
                    continue
                # PERMISSIVE posture (same as the csv/json sources): a
                # malformed IMG1 header skips the row instead of failing
                # the whole Spark stage from inside mapInPandas.
                try:
                    _, dims, _ = b.split(b":", 2)
                    w, h = (int(v) for v in dims.split(b"x"))
                except ValueError:
                    continue
                n_rows = -(-h // patch)
                n_cols = -(-w // patch)
                for r in range(n_rows):
                    for c in range(n_cols):
                        out["doc_id"].append(doc_id)
                        out["patch_row"].append(r)
                        out["patch_col"].append(c)
                        out["x0"].append(c * patch)
                        out["y0"].append(r * patch)
            yield pd.DataFrame(out)

    return df.select(id_col, bin_col).mapInPandas(_tile, schema=PATCH_SCHEMA)


def decode_real_image(df: DataFrame, bin_col: str = "media", id_col: str = "doc_id") -> DataFrame:
    """Real image decode — requires Pillow, which is NOT in this
    container. Clearly-marked stub gate: raises unless PIL imports.

    When Pillow is present this returns (id, width, height, mode) by
    decoding actual image bytes inside ``mapInPandas`` — identical
    plumbing to ``decode_media_stub``.
    """
    try:
        import PIL.Image  # noqa: F401
    except ImportError as exc:  # pragma: no cover - container has no PIL
        raise NotImplementedError(
            "real image decode needs Pillow; use decode_media_stub for the "
            "deterministic synthetic-header path"
        ) from exc

    def _decode(batches: Iterator) -> Iterator:  # pragma: no cover
        import io

        import pandas as pd
        import PIL.Image

        for pdf in batches:
            out = {"doc_id": [], "width": [], "height": [], "mode": []}
            for doc_id, raw in zip(pdf[id_col], pdf[bin_col]):
                img = PIL.Image.open(io.BytesIO(bytes(raw)))
                out["doc_id"].append(doc_id)
                out["width"].append(img.width)
                out["height"].append(img.height)
                out["mode"].append(img.mode)
            yield pd.DataFrame(out)

    return df.select(id_col, bin_col).mapInPandas(
        _decode, schema="doc_id long, width int, height int, mode string"
    )


def tensor_stats(df: DataFrame, vec_col: str = "embedding", id_col: str = "vec_id") -> DataFrame:
    """Per-row stats over an ``array<float>`` tensor column — all
    JVM-side higher-order functions, no Python.

    Returns (id, n_dims, l2_norm, mean, vmin, vmax), doubles rounded
    to 4 decimals for cross-engine determinism.
    """
    vv = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    total = F.aggregate(vv, F.lit(0.0), lambda a, x: a + x)
    sq = F.aggregate(vv, F.lit(0.0), lambda a, x: a + x * x)
    n = F.size(vv)
    # "+ 0.0" normalizes IEEE negative zero (round can yield -0.0 for
    # tiny negatives, and engines disagree on the sign) — mirrored in
    # the oracle SQL.
    return df.select(
        F.col(id_col),
        n.cast("long").alias("n_dims"),
        F.round(F.sqrt(sq), 4).alias("l2_norm"),
        (F.round(total / n, 4) + F.lit(0.0)).alias("mean"),
        (F.round(F.array_min(vv), 4) + F.lit(0.0)).alias("vmin"),
        (F.round(F.array_max(vv), 4) + F.lit(0.0)).alias("vmax"),
    )


#: Output schema of the perceptual hasher: four 16-bit hash bands.
AHASH_SCHEMA = "doc_id long, b0 int, b1 int, b2 int, b3 int"


def ahash_images(
    df: DataFrame, bin_col: str = "media", id_col: str = "doc_id"
) -> DataFrame:
    """Perceptual average-hash (aHash) over image payloads via
    Arrow-batched ``mapInPandas`` — the multimodal-dedup front half:
    decode runs in the Python worker (here: 64 evenly-spaced payload
    bytes stand in for an 8x8 luma downsample; a real decoder would
    resize actual pixels), threshold at the integer mean, emit the
    64-bit hash as FOUR 16-bit bands so the engine-side pair join can
    use the same pigeonhole banding as simhash (a near-identical image
    differs in few bits, so some band collides). Non-image and empty
    payloads are skipped (PERMISSIVE posture). All arithmetic is
    integer, so the hash is bit-identical in any engine that can read
    the same bytes.
    """

    def _hash(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            out = {"doc_id": [], "b0": [], "b1": [], "b2": [], "b3": []}
            for doc_id, raw in zip(pdf[id_col], pdf[bin_col]):
                try:
                    magic, _dims, payload = bytes(raw).split(b":", 2)
                except ValueError:
                    continue
                if magic != b"IMG1" or not payload:
                    continue
                n = len(payload)
                samples = [payload[(j * n) // 64] for j in range(64)]
                mean = sum(samples) // 64
                bands = [0, 0, 0, 0]
                for j, s in enumerate(samples):
                    if s > mean:
                        bands[j // 16] |= 1 << (j % 16)
                out["doc_id"].append(doc_id)
                for k in range(4):
                    out[f"b{k}"].append(bands[k])
            yield pd.DataFrame(out)

    return df.select(id_col, bin_col).mapInPandas(_hash, schema=AHASH_SCHEMA)
