"""Multimodal column support: image/audio/video as opaque ``binary``
columns with typed metadata, decoded/feature-extracted via Arrow-batched
Pandas UDFs.

The Spark-side plumbing here is real and tested — schemas, partitioning,
``mapInPandas`` batch shapes, deterministic outputs.  The *codec* step is
stubbed: the media libraries (PIL / torchaudio / av) are not in this
image, so ``decode_image``/``decode_audio`` raise ``NotImplementedError``
unless a deterministic fake decoder is requested.  Swapping the fake for
a real decoder changes ONE function; the distributed plan is unchanged.

At scale: binary payloads live in the parquet row groups (or as object-
store paths in a manifest column); feature extraction is a mapInPandas
scan — embarrassingly parallel, no shuffle — and downstream dedup /
similarity reuse the operators in ops/dedup.py and ops/similarity.py.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dbdiff_spark.io import load_table

FEATURE_DIM = 8

try:  # real decoders, absent in this image — plumbing degrades cleanly
    from PIL import Image  # type: ignore  # noqa: F401

    _HAVE_PIL = True
except Exception:  # pragma: no cover
    _HAVE_PIL = False


def media_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build the canonical multimodal table: one opaque binary payload
    per row plus typed metadata.  The driver testdata has no media files,
    so payload = utf-8 bytes of ``documents.text`` — byte-identical in
    any engine, and structurally exactly what an image-bytes column is.

    Schema: ``doc_id bigint, payload binary, byte_len bigint,
    sha256 string, mime string``.
    """
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.col("text").cast("binary").alias("payload"),
        F.length(F.col("text").cast("binary")).cast("long").alias("byte_len"),
        F.sha2(F.col("text").cast("binary"), 256).alias("sha256"),
        F.lit("text/plain").alias("mime"),
    )


def decode_image(payload: bytes) -> object:
    """Decode an image payload.  STUB: PIL is not in this image."""
    if not _HAVE_PIL:  # pragma: no cover
        raise NotImplementedError(
            "image decoding requires PIL; install pillow on the cluster "
            "image and this function decodes for real"
        )
    import io as _io

    return Image.open(_io.BytesIO(payload))  # pragma: no cover


def _fake_features(payload: bytes, dim: int = FEATURE_DIM) -> list[float]:
    """Deterministic stand-in for a real encoder: bytes → dim floats.
    Stable across engines/runs (pure function of the payload)."""
    import hashlib

    h = hashlib.sha256(payload).digest()
    return [h[i] / 255.0 for i in range(dim)]


def extract_features(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """mapInPandas feature extraction over binary payloads — the real
    distributed shape for media decode: per-partition Arrow batches,
    vectorized pandas in, schema-stable pandas out, zero shuffles."""
    out_schema = (
        ", ".join(f"{c} {t}" for c, t in df.dtypes if c != payload_col)
        + ", features array<float>"
    )
    passthrough = [c for c in df.columns if c != payload_col]
    dim = FEATURE_DIM

    # NOTE: the worker function must be a CLOSURE (pickled by value) —
    # a module-level function pickles by reference and Python workers on
    # a cluster may not have dbdiff_spark importable.
    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        def feats_of(b: bytes) -> list[float]:
            h = hashlib.sha256(b).digest()
            return [h[i] / 255.0 for i in range(dim)]

        for pdf in it:
            feats = pdf[payload_col].map(lambda b: feats_of(bytes(b)))
            yield pdf[passthrough].assign(features=feats)

    return df.mapInPandas(batches, schema=out_schema)


def multimodal_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracle-checkable slice of the manifest (binary column plumbing
    verified end-to-end: cast, length, content hash)."""
    return media_manifest(spark, sf_dir).select(
        "doc_id", "byte_len", "sha256", "mime"
    )


MULTIMODAL_METADATA_SQL = """
SELECT doc_id,
       CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
       sha256(text) AS sha256,
       'text/plain' AS mime
FROM documents
"""


def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature-extraction pipeline end-to-end (mapInPandas path).  The
    fake encoder is deterministic, so even this is oracle-friendly on
    sizes; values are checked by pytest instead (the oracle cannot run
    Python)."""
    manifest = media_manifest(spark, sf_dir)
    feats = extract_features(manifest)
    return feats.select(
        "doc_id",
        F.size("features").cast("long").alias("feature_dim"),
        F.expr(
            "CAST(ROUND(aggregate(features, CAST(0 AS DOUBLE), (acc, x) -> acc + x) * 1000000) AS BIGINT)"
        ).alias("feature_sum_grid"),
    )


def _features_oracle_sql() -> str:
    """The fake encoder is pure byte arithmetic over sha256(text), so
    even the Python mapInPandas path has an exact SQL oracle: byte i of
    the digest parsed from the hex string, /255, truncated to float32
    (matching the array<float> schema), summed left-to-right like
    Spark's ``aggregate`` fold."""
    hexpos = "strpos('0123456789abcdef', substr(h, {p}, 1)) - 1"
    terms = []
    for i in range(FEATURE_DIM):
        hi = hexpos.format(p=2 * i + 1)
        lo = hexpos.format(p=2 * i + 2)
        terms.append(f"CAST(CAST((16 * ({hi}) + ({lo})) / 255.0 AS FLOAT) AS DOUBLE)")
    chain = " + ".join(terms)
    return f"""
SELECT doc_id,
       CAST({FEATURE_DIM} AS BIGINT) AS feature_dim,
       CAST(ROUND(({chain}) * 1000000) AS BIGINT) AS feature_sum_grid
FROM (SELECT doc_id, sha256(text) AS h FROM documents)
"""


# --- frame sampling ---------------------------------------------------------

FRAME_BYTES = 64  # fixed-width frame grid over the payload
FRAME_STEP = 4  # keep every 4th frame


def sample_frames(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Deterministic frame sampling over opaque binary payloads: treat
    the payload as a fixed-width frame grid (a raw video buffer shape)
    and keep every ``FRAME_STEP``-th frame — ``explode(sequence(...))``
    over computed offsets, one output row per sampled frame with the
    frame bytes as a new binary column.

    This is the real distributed plumbing for video frame extraction
    (per-row explode, no shuffle, composes with ``extract_features`` for
    per-frame encoding); a real container format swaps the fixed-width
    offset arithmetic for decoder-reported keyframe offsets inside the
    same plan shape."""
    n_frames = f"greatest(0, CAST(ceil(length({payload_col}) / {FRAME_BYTES}) AS BIGINT) - 1)"
    return df.selectExpr(
        "*", f"explode(sequence(0, {n_frames}, {FRAME_STEP})) AS frame_idx"
    ).selectExpr(
        *[c for c in df.columns if c != payload_col],
        "frame_idx",
        f"substring({payload_col}, CAST(frame_idx * {FRAME_BYTES} + 1 AS INT), "
        f"{FRAME_BYTES}) AS frame",
    )


def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracle-checkable frame sampling: the comparison runs over the HEX
    rendering of the payload (DuckDB cannot slice blobs; hex is
    byte-faithful at 2 chars/byte and both engines render it
    identically), hashing each sampled frame's hex with sha256."""
    m = media_manifest(spark, sf_dir)
    w = 2 * FRAME_BYTES
    return (
        m.selectExpr("doc_id", "hex(payload) AS hx", "byte_len")
        .selectExpr(
            "doc_id",
            "hx",
            f"explode(sequence(0, greatest(0, CAST(ceil(byte_len / {FRAME_BYTES}) "
            f"AS BIGINT) - 1), {FRAME_STEP})) AS frame_idx",
        )
        .selectExpr(
            "doc_id",
            "frame_idx",
            f"CAST(length(substr(hx, CAST(frame_idx * {w} + 1 AS INT), {w})) / 2 "
            "AS BIGINT) AS frame_bytes",
            f"sha2(substr(hx, CAST(frame_idx * {w} + 1 AS INT), {w}), 256) AS frame_sha",
        )
    )


MULTIMODAL_FRAME_SAMPLE_SQL = f"""
WITH m AS (
  SELECT doc_id, hex(encode(text)) AS hx,
         CAST(octet_length(encode(text)) AS BIGINT) AS byte_len
  FROM documents
),
f AS (
  SELECT doc_id, hx,
         unnest(generate_series(0, greatest(0, CAST(ceil(byte_len / {FRAME_BYTES}.0)
                AS BIGINT) - 1), {FRAME_STEP})) AS frame_idx
  FROM m
)
SELECT doc_id, frame_idx,
       CAST(length(substr(hx, CAST(frame_idx * {2 * FRAME_BYTES} + 1 AS INT),
            {2 * FRAME_BYTES})) / 2 AS BIGINT) AS frame_bytes,
       sha256(substr(hx, CAST(frame_idx * {2 * FRAME_BYTES} + 1 AS INT),
              {2 * FRAME_BYTES})) AS frame_sha
FROM f
"""


# --- grouped feature normalization (applyInPandas) ---------------------------
#
# Completes the Arrow trio: mapInPandas (stateless scan, above),
# applyInPandasWithState (streaming, streaming/cdc.py), and here the
# batch GROUPED form — per-group logic that genuinely needs the whole
# group in one pandas frame (cross-row normalization), the canonical
# applyInPandas use.  Everything stays integer (grid = digest_byte *
# 10^6 div 255, means by floor division), so even this Python path has
# an exact SQL oracle.

NORM_GRID = 1_000_000


def per_group_feature_norm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source mean-centering of the fake features: for each source
    group, subtract the per-position integer-grid group mean and report
    each doc's centered feature sum.

    Scale shape: ONE shuffle on the group key brings each group into a
    pandas frame (Arrow batches); groups are source-sized — if a group
    can exceed executor memory, pre-aggregate the means relationally
    and broadcast them instead (that variant is the SQL oracle's
    formulation, which is exactly why the two agree)."""
    manifest = media_manifest(spark, sf_dir).select("doc_id", "payload", "mime")
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    df = manifest.join(docs, "doc_id")
    dim, grid = FEATURE_DIM, NORM_GRID

    def norm(pdf: pd.DataFrame) -> pd.DataFrame:
        import hashlib

        vecs = [
            [(hashlib.sha256(bytes(b)).digest()[i] * grid) // 255 for i in range(dim)]
            for b in pdf["payload"]
        ]
        n = len(vecs)
        gm = [sum(v[i] for v in vecs) // n for i in range(dim)]
        centered = [sum(v[i] - gm[i] for i in range(dim)) for v in vecs]
        return pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "source": pdf["source"],
                "n_group": n,
                "centered_sum_grid": centered,
            }
        )

    return df.groupBy("source").applyInPandas(
        norm,
        schema="doc_id bigint, source string, n_group bigint, centered_sum_grid bigint",
    )


def _group_norm_sql() -> str:
    hexpos = "strpos('0123456789abcdef', substr(h, {p}, 1)) - 1"
    byte_i = [
        f"(16 * ({hexpos.format(p=2 * i + 1)}) + ({hexpos.format(p=2 * i + 2)}))"
        for i in range(FEATURE_DIM)
    ]
    layers = "\n  UNION ALL ".join(
        f"SELECT doc_id, source, {i} AS pos, ({b} * {NORM_GRID}) // 255 AS v FROM d"
        for i, b in enumerate(byte_i)
    )
    return f"""
WITH d AS (SELECT doc_id, source, sha256(text) AS h FROM documents),
pv AS (
  {layers}
),
gm AS (
  SELECT source, pos, CAST(sum(v) // count(*) AS BIGINT) AS m,
         CAST(count(*) AS BIGINT) AS n_group
  FROM pv GROUP BY source, pos
)
SELECT pv.doc_id, pv.source, CAST(max(gm.n_group) AS BIGINT) AS n_group,
       CAST(sum(pv.v - gm.m) AS BIGINT) AS centered_sum_grid
FROM pv JOIN gm ON pv.source = gm.source AND pv.pos = gm.pos
GROUP BY pv.doc_id, pv.source
"""




# --- deterministic "resize" (nearest-neighbor downsample) --------------------
#
# The media-resize step of an ingest pipeline, with the pixel math
# replaced by a deterministic stand-in (this image has no codec libs —
# same policy as decode_image/_fake_features): the document text plays
# the role of a 1-D image whose "pixels" are character codes, and the
# op nearest-neighbor-resamples it to a fixed TILE_PX vector.  The
# Spark-side plumbing is the REAL shape for media work: mapInPandas
# over Arrow batches, schema-stable array<bigint> output, zero
# shuffles, spread() upstream if the source is few-files.  Swapping the
# stand-in for PIL's Image.resize changes only the closure body.

TILE_PX = 16


def resize_nearest(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Nearest-neighbor 1-D resample of each document to ``TILE_PX``
    character codes (zeros for empty docs) — mapInPandas, batch-shaped
    like a real thumbnailer."""
    out_schema = (
        ", ".join(f"{c} {t}" for c, t in df.dtypes if c != text_col)
        + ", tile array<bigint>"
    )
    passthrough = [c for c in df.columns if c != text_col]
    px = TILE_PX

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def tile_of(s: str) -> list[int]:
            n = len(s)
            if n == 0:
                return [0] * px
            return [ord(s[(i * n) // px]) for i in range(px)]

        for pdf in it:
            yield pdf[passthrough].assign(tile=pdf[text_col].map(tile_of))

    return df.mapInPandas(batches, schema=out_schema)


def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize pipeline end-to-end: the tile itself (joined to a string
    so the hash compare is order-exact) plus its length and sum."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    tiles = resize_nearest(docs)
    return tiles.select(
        "doc_id",
        F.expr(
            "array_join(transform(tile, x -> CAST(x AS STRING)), ',')"
        ).alias("tile_csv"),
        F.expr("aggregate(tile, CAST(0 AS BIGINT), (a, x) -> a + x)").alias(
            "tile_sum"
        ),
    )


def _resize_oracle_sql() -> str:
    # nearest-neighbor index i -> character floor(i*n/PX)+1 (1-based),
    # ord() = Spark's ord(s[idx]) for the ASCII fixture text; empty
    # docs resample to zeros
    cells = ", ".join(
        f"CASE WHEN len(text) = 0 THEN 0"
        f" ELSE ord(substr(text, ({i} * len(text)) // {TILE_PX} + 1, 1)) END"
        for i in range(TILE_PX)
    )
    return f"""
SELECT doc_id,
       array_to_string([{cells}], ',') AS tile_csv,
       CAST(list_sum([{cells}]) AS BIGINT) AS tile_sum
FROM documents
"""


QUERIES = {
    "multimodal_metadata": (multimodal_metadata, MULTIMODAL_METADATA_SQL),
    "multimodal_group_norm": (per_group_feature_norm, _group_norm_sql()),
    "multimodal_features": (multimodal_features, _features_oracle_sql()),
    "multimodal_frame_sample": (multimodal_frame_sample, MULTIMODAL_FRAME_SAMPLE_SQL),
    "multimodal_resize": (multimodal_resize, _resize_oracle_sql()),
}
