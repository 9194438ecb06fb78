"""Multimodal / binary-column operators.

SURVEY.md §2B D-46 plus the multimodal plumbing the north star requires:
image/audio/video as opaque ``binary`` columns with typed metadata,
decode/feature-extract as Arrow-batched Python over ``mapInPandas``.

The reference moves blobs as whole S3 objects into per-task workspaces
and transcodes them in containers (ref ``internal/core/loader.go:148-286``,
``internal/core/executor_docker.go:36-113``, ``images/mov/process_mov.sh:3-8``);
here a blob is a row, transfers are the columnar scan, and the
"container payload" is a vectorized function over content bytes.

The decode step probes for ffmpeg at runtime and decodes genuine
ISO-BMFF (mp4/mov) payloads for real when it is present
(tests/test_binary_ops.py skips-if-no-ffmpeg); in codec-less
environments it remains an honest `NotImplementedError` gate while
everything Spark-side — schema, binary source, Arrow batch shape,
partitioning — is real and tested.
"""

from __future__ import annotations

import hashlib
import os
import tempfile
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from chyme_spark.registry import query

# ---------------------------------------------------------------------------
# D-46: binaryFile source over fixture blobs
# ---------------------------------------------------------------------------

_FIXTURES = {
    # deterministic tiny payloads standing in for media objects.
    # PRINTABLE ASCII only: the DuckDB oracle hashes through a BLOB ->
    # VARCHAR cast (sha256 there is VARCHAR-only), and that cast escapes
    # control bytes (\n becomes the literal chars "\x0A").
    "clip_a.mov": b"FTYPQT00" + b"MOV-PAYLOAD-A" * 8,
    "clip_b.mov": b"FTYPQT00" + b"MOV-PAYLOAD-B" * 16,
    "clip_c.mp4": b"FTYPISOM" + b"MP4-PAYLOAD-C" * 12,
    "notes.txt": b"plain text, not media.",
}

# fixed path (not mkdtemp): the DuckDB oracle SQL is a static string and
# must name the same directory the Spark side reads
FIXTURE_DIR = "/tmp/chyme_blob_fixtures"


def fixture_dir() -> str:
    os.makedirs(FIXTURE_DIR, exist_ok=True)
    for name, payload in _FIXTURES.items():
        path = os.path.join(FIXTURE_DIR, name)
        # always rewrite: stale content from an older fixture definition
        # must not survive (the oracle hashes exact bytes)
        with open(path, "wb") as f:
            f.write(payload)
    return FIXTURE_DIR


# materialize at import time: the oracle's read_blob may run before the
# Spark side in the driver's harness, and both must see the same files
fixture_dir()


@query(
    "d46_binary_files",
    oracle=f"""
    SELECT regexp_extract(filename, '([^/]+)$', 1) AS file_name,
           size AS length,
           sha256(CAST(content AS VARCHAR)) AS content_sha256
    FROM read_blob('{FIXTURE_DIR}/*')
    """,
    doc="D-46 binaryFile source: (name, length, sha256) over blob fixtures (ref blob loader internal/core/loader.go:148-195)",
)
def d46_binary_files(spark: SparkSession, sf: str) -> DataFrame:
    blobs = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.*")
        .load(fixture_dir())
    )
    return blobs.select(
        F.element_at(F.split("path", "/"), -1).alias("file_name"),
        F.col("length"),
        F.sha2("content", 256).alias("content_sha256"),
    )


# ---------------------------------------------------------------------------
# multimodal decode plumbing (mapInPandas over binary column)
# ---------------------------------------------------------------------------

MEDIA_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("payload_len", T.LongType()),
        T.StructField("payload_md5", T.StringType()),
        T.StructField("header_hex", T.StringType()),
        T.StructField("decoded", T.BooleanType()),
    ]
)


def _ffmpeg() -> str | None:
    """Probe for an ffmpeg binary on PATH (cached per process)."""
    import shutil

    global _FFMPEG_CACHE
    if _FFMPEG_CACHE is _UNSET:
        _FFMPEG_CACHE = shutil.which("ffmpeg")
    return _FFMPEG_CACHE


_UNSET = object()
_FFMPEG_CACHE: object = _UNSET


def _looks_isobmff(payload: bytes) -> bool:
    """ISO-BMFF (mp4/mov) sniff: 'ftyp' box at offset 4."""
    return len(payload) >= 12 and payload[4:8] == b"ftyp"


def _ffmpeg_decode(payload: bytes) -> dict:
    """Decode an ISO-BMFF payload with a real ffmpeg: demux the video
    stream (``-an -sn``, mirroring the reference transcode invocation
    ``images/mov/process_mov.sh:3-8``) to raw rgb24 frames and return
    deterministic facts about the decoded output. The reference's
    telemetry demux (``images/mp4/process_mp4.sh:3-10`` ``-map 0:3``)
    maps to the same subprocess shape with a data-track selector; both
    are a one-payload-in, decoded-bytes-out kernel this hook pins."""
    import subprocess

    ff = _ffmpeg()
    with tempfile.TemporaryDirectory() as td:
        src = os.path.join(td, "in.mp4")
        dst = os.path.join(td, "out.raw")
        with open(src, "wb") as f:
            f.write(payload)
        try:
            r = subprocess.run(
                [ff, "-y", "-v", "error", "-i", src, "-an", "-sn",
                 "-f", "rawvideo", "-pix_fmt", "rgb24", dst],
                capture_output=True,
                timeout=60,
            )
        except (subprocess.TimeoutExpired, OSError) as e:
            # a hung decode or a vanished binary must hit the same
            # honest gate as a failed decode — _media_features catches
            # only NotImplementedError; anything else kills the whole
            # mapInPandas task over one payload
            raise NotImplementedError(f"ffmpeg decode aborted: {e}") from e
        if r.returncode != 0 or not os.path.exists(dst) or os.path.getsize(dst) == 0:
            raise NotImplementedError(
                f"ffmpeg could not decode payload: {r.stderr.decode(errors='replace')[:200]}"
            )
        with open(dst, "rb") as f:
            raw = f.read()
    return {
        "decoded_bytes": len(raw),
        "decoded_sha256": hashlib.sha256(raw).hexdigest(),
    }


def _decode_media(payload: bytes, media_type: str) -> dict:
    """Real decoder hook.

    With ffmpeg on PATH and a genuine ISO-BMFF payload, decodes for
    real via :func:`_ffmpeg_decode`. Otherwise this stays an HONEST
    gate: the sandbox carries no codecs, so synthetic payloads keep the
    plumbing (batch shape, schema, partition behavior) exercised with
    the deterministic fallback in ``_media_features``, and the
    NotImplementedError marks exactly where a codec-bearing cluster
    image plugs in (PIL/soundfile for image/audio)."""
    if _looks_isobmff(payload) and _ffmpeg() is not None:
        return _ffmpeg_decode(payload)
    try:
        import PIL  # noqa: F401  (absent in this container by design)
    except ImportError:
        raise NotImplementedError("media codecs not available in this environment") from None
    raise NotImplementedError("real decode path not implemented")


def _media_features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Arrow-batched feature extraction over opaque payload bytes."""
    for pdf in batches:
        out = {
            "doc_id": pdf["doc_id"],
            "media_type": pdf["media_type"],
            "payload_len": pdf["payload"].map(len).astype("int64"),
            "payload_md5": pdf["payload"].map(lambda b: hashlib.md5(b).hexdigest()),
            "header_hex": pdf["payload"].map(lambda b: b[:4].hex()),
        }
        decoded = []
        for payload, mtype in zip(pdf["payload"], pdf["media_type"]):
            try:
                _decode_media(bytes(payload), mtype)
                decoded.append(True)
            except NotImplementedError:
                decoded.append(False)  # stub environment: plumbing only
        out["decoded"] = pd.Series(decoded, index=pdf.index, dtype=bool)
        yield pd.DataFrame(out)


def media_table(spark: SparkSession, sf: str) -> DataFrame:
    """documents -> opaque binary payload + typed metadata columns."""
    from chyme_spark.session import load_table

    docs = load_table(spark, sf, "documents")
    mtype = (
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
    )
    return docs.select(
        "doc_id",
        mtype.alias("media_type"),
        F.encode("text", "UTF-8").alias("payload"),
    )


@query(
    "x_multimodal_features",
    oracle="""
    SELECT doc_id,
           CASE WHEN doc_id % 3 = 0 THEN 'image'
                WHEN doc_id % 3 = 1 THEN 'audio'
                ELSE 'video' END AS media_type,
           strlen(text) AS payload_len,
           md5(text) AS payload_md5,
           -- BYTE-wise first-4: hex the whole blob, take 8 hex chars —
           -- text[1:4] slices CHARACTERS and diverges on multi-byte
           -- content (round-6 review; latent until non-ASCII docs)
           substr(hex(encode(text)), 1, 8)::VARCHAR AS header_hex_upper,
           false AS decoded
    FROM documents
    """,
    doc="multimodal column plumbing: binary payload + metadata through Arrow-batched mapInPandas; byte-level oracle proves the batches carry exact content",
)
def x_multimodal_features(spark: SparkSession, sf: str) -> DataFrame:
    feats = media_table(spark, sf).mapInPandas(_media_features, MEDIA_FEATURE_SCHEMA)
    return feats.select(
        "doc_id",
        "media_type",
        "payload_len",
        "payload_md5",
        F.upper("header_hex").alias("header_hex_upper"),
        "decoded",
    )


# ---------------------------------------------------------------------------
# frame sampling + resize (the transcode-analog payload transforms)
# ---------------------------------------------------------------------------

_FRAME_BYTES = 16  # stand-in frame size; a real decoder yields actual frames
_FRAME_STRIDE = 4  # keep every 4th frame

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.LongType()),
        T.StructField("frame_len", T.LongType()),
        T.StructField("frame_hex", T.StringType()),
    ]
)


def _frame_sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Arrow-batched frame sampler: slice the payload into fixed-size
    frames, keep every ``_FRAME_STRIDE``-th. With a real codec the
    slicing becomes decoder.read_frame(); batch shape, fan-out schema,
    and determinism are what this plumbing pins down."""
    for pdf in batches:
        doc_ids, idxs, lens, hexes = [], [], [], []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            b = bytes(payload)
            n_frames = 0 if not b else (len(b) - 1) // _FRAME_BYTES + 1
            for idx in range(0, n_frames, _FRAME_STRIDE):
                fr = b[idx * _FRAME_BYTES : (idx + 1) * _FRAME_BYTES]
                doc_ids.append(doc_id)
                idxs.append(idx)
                lens.append(len(fr))
                hexes.append(fr.hex().upper())
        yield pd.DataFrame(
            {"doc_id": doc_ids, "frame_idx": idxs, "frame_len": lens, "frame_hex": hexes}
        )


@query(
    "x_frame_sample",
    # True BYTE semantics on both sides (r3 item 7 / ADVICE r2 done):
    # DuckDB v1.0 has no BLOB slicing or md5(BLOB), so the byte slice is
    # carried at the hex level — hex(encode(text)) is 2 chars per BYTE,
    # and a frame of B bytes is the 2B-char substring at doubled
    # offsets. frame_hex proves exact content like md5 did, and the
    # parity no longer assumes ASCII (multi-byte fixture proven in
    # tests/test_binary_ops.py).
    oracle=f"""
    WITH h AS (
        SELECT doc_id, hex(encode(text)) AS hx, octet_length(encode(text)) AS n
        FROM documents),
    fr AS (
        SELECT doc_id, hx,
               unnest(generate_series(0, (n - 1) // {_FRAME_BYTES})) AS frame_idx
        FROM h WHERE n > 0),
    s AS (
        SELECT doc_id, frame_idx,
               substr(hx, 1 + frame_idx * {2 * _FRAME_BYTES}, {2 * _FRAME_BYTES}) AS frame_hex
        FROM fr WHERE frame_idx % {_FRAME_STRIDE} = 0)
    SELECT doc_id, frame_idx,
           strlen(frame_hex) // 2 AS frame_len,
           frame_hex
    FROM s
    """,
    doc="multimodal frame sampling: payload -> fixed-size frames -> keep every k-th, Arrow-batched fan-out (1 blob row -> N frame rows)",
)
def x_frame_sample(spark: SparkSession, sf: str) -> DataFrame:
    """Frame-sample plumbing (video keyframe extraction analog, ref the
    ffmpeg keyint payload ``images/mov/process_mov.sh:3-8``): a blob row
    fans out to one row per sampled frame. The oracle recomputes every
    frame byte-for-byte from the source text, so the Arrow path is
    proven to carry exact content through the 1->N explosion."""
    return media_table(spark, sf).select("doc_id", "payload").mapInPandas(
        _frame_sample, FRAME_SCHEMA
    )


RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("in_len", T.LongType()),
        T.StructField("out_len", T.LongType()),
        T.StructField("out_hex", T.StringType()),
    ]
)


def _resize_half(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Deterministic 2:1 downsample (every 2nd byte) — the stand-in for
    an image resize kernel; swap the slice for PIL.Image.resize when the
    cluster image carries codecs."""
    for pdf in batches:
        out_payload = pdf["payload"].map(lambda b: bytes(b)[::2])
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "in_len": pdf["payload"].map(len).astype("int64"),
                "out_len": out_payload.map(len).astype("int64"),
                "out_hex": out_payload.map(lambda b: b.hex().upper()),
            }
        )


@query(
    "x_media_resize",
    # True BYTE semantics (see x_frame_sample): every 2nd BYTE of the
    # UTF-8 payload, expressed as hex-pair slicing — in_len/out_len are
    # byte counts and out_hex the exact downsampled bytes, valid for
    # multi-byte text (no ASCII assumption).
    oracle="""
    WITH h AS (
        SELECT doc_id, hex(encode(text)) AS hx, octet_length(encode(text)) AS n
        FROM documents),
    r AS (
        SELECT doc_id, n AS in_len,
               COALESCE(array_to_string(list_transform(generate_series(1, n, 2),
                        i -> substr(hx, (i - 1) * 2 + 1, 2)), ''), '') AS out_hex
        FROM h)
    SELECT doc_id, in_len,
           strlen(out_hex) // 2 AS out_len,
           out_hex
    FROM r
    """,
    doc="multimodal resize plumbing: deterministic 2:1 payload downsample through Arrow batches (image-resize kernel analog)",
)
def x_media_resize(spark: SparkSession, sf: str) -> DataFrame:
    return media_table(spark, sf).select("doc_id", "payload").mapInPandas(
        _resize_half, RESIZE_SCHEMA
    )


@query(
    "x_image_phash_neardup",
    # Perceptual-hash near-duplicate detection for the image modality —
    # the multimodal twin of SimHash text dedup. The aHash kernel is
    # the real, published algorithm (average hash: threshold an 8x8
    # grayscale raster at its mean, 64 bits); the DECODE step
    # (JPEG -> raster) is the honest environment gate in _decode_media,
    # so here the raster is the first 64 payload bytes (cycled) — a
    # deterministic stand-in that keeps every downstream stage (hash,
    # banding, candidate join, Hamming verify) real and oracle-proven.
    # Candidates come from 16-bit band collisions (4 bands: any pair
    # within Hamming distance 3 is GUARANTEED a shared band; more
    # distant pairs surface probabilistically), verified at Hamming
    # <= 6. Both engines build the identical banded candidate set, so
    # the output is deterministic and hash-checked.
    oracle="""
    WITH imgs AS (
        SELECT doc_id, hex(encode(text)) AS hx FROM documents
        WHERE doc_id % 3 = 0),
    byt AS (
        SELECT doc_id, CAST(t.i AS BIGINT) AS i,
               ('0x' || substr(hx, CAST(2 * (t.i % (strlen(hx) // 2)) + 1 AS INT), 2))::BIGINT AS b
        FROM imgs, LATERAL unnest(range(0, 64)) AS t(i)),
    m AS (SELECT doc_id, SUM(b) // 64 AS mean FROM byt GROUP BY doc_id),
    bits AS (
        SELECT byt.doc_id, i, CASE WHEN b >= mean THEN 1 ELSE 0 END AS bit
        FROM byt JOIN m USING (doc_id)),
    bands AS (
        SELECT doc_id, i // 16 AS band,
               CAST(SUM(bit * (1 << CAST(i % 16 AS INT))) AS BIGINT) AS bh
        FROM bits GROUP BY doc_id, i // 16),
    cand AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM bands a JOIN bands b
          ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id),
    ham AS (
        SELECT c.doc_a, c.doc_b,
               CAST(SUM(bit_count(xor(ba.bh, bb.bh))) AS BIGINT) AS hamming
        FROM cand c
        JOIN bands ba ON ba.doc_id = c.doc_a
        JOIN bands bb ON bb.doc_id = c.doc_b AND bb.band = ba.band
        GROUP BY c.doc_a, c.doc_b)
    SELECT doc_a, doc_b, hamming FROM ham
    WHERE hamming <= 6
    ORDER BY doc_a, doc_b
    """,
    doc="image perceptual-hash (aHash) near-dup: 8x8 byte raster -> mean-threshold 64-bit hash -> 16-bit band bucket join -> Hamming <= 6 verify; decode stubbed, every Spark stage real and oracle-proven",
)
def x_image_phash_neardup(spark: SparkSession, sf: str) -> DataFrame:
    """100 TB plan: hashing is a narrow JVM map (hex + one explode to
    64 (doc, i, byte) rows — no Python, no UDF); the mean/bit/band
    reductions are keyed on doc_id (map-side combined); candidate
    generation is the SimHash chunk-band equi-join (never all-pairs),
    and the Hamming verify joins the 4-row band table only for
    candidate pairs. At a real corpus the raster comes from the decode
    kernel (_decode_media) instead of the payload prefix — same
    downstream plan."""
    imgs = media_table(spark, sf).filter(F.col("media_type") == "image")
    staged = imgs.select("doc_id", F.hex("payload").alias("hx")).withColumn(
        "bl", F.expr("length(hx) div 2").cast("int")
    )
    byt = staged.select(
        "doc_id",
        F.posexplode(
            F.expr(
                "transform(sequence(0, 63), i -> "
                "cast(conv(substring(hx, cast(2 * (i % bl) + 1 as int), 2), 16, 10) as bigint))"
            )
        ).alias("i", "b"),
    )
    m = byt.groupBy("doc_id").agg(F.expr("sum(b) div 64").alias("mean"))
    bits = byt.join(m, "doc_id").select(
        "doc_id", "i", F.when(F.col("b") >= F.col("mean"), 1).otherwise(0).alias("bit")
    )
    bands = bits.groupBy(
        "doc_id", F.expr("i div 16").alias("band")
    ).agg(
        F.sum(F.expr("bit * shiftleft(1L, cast(i % 16 as int))")).cast("bigint").alias("bh")
    )
    a = bands.alias("a")
    b = bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bh") == F.col("b.bh"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    ba = bands.select(F.col("doc_id").alias("doc_a"), F.col("band"), F.col("bh").alias("bha"))
    bb = bands.select(F.col("doc_id").alias("doc_b"), F.col("band"), F.col("bh").alias("bhb"))
    return (
        cand.join(ba, "doc_a")
        .join(bb, ["doc_b", "band"])
        .groupBy("doc_a", "doc_b")
        .agg(F.sum(F.bit_count(F.expr("bha ^ bhb"))).cast("bigint").alias("hamming"))
        .filter(F.col("hamming") <= 6)
        .orderBy("doc_a", "doc_b")
    )
