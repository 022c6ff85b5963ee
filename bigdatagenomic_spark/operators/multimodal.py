"""Multimodal column surface: opaque binary payloads + typed metadata
(north-star extension; no reference counterpart, SURVEY.md §0).

The engine treats image/audio/video as an opaque ``BINARY`` column plus a
typed metadata struct, processed with Arrow-batched Python
(``mapInPandas`` / ``pandas_udf``) — the Spark-idiomatic shape for codec
work that built-in functions can't express. What is REAL here and fully
tested: the schema, the payload plumbing, the Arrow batch shapes, the
explode/repartition strategy, and deterministic byte-level transforms.
What is STUBBED: actual image/audio codec decode — the container has no
PIL/ffmpeg/soundfile, so ``decode_image`` raises ``NotImplementedError``
unless given the deterministic fake decoder used by tests. Swapping the
fake for a real codec changes one function, not the plan.

Payloads are synthesized deterministically from ``documents.text``
(UTF-8 bytes; the driver data is pure ASCII so byte and char offsets
coincide — asserted in tests), which keeps every non-stub operator
DuckDB-oracle-checkable.

Scale notes: payload rows are wide (KB-MB), so the operators keep binary
columns OUT of shuffles — metadata extraction projects before any
exchange, and frame sampling explodes AFTER the per-doc Python step so
only sampled frames ever hit the wire. ``mapInPandas`` batch size is
bounded by ``spark.sql.execution.arrow.maxRecordsPerBatch`` (default
10k); for MB-scale payloads set it to ~100 to keep Arrow batches inside
executor memory.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from bigdatagenomic_spark.sources.tables import fan_out, load_table

FRAME_BYTES = 64  # fake fixed-size "video frame"
FRAME_STRIDE = 4  # sample every 4th frame

MM_META_FIELDS = ("mime", "n_bytes", "sha256")


def attach_payloads(documents: DataFrame) -> DataFrame:
    """documents -> multimodal table: (doc_id, payload BINARY, meta STRUCT).

    Stand-in for reading real media blobs; everything downstream sees
    only (binary, typed metadata) and is agnostic to what the bytes are.
    """
    payload = F.encode(F.col("text"), "UTF-8")
    return documents.select(
        "doc_id",
        payload.alias("payload"),
        F.struct(
            F.lit("text/plain").alias("mime"),
            F.octet_length(payload).alias("n_bytes"),
            F.sha2(payload, 256).alias("sha256"),
        ).alias("meta"),
    )


# --- metadata extraction (pure built-ins, JVM-side) ------------------------


def q_mm_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed metadata over opaque payloads — no Python in the plan."""
    mm = attach_payloads(load_table(spark, sf_dir, "documents"))
    return (
        mm.select("doc_id", "meta.mime", "meta.n_bytes", "meta.sha256")
        .orderBy("doc_id")
    )


# --- frame sampling (mapInPandas: per-doc codec-style work) ----------------


def sample_frames(
    mm: DataFrame, frame_bytes: int = FRAME_BYTES, stride: int = FRAME_STRIDE
) -> DataFrame:
    """Split each payload into fixed-size frames, keep every stride-th.

    The Python step runs per input row and emits only sampled frames
    (one output row per kept frame) — the binary never shuffles whole.
    A real video pipeline swaps the byte-slice for a container demuxer
    with the same (payload in, frame rows out) Arrow contract.
    """

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_ids, out_idx, out_len, out_md5 = [], [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                buf = bytes(payload)
                n_frames = (len(buf) + frame_bytes - 1) // frame_bytes
                for i in range(0, n_frames, stride):
                    frame = buf[i * frame_bytes : (i + 1) * frame_bytes]
                    out_ids.append(doc_id)
                    out_idx.append(i)
                    out_len.append(len(frame))
                    out_md5.append(hashlib.md5(frame).hexdigest())
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(out_ids, dtype="int64"),
                    "frame_idx": pd.Series(out_idx, dtype="int32"),
                    "frame_len": pd.Series(out_len, dtype="int32"),
                    "frame_md5": pd.Series(out_md5, dtype="object"),
                }
            )

    return mm.mapInPandas(
        gen, "doc_id BIGINT, frame_idx INT, frame_len INT, frame_md5 STRING"
    )


def q_mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    mm = attach_payloads(load_table(spark, sf_dir, "documents"))
    return sample_frames(mm).orderBy("doc_id", "frame_idx")


# --- shot-boundary detection (frame signatures + per-video lag window) -----

SHOT_DELTA = 4.0  # mean-byte jump between adjacent frames = a "cut"


def frame_signatures(mm: DataFrame, frame_bytes: int = FRAME_BYTES) -> DataFrame:
    """(doc_id, frame_idx, mean_byte) for EVERY fixed-size frame of each
    payload — the per-frame scalar signature a shot detector compares.
    Same Arrow contract as sample_frames (payload in, narrow frame rows
    out): the binary is consumed inside the Python stage and only
    (id, idx, double) rows ever reach the rest of the plan. A real
    pipeline swaps the byte-slice + mean for a decoder + frame
    histogram/embedding with the identical schema."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_ids, out_idx, out_mean = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                buf = bytes(payload)
                n_frames = (len(buf) + frame_bytes - 1) // frame_bytes
                for i in range(n_frames):
                    frame = buf[i * frame_bytes : (i + 1) * frame_bytes]
                    out_ids.append(doc_id)
                    out_idx.append(i)
                    # int sum / int len: exact, so the double is
                    # bit-identical in any engine
                    out_mean.append(sum(frame) / len(frame))
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(out_ids, dtype="int64"),
                    "frame_idx": pd.Series(out_idx, dtype="int32"),
                    "mean_byte": pd.Series(out_mean, dtype="float64"),
                }
            )

    return mm.mapInPandas(gen, "doc_id BIGINT, frame_idx INT, mean_byte DOUBLE")


def shot_boundaries(
    mm: DataFrame,
    frame_bytes: int = FRAME_BYTES,
    delta: float = SHOT_DELTA,
) -> DataFrame:
    """Shot/scene cuts per video: frames whose signature jumps by at
    least ``delta`` from the previous frame. The comparison is a lag
    window PARTITIONED BY doc_id — per-video frame counts are bounded
    (payload size / frame_bytes), so no partition outgrows one task no
    matter how many videos the corpus holds; nothing global is sorted.
    Returns (doc_id, frame_idx, prev_mean, mean_byte, delta), the
    boundary frames only. Thresholding happens on the RAW exact double
    delta; the reported columns are floor-half-up rounded at 1e-4 for
    engine-portable display."""
    from pyspark.sql import Window as W

    sig = frame_signatures(mm, frame_bytes)
    w = W.partitionBy("doc_id").orderBy("frame_idx")
    prev = F.lag("mean_byte").over(w)

    def r4(c):
        return F.floor(c * 10000 + F.lit(0.5)) / 10000

    return (
        sig.withColumn("prev_raw", prev)
        .where(
            F.col("prev_raw").isNotNull()
            & (F.abs(F.col("mean_byte") - F.col("prev_raw")) >= delta)
        )
        .select(
            "doc_id",
            "frame_idx",
            r4(F.col("prev_raw")).alias("prev_mean"),
            r4(F.col("mean_byte")).alias("mean_byte"),
            r4(F.abs(F.col("mean_byte") - F.col("prev_raw"))).alias("delta"),
        )
    )


def q_mm_shot_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    mm = attach_payloads(load_table(spark, sf_dir, "documents"))
    return shot_boundaries(mm).orderBy("doc_id", "frame_idx")


# --- byte-level feature extraction (scalar pandas_udf) ---------------------


# explicit StructType (not a DDL string): the decorator must not need a
# live SparkSession at import time
_BYTE_FEATURES_TYPE = T.StructType(
    [
        T.StructField("first_byte", T.IntegerType()),
        T.StructField("max_byte", T.IntegerType()),
        T.StructField("mean_byte", T.DoubleType()),
    ]
)


@F.pandas_udf(_BYTE_FEATURES_TYPE)
def byte_features(payload: pd.Series) -> pd.DataFrame:
    """Vectorized feature extraction from raw bytes (Arrow in, Arrow out).

    Stand-in for e.g. embedding extraction from decoded pixels; the
    contract (binary series in, struct series out) is the real part.
    """
    firsts, maxs, means = [], [], []
    for payload_bytes in payload:
        buf = bytes(payload_bytes)
        firsts.append(buf[0] if buf else None)
        maxs.append(max(buf) if buf else None)
        means.append(sum(buf) / len(buf) if buf else None)
    return pd.DataFrame({"first_byte": firsts, "max_byte": maxs, "mean_byte": means})


def q_mm_byte_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    mm = attach_payloads(load_table(spark, sf_dir, "documents"))
    return (
        mm.select("doc_id", byte_features("payload").alias("f"))
        .select(
            "doc_id",
            F.col("f.first_byte").alias("first_byte"),
            F.col("f.max_byte").alias("max_byte"),
            # portable HALF_UP (see relational.round2_portable): keeps the
            # 4-decimal mean bit-identical with the DuckDB oracle
            (F.floor(F.col("f.mean_byte") * 10000 + F.lit(0.5)).cast("double") / 10000)
            .alias("mean_byte"),
        )
        .orderBy("doc_id")
    )


# --- decode stubs (codec boundary) ----------------------------------------


def fake_image_decoder(buf: bytes) -> tuple[int, int, int]:
    """Deterministic stand-in decoder: (width, height, pixel_checksum)."""
    h = hashlib.md5(buf).digest()
    width = 16 + h[0] % 16
    height = 16 + h[1] % 16
    checksum = int.from_bytes(h[2:6], "big")
    return width, height, checksum


def decode_images(mm: DataFrame, decoder=None) -> DataFrame:
    """Decode payloads to (width, height, pixel_checksum) rows.

    ``decoder`` is the codec boundary: pass ``fake_image_decoder`` (or a
    real ``PIL.Image.open``-based callable when the library exists).
    Without a decoder this raises ``NotImplementedError`` — loudly, at
    plan-build time, not per-row inside executors.
    """
    if decoder is None:
        raise NotImplementedError(
            "no image codec available in this environment; pass "
            "decoder=fake_image_decoder (tests) or a PIL-backed callable"
        )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = [decoder(bytes(p)) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "width": pd.Series([d[0] for d in decoded], dtype="int32"),
                    "height": pd.Series([d[1] for d in decoded], dtype="int32"),
                    "pixel_checksum": pd.Series(
                        [d[2] for d in decoded], dtype="int64"
                    ),
                }
            )

    return mm.mapInPandas(
        gen, "doc_id BIGINT, width INT, height INT, pixel_checksum BIGINT"
    )


def encode_bmp(width: int, height: int, rgb: bytes) -> bytes:
    """Minimal 24-bpp uncompressed BMP encoder (BITMAPINFOHEADER,
    bottom-up rows, 4-byte row padding). Pure stdlib — the test-fixture
    generator for the REAL decoder path below; ``rgb`` is top-down
    row-major RGB triples (3*width*height bytes)."""
    import struct

    if len(rgb) != 3 * width * height:
        raise ValueError("rgb must be 3*width*height bytes")
    row_stride = (width * 3 + 3) & ~3
    pad = b"\x00" * (row_stride - width * 3)
    rows = []
    for y in range(height - 1, -1, -1):  # bottom-up
        row = bytearray()
        for x in range(width):
            off = (y * width + x) * 3
            r, g, b = rgb[off], rgb[off + 1], rgb[off + 2]
            row += bytes((b, g, r))  # BGR on disk
        rows.append(bytes(row) + pad)
    pixel_data = b"".join(rows)
    info = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(pixel_data),
        2835, 2835, 0, 0,
    )
    file_header = struct.pack(
        "<2sIHHI", b"BM", 14 + 40 + len(pixel_data), 0, 0, 14 + 40
    )
    return file_header + info + pixel_data


def bmp_image_decoder(buf: bytes) -> tuple[int, int, int]:
    """REAL image decoder for the codec boundary (VERDICT r5 #9): a
    pure-stdlib struct parse of 24-bpp uncompressed BMPs — no PIL.
    Walks the padded bottom-up pixel rows back to top-down row-major
    RGB and returns (width, height, pixel_checksum) with the checksum a
    crc32 over the RGB bytes, satisfying the same contract as
    :func:`fake_image_decoder` so it drops into
    :func:`decode_images`/:func:`resize_images` unchanged."""
    import struct
    import zlib

    magic, _fsize, _r1, _r2, data_off = struct.unpack_from("<2sIHHI", buf, 0)
    if magic != b"BM":
        raise ValueError("not a BMP payload")
    (hdr_size, width, height, _planes, bpp, compression) = struct.unpack_from(
        "<IiiHHI", buf, 14
    )
    if hdr_size < 40 or bpp != 24 or compression != 0:
        raise ValueError(f"unsupported BMP variant: bpp={bpp} comp={compression}")
    bottom_up = height > 0
    height = abs(height)
    row_stride = (width * 3 + 3) & ~3
    rgb = bytearray()
    for y in range(height):
        src_row = (height - 1 - y) if bottom_up else y
        off = data_off + src_row * row_stride
        for x in range(width):
            b, g, r = buf[off + x * 3], buf[off + x * 3 + 1], buf[off + x * 3 + 2]
            rgb += bytes((r, g, b))
    return width, height, zlib.crc32(bytes(rgb))


# --------------------------------------------------------------------------
# fixed-size payload chunking (multipart storage / upload plumbing)
# --------------------------------------------------------------------------
CHUNK_BYTES = 256


def chunk_payloads(mm: DataFrame, chunk_bytes: int = CHUNK_BYTES) -> DataFrame:
    """Split each binary payload into fixed-size chunks with per-chunk
    checksum + length — the multipart-upload/content-addressed-store
    plumbing for blob columns. The explode is a narrow map (no shuffle);
    chunk extraction is binary ``substring`` JVM-side, and only the
    (doc, chunk_id, md5, length) manifest — never the bytes — needs to
    move for dedup/verification downstream.
    """
    n_chunks = F.ceil(F.col("meta.n_bytes") / F.lit(chunk_bytes)).cast("int")
    rows = mm.select(
        "doc_id",
        "payload",
        F.explode(
            F.sequence(F.lit(0), F.greatest(n_chunks - 1, F.lit(0)))
        ).alias("chunk_id"),
    )
    chunk = F.expr(
        f"substring(payload, chunk_id * {chunk_bytes} + 1, {chunk_bytes})"
    )
    return rows.select(
        "doc_id",
        "chunk_id",
        F.octet_length(chunk).alias("chunk_bytes"),
        F.md5(chunk).alias("chunk_md5"),
    )


def q_mm_chunked_payload(spark: SparkSession, sf_dir: str) -> DataFrame:
    mm = attach_payloads(load_table(spark, sf_dir, "documents"))
    return chunk_payloads(mm).orderBy("doc_id", "chunk_id")


Q_MM_CHUNKED_PAYLOAD_SQL = f"""
WITH p AS (
  SELECT doc_id, text, length(text) AS n FROM documents
), c AS (
  SELECT doc_id, text,
         unnest(range(0, greatest(CAST(ceil(n / {CHUNK_BYTES}.0) AS INT), 1)))
           AS chunk_id
  FROM p
)
SELECT doc_id, CAST(chunk_id AS INT) AS chunk_id,
       CAST(length(substr(text, CAST(chunk_id * {CHUNK_BYTES} + 1 AS INT),
                          {CHUNK_BYTES})) AS INT) AS chunk_bytes,
       md5(substr(text, CAST(chunk_id * {CHUNK_BYTES} + 1 AS INT),
                  {CHUNK_BYTES})) AS chunk_md5
FROM c
ORDER BY doc_id, chunk_id
"""


# --------------------------------------------------------------------------
# thumbnail resize (decode -> scale -> re-encode shape)
# --------------------------------------------------------------------------
THUMB_BOX = 32  # fit into a 32x32 box, aspect preserved


def resize_images(mm: DataFrame, decoder=None, box: int = THUMB_BOX) -> DataFrame:
    """Decode -> aspect-preserving integer resize -> fake re-encode.

    The Spark-side plumbing is the real thing (Arrow-batched
    ``mapInPandas`` over (doc_id, payload), narrow output schema, binary
    column never shuffled); the codec is the injected boundary exactly
    like :func:`decode_images`. Integer floor arithmetic keeps the
    scaled dims bit-identical across engines; the "re-encoded" checksum
    is a deterministic function of (pixel_checksum, out dims) standing
    in for the bytes of a real thumbnail.
    """
    if decoder is None:
        raise NotImplementedError(
            "no image codec available in this environment; pass "
            "decoder=fake_image_decoder (tests) or a PIL-backed callable"
        )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": pdf["doc_id"].astype("int64"), "width": [],
                   "height": [], "out_w": [], "out_h": [], "thumb_checksum": []}
            for p in pdf["payload"]:
                w, h, csum = decoder(bytes(p))
                m = max(w, h)
                ow, oh = (w * box) // m, (h * box) // m
                out["width"].append(w)
                out["height"].append(h)
                out["out_w"].append(ow)
                out["out_h"].append(oh)
                out["thumb_checksum"].append((csum * ow + oh) % 2147483647)
            yield pd.DataFrame(
                {
                    "doc_id": out["doc_id"],
                    "width": pd.Series(out["width"], dtype="int32"),
                    "height": pd.Series(out["height"], dtype="int32"),
                    "out_w": pd.Series(out["out_w"], dtype="int32"),
                    "out_h": pd.Series(out["out_h"], dtype="int32"),
                    "thumb_checksum": pd.Series(
                        out["thumb_checksum"], dtype="int64"
                    ),
                }
            )

    return mm.select("doc_id", "payload").mapInPandas(
        gen,
        "doc_id BIGINT, width INT, height INT, out_w INT, out_h INT, "
        "thumb_checksum BIGINT",
    )


def q_mm_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    mm = attach_payloads(load_table(spark, sf_dir, "documents"))
    return resize_images(mm, decoder=fake_image_decoder).orderBy("doc_id")


# --- perceptual-hash near-dup detection (aHash + Hamming blocking) ---------
PHASH_CELLS = 32  # 32-cell average hash -> 32-bit signature
PHASH_MAX_HAMMING = 3


@F.pandas_udf(T.LongType())
def ahash32(payload: pd.Series) -> pd.Series:
    """32-bit average hash (aHash) of a binary payload, Arrow-batched.

    The byte stream is cut into 32 equal cells; bit j is set when cell
    j's mean exceeds the global byte mean — the classic perceptual-hash
    recipe with the 2-D pixel grid flattened to 1-D (a real image
    decoder would feed pixel rows here; the contract and the blocking
    math are identical). All cell sums are integer-valued, so the
    means are IEEE-exact and the oracle reproduces the hash bit-for-bit
    from the same bytes.
    """
    out = []
    for payload_bytes in payload:
        buf = bytes(payload_bytes) if payload_bytes is not None else b""
        n = len(buf)
        if n == 0:
            out.append(0)
            continue
        mean = sum(buf) / n
        h = 0
        for j in range(PHASH_CELLS):
            lo, hi = (j * n) // PHASH_CELLS, ((j + 1) * n) // PHASH_CELLS
            cell = buf[lo:hi]
            if cell and (sum(cell) / len(cell)) > mean:
                h |= 1 << j
        out.append(h)
    return pd.Series(out, dtype="int64")


def phash_pairs(mm: DataFrame, max_hamming: int = PHASH_MAX_HAMMING) -> DataFrame:
    """(a_id, b_id, hamming) — near-duplicate payloads by perceptual
    hash, found with the SAME pigeonhole chunk blocking as the SimHash
    text path (dedup.simhash_pairs): candidates only from an equi-join
    on one of four 8-bit chunks, exact popcount verify after. Recall is
    guaranteed for max_hamming <= 3; the candidate join is never
    all-pairs, so the image-dedup pass scales exactly like the text
    one. NULL/empty payloads are excluded up front (they would all
    hash to the degenerate signature 0 and pair with each other,
    which the oracle's ``n > 0`` guard rightly rejects)."""
    from bigdatagenomic_spark.operators.dedup import simhash_pairs

    hashable = mm.where(
        F.col("payload").isNotNull() & (F.octet_length("payload") > 0)
    )
    sigs = hashable.select("doc_id", ahash32("payload").alias("simhash"))
    return simhash_pairs(sigs, max_hamming=max_hamming)


def q_mm_phash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    mm = attach_payloads(load_table(spark, sf_dir, "documents"))
    return phash_pairs(mm).orderBy("a_id", "b_id")


# --- silence/flat-region trimming (variance-gated frame filter) ------------
TRIM_FRAME_BYTES = 64
# keep a frame when n*sum(x^2) - sum(x)^2 > TRIM_VAR_T * n^2  (i.e. byte
# variance > TRIM_VAR_T) — the comparison stays in exact integers
TRIM_VAR_T = 150


def trim_flat_frames(
    mm: DataFrame,
    frame_bytes: int = TRIM_FRAME_BYTES,
    var_threshold: int = TRIM_VAR_T,
) -> DataFrame:
    """(doc_id, frame_idx, frame_len, variance_num, kept) — the audio
    silence-removal shape: cut each payload into fixed frames and gate
    on per-frame energy/variance, keeping only 'active' frames. A real
    audio pipeline swaps the byte-variance for decoded-sample RMS with
    the same Arrow contract (payload in, per-frame verdicts out).

    The gate is the integer cross-multiplied variance test
    ``n*Σx² − (Σx)² > T·n²`` — byte sums and squares are exact
    integers, so the verdict is engine-exact with no float epsilon,
    and the oracle replays it directly on ascii codes.
    """

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, lens, nums, keeps = [], [], [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                # NULL payloads (NULL-text docs) yield zero frames, like
                # the empty payload — mirrors the oracle, where a NULL
                # codes list unnests to no frame rows.
                buf = bytes(payload) if payload is not None else b""
                n_frames = (len(buf) + frame_bytes - 1) // frame_bytes
                for i in range(n_frames):
                    fr = buf[i * frame_bytes : (i + 1) * frame_bytes]
                    n = len(fr)
                    s = sum(fr)
                    sq = sum(b * b for b in fr)
                    num = n * sq - s * s
                    ids.append(doc_id)
                    idxs.append(i)
                    lens.append(n)
                    nums.append(num)
                    keeps.append(num > var_threshold * n * n)
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "frame_len": pd.Series(lens, dtype="int32"),
                    "variance_num": pd.Series(nums, dtype="int64"),
                    "kept": pd.Series(keeps, dtype="bool"),
                }
            )

    return mm.mapInPandas(
        gen,
        "doc_id BIGINT, frame_idx INT, frame_len INT,"
        " variance_num BIGINT, kept BOOLEAN",
    )


def q_mm_silence_trim(spark: SparkSession, sf_dir: str) -> DataFrame:
    mm = attach_payloads(load_table(spark, sf_dir, "documents"))
    return trim_flat_frames(mm).orderBy("doc_id", "frame_idx")


# --------------------------------------------------------------------------
# per-image pixel statistics (mean channel / luminance profiling)
# --------------------------------------------------------------------------

def fake_rgb_decoder(buf: bytes) -> tuple[int, int, int, int]:
    """Deterministic stand-in pixel decoder: interpret the payload as
    packed top-down RGB triples. Returns (n_px, sum_r, sum_g, sum_b) —
    replayable byte-for-byte by the SQL oracle over the ASCII text."""
    n_px = len(buf) // 3
    view = buf[: 3 * n_px]
    return (
        n_px,
        sum(view[0::3]),
        sum(view[1::3]),
        sum(view[2::3]),
    )


def bmp_rgb_decoder(buf: bytes) -> tuple[int, int, int, int]:
    """REAL pixel decoder for the same contract: struct-parse a 24-bpp
    BMP (the :func:`bmp_image_decoder` walk) and return the channel
    sums over the decoded top-down RGB bytes."""
    import struct

    magic, _fsize, _r1, _r2, data_off = struct.unpack_from("<2sIHHI", buf, 0)
    if magic != b"BM":
        raise ValueError("not a BMP payload")
    (hdr_size, width, height, _planes, bpp, compression) = struct.unpack_from(
        "<IiiHHI", buf, 14
    )
    if hdr_size < 40 or bpp != 24 or compression != 0:
        raise ValueError(f"unsupported BMP variant: bpp={bpp} comp={compression}")
    height = abs(height)
    row_stride = (width * 3 + 3) & ~3
    sum_r = sum_g = sum_b = 0
    for y in range(height):
        off = data_off + y * row_stride
        for x in range(width):
            sum_b += buf[off + x * 3]
            sum_g += buf[off + x * 3 + 1]
            sum_r += buf[off + x * 3 + 2]
    return width * height, sum_r, sum_g, sum_b


def pixel_stats(mm: DataFrame, decoder=None) -> DataFrame:
    """Per-image channel sums + integer mean luminance — the
    brightness/color profiling pass an image-curation pipeline runs
    before filtering (too-dark / single-color screens), and the shape
    any per-pixel reduction (NSFW heuristics, blur metrics) takes.

    Same codec-boundary contract as :func:`decode_images`: the decoder
    is injected (``fake_rgb_decoder`` for the oracle-checked entry,
    ``bmp_rgb_decoder`` REAL in tests), the Spark side is an
    Arrow-batched ``mapInPandas`` whose output is five BIGINTs per doc
    — payload bytes never cross a shuffle. ``mean_lum_milli`` is the
    truncated integer ``(299*sr + 587*sg + 114*sb) div n_px`` (the
    Rec.601 luma weights x1000) — exact in both engines.
    """
    if decoder is None:
        raise NotImplementedError(
            "no image codec available in this environment; pass "
            "decoder=fake_rgb_decoder (oracle) or bmp_rgb_decoder (BMP)"
        )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [decoder(bytes(p)) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "n_px": pd.Series([r[0] for r in rows], dtype="int64"),
                    "sum_r": pd.Series([r[1] for r in rows], dtype="int64"),
                    "sum_g": pd.Series([r[2] for r in rows], dtype="int64"),
                    "sum_b": pd.Series([r[3] for r in rows], dtype="int64"),
                }
            )

    out = mm.select("doc_id", "payload").mapInPandas(
        gen,
        "doc_id BIGINT, n_px BIGINT, sum_r BIGINT, sum_g BIGINT, sum_b BIGINT",
    )
    return out.where(F.col("n_px") > 0).withColumn(
        "mean_lum_milli",
        F.expr("(299 * sum_r + 587 * sum_g + 114 * sum_b) div n_px"),
    )


def q_mm_pixel_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    mm = attach_payloads(load_table(spark, sf_dir, "documents"))
    return pixel_stats(mm, decoder=fake_rgb_decoder).orderBy("doc_id")


Q_MM_PIXEL_STATS_SQL = """
WITH p AS (
  SELECT doc_id, text, CAST(length(text) // 3 AS BIGINT) AS n_px
  FROM documents WHERE text IS NOT NULL AND length(text) >= 3),
s AS (
  SELECT doc_id, n_px,
         CAST(list_sum(list_transform(range(0, CAST(n_px AS INT)),
              i -> ascii(substr(text, CAST(3*i+1 AS INT), 1)))) AS BIGINT)
           AS sum_r,
         CAST(list_sum(list_transform(range(0, CAST(n_px AS INT)),
              i -> ascii(substr(text, CAST(3*i+2 AS INT), 1)))) AS BIGINT)
           AS sum_g,
         CAST(list_sum(list_transform(range(0, CAST(n_px AS INT)),
              i -> ascii(substr(text, CAST(3*i+3 AS INT), 1)))) AS BIGINT)
           AS sum_b
  FROM p)
SELECT doc_id, n_px, sum_r, sum_g, sum_b,
       (299 * sum_r + 587 * sum_g + 114 * sum_b) // n_px AS mean_lum_milli
FROM s ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# exact payload dedup by content hash (round 11)
# ---------------------------------------------------------------------------

def q_mm_payload_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact binary-dedup REPORT over the multimodal payload column:
    group payloads by content sha256, then roll the hash table up to
    one corpus row — total payloads, distinct contents, duplicate
    clusters, redundant copies, and wasted bytes. The FIRST dedup pass
    any image/audio/video corpus runs (identical files re-crawled under
    different ids), upstream of perceptual pHash near-dup; the report
    row is what the ingest dashboard plots (cluster listings are the
    q24-shape drill-down).

    The digest computes JVM-side in the scan's stage (sha2 over the
    binary column, no Python); the shuffle carries (hash, n_bytes) —
    payload BYTES never cross the exchange (the multimodal family's
    standing rule). Copies within a hash group have identical bytes,
    so wasted = (copies - 1) * n_bytes summed over groups, exact.
    """
    mm = attach_payloads(
        load_table(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    )
    per_hash = (
        mm.select("meta.sha256", "meta.n_bytes")
        .groupBy("sha256")
        .agg(
            F.count("*").cast("long").alias("_cnt"),
            F.max("n_bytes").cast("long").alias("_b"),
        )
    )
    return per_hash.agg(
        F.sum("_cnt").cast("long").alias("n_payloads"),
        F.count("*").cast("long").alias("n_distinct"),
        F.sum(F.when(F.col("_cnt") >= 2, 1).otherwise(0))
        .cast("long")
        .alias("n_dup_clusters"),
        F.sum(F.col("_cnt") - 1).cast("long").alias("n_redundant_copies"),
        F.sum((F.col("_cnt") - 1) * F.col("_b")).cast("long").alias("wasted_bytes"),
        F.sum(F.col("_cnt") * F.col("_b")).cast("long").alias("total_bytes"),
    )


Q_MM_PAYLOAD_DEDUP_SQL = """
WITH mm AS (
  SELECT sha256(text) AS h,
         CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
  FROM documents WHERE text IS NOT NULL
), per_hash AS (
  SELECT h, CAST(count(*) AS BIGINT) AS cnt,
         CAST(max(n_bytes) AS BIGINT) AS b
  FROM mm GROUP BY h
)
SELECT CAST(sum(cnt) AS BIGINT) AS n_payloads,
       CAST(count(*) AS BIGINT) AS n_distinct,
       CAST(sum(CASE WHEN cnt >= 2 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_dup_clusters,
       CAST(sum(cnt - 1) AS BIGINT) AS n_redundant_copies,
       CAST(sum((cnt - 1) * b) AS BIGINT) AS wasted_bytes,
       CAST(sum(cnt * b) AS BIGINT) AS total_bytes
FROM per_hash
"""
