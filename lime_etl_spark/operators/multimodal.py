"""Multimodal columns: image/audio/video as opaque binary payloads.

A 100 TB training-data pipeline carries media as `binary` columns with
typed metadata, and runs decode / feature-extraction / resize /
frame-sampling as Arrow-batched Python stages (`mapInPandas`) — the
media libraries are C extensions, so this is the one operator family
where Python in the hot path is unavoidable. The Spark-side plumbing
here is real and tested: schemas, batch shapes, 1→N frame explosion,
partition sizing. The codec step itself is STUBBED: no image/audio
libs ship in this container, so each op either raises
``NotImplementedError`` (real mode) or runs a clearly-marked
deterministic fake decoder (``LIME_SPARK_FAKE_DECODE=1``) that parses
the synthetic container format produced by ``build_media_fixture``.

Scale notes:

- **Bytes stay in Arrow.** mapInPandas moves binary columns
  JVM→Python as Arrow buffers (zero-copy), batch at a time — never
  row-at-a-time pickling.
- **Size partitions by bytes, not rows.** Media rows are MBs;
  `spark.sql.files.maxPartitionBytes` (and
  `spark.sql.execution.arrow.maxRecordsPerBatch`) keep a batch of
  decoded frames within executor memory.
- **Project early.** Feature extraction selects only (id, content);
  dragging a 10 MB payload through a wide row wastes shuffle.
- **1→N explosion (frame sampling) is a generator** — frames for one
  video never materialize as one giant in-memory list.
"""

from __future__ import annotations

import hashlib
import os
import struct
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MAGIC = b"LMM1"  # synthetic container: magic, media_type, dims, payload

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("media_type", StringType(), False),
        StructField("content", BinaryType(), False),
        StructField(
            "meta",
            StructType(
                [
                    StructField("width", IntegerType(), True),
                    StructField("height", IntegerType(), True),
                    StructField("channels", IntegerType(), True),
                    StructField("sample_rate", IntegerType(), True),
                    StructField("duration_ms", IntegerType(), True),
                    StructField("codec", StringType(), True),
                ]
            ),
            False,
        ),
    ]
)

_TYPES = ("image", "audio", "video")


def fake_decode_enabled() -> bool:
    return os.environ.get("LIME_SPARK_FAKE_DECODE", "") == "1"


def _require_fake(fake: bool | None = None) -> None:
    """``fake=None`` defers to the env flag; ``fake=True`` is an
    explicit opt-in (used by pipelines built on the synthetic format)."""
    if fake is None:
        fake = fake_decode_enabled()
    if not fake:
        raise NotImplementedError(
            "Real media decode needs image/audio codec libraries that are "
            "not installed in this environment. Set LIME_SPARK_FAKE_DECODE=1 "
            "to run the deterministic fake decoder (synthetic LMM1 format)."
        )


# ---------------------------------------------------------------------------
# synthetic fixture
# ---------------------------------------------------------------------------


def _payload(media_id: int, nbytes: int) -> bytes:
    out = bytearray()
    counter = 0
    while len(out) < nbytes:
        out += hashlib.md5(f"{media_id}:{counter}".encode()).digest()
        counter += 1
    return bytes(out[:nbytes])


def _encode(media_id: int) -> tuple:
    media_type = _TYPES[media_id % 3]
    width = 16 + (media_id % 7) * 16
    height = 16 + (media_id % 5) * 16
    channels = 3
    sample_rate = 16000 if media_type == "audio" else 0
    duration_ms = (1 + media_id % 10) * 1000 if media_type in ("audio", "video") else 0
    header = MAGIC + struct.pack(
        "<BIIIII", _TYPES.index(media_type), width, height, channels, sample_rate, duration_ms
    )
    body_len = 256 + (media_id % 17) * 64
    content = header + _payload(media_id, body_len)
    return (
        media_id,
        media_type,
        bytearray(content),
        (width, height, channels, sample_rate, duration_ms, "lmm1"),
    )


def build_media_fixture(spark: SparkSession, n: int = 200, partitions: int = 8) -> DataFrame:
    """Deterministic synthetic media table (LMM1 container format).

    Generation is distributed (mapInPandas over spark.range) so the
    fixture builder itself demonstrates the write path a real ingest
    job would use — the driver never holds the payload bytes.
    """

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [_encode(int(i)) for i in pdf["id"]]
            yield pd.DataFrame(
                {
                    "media_id": [r[0] for r in rows],
                    "media_type": [r[1] for r in rows],
                    "content": [bytes(r[2]) for r in rows],
                    "meta": [
                        {
                            "width": r[3][0],
                            "height": r[3][1],
                            "channels": r[3][2],
                            "sample_rate": r[3][3],
                            "duration_ms": r[3][4],
                            "codec": r[3][5],
                        }
                        for r in rows
                    ],
                }
            )

    return spark.range(n).repartition(partitions).mapInPandas(gen, MEDIA_SCHEMA)


# ---------------------------------------------------------------------------
# decode / features / resize / frame sample
# ---------------------------------------------------------------------------

DECODED_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("media_type", StringType(), False),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("n_bytes", IntegerType(), False),
        StructField("checksum", StringType(), False),
    ]
)


def _fake_decode_one(media_id: int, content: bytes) -> dict:
    """FAKE decoder: parses the synthetic LMM1 header. A real build
    would dispatch to PIL / libav here."""
    assert content[:4] == MAGIC, "not an LMM1 payload"
    type_ix, width, height, _ch, _sr, _dur = struct.unpack("<BIIIII", content[4:25])
    return {
        "media_id": media_id,
        "media_type": _TYPES[type_ix],
        "width": width,
        "height": height,
        "n_bytes": len(content),
        "checksum": hashlib.md5(content).hexdigest(),
    }


def decode_media(df: DataFrame, fake: bool | None = None) -> DataFrame:
    """Decode payloads → typed rows. Arrow-batched; projects to
    (media_id, content) before crossing into Python."""
    _require_fake(fake)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                [_fake_decode_one(int(i), bytes(c)) for i, c in zip(pdf["media_id"], pdf["content"])]
            )

    return df.select("media_id", "content").mapInPandas(run, DECODED_SCHEMA)


FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("features", ArrayType(FloatType(), False), False),
    ]
)


def extract_features(df: DataFrame, dim: int = 16, fake: bool | None = None) -> DataFrame:
    """Deterministic hash-projection feature vector per payload (the
    fake stand-in for an embedding model forward pass)."""
    _require_fake(fake)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for content in pdf["content"]:
                h = hashlib.sha256(bytes(content)).digest()
                while len(h) < 4 * dim:
                    h += hashlib.sha256(h).digest()
                vals = struct.unpack(f"<{dim}I", h[: 4 * dim])
                feats.append([float(v % 10_000) / 10_000.0 for v in vals])
            yield pd.DataFrame({"media_id": pdf["media_id"], "features": feats})

    return df.select("media_id", "content").mapInPandas(run, FEATURES_SCHEMA)


def resize_images(df: DataFrame, width: int, height: int, fake: bool | None = None) -> DataFrame:
    """Resize image payloads (fake: rewrites the LMM1 header dims and
    re-chains the payload; real mode would re-encode pixels)."""
    _require_fake(fake)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_content, out_meta = [], []
            for content, meta in zip(pdf["content"], pdf["meta"]):
                raw = bytes(content)
                type_ix, _w, _h, ch, sr, dur = struct.unpack("<BIIIII", raw[4:25])
                header = MAGIC + struct.pack("<BIIIII", type_ix, width, height, ch, sr, dur)
                out_content.append(header + raw[25:])
                m = dict(meta)
                m["width"], m["height"] = width, height
                out_meta.append(m)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "content": out_content,
                    "meta": out_meta,
                }
            )

    return df.where(F.col("media_type") == "image").mapInPandas(run, MEDIA_SCHEMA)


FRAMES_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("frame_ix", IntegerType(), False),
        StructField("frame_ts_ms", IntegerType(), False),
        StructField("frame", BinaryType(), False),
    ]
)


def frame_sample(df: DataFrame, every_ms: int = 1000, fake: bool | None = None) -> DataFrame:
    """Sample frames from video payloads: 1→N row explosion inside the
    Arrow batch iterator (generator per batch — one video's frames
    never all sit in memory at once)."""
    _require_fake(fake)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for media_id, content in zip(pdf["media_id"], pdf["content"]):
                raw = bytes(content)
                _t, _w, _h, _c, _sr, duration_ms = struct.unpack("<BIIIII", raw[4:25])
                body = raw[25:]
                n_frames = max(1, duration_ms // every_ms)
                rows = []
                for ix in range(n_frames):
                    # fake frame: a deterministic 32-byte slice per timestamp
                    start = (ix * 31) % max(1, len(body) - 32)
                    rows.append(
                        {
                            "media_id": int(media_id),
                            "frame_ix": ix,
                            "frame_ts_ms": ix * every_ms,
                            "frame": body[start : start + 32],
                        }
                    )
                yield pd.DataFrame(rows)

    return (
        df.where(F.col("media_type") == "video")
        .select("media_id", "content")
        .mapInPandas(run, FRAMES_SCHEMA)
    )


# ---------------------------------------------------------------------------
# registered driver-contract query (rows-only: the corpus is the
# deterministic synthetic fixture, so there is no DuckDB table to
# replay it against)
# ---------------------------------------------------------------------------

from lime_etl_spark.plans.registry import register  # noqa: E402


@register(
    "mm_decode_stats",
    oracle=None,
    description="multimodal pipeline: fixture → fake-decode → per-type stats",
)
def mm_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end multimodal plumbing as a driver-checkable query:
    build the LMM1 fixture, decode (explicit fake — the synthetic
    corpus IS the fake format), aggregate per media type."""
    media = build_media_fixture(spark, n=300)
    decoded = decode_media(media, fake=True)
    return (
        decoded.groupBy("media_type")
        .agg(
            F.count(F.lit(1)).alias("n_media"),
            F.sum("n_bytes").cast("bigint").alias("total_bytes"),
            F.max("width").alias("max_width"),
            F.countDistinct("checksum").alias("n_distinct_payloads"),
        )
        .orderBy("media_type")
    )


@register(
    "mm_payload_integrity",
    oracle=None,
    description="binary-payload integrity audit: per-type counts, bytes, md5 uniqueness — no decode",
)
def mm_payload_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Integrity audit of raw binary payloads WITHOUT any decode: the
    check an ingest runs before spending decode compute — payload
    sizes vs declared metadata, md5 uniqueness, empty-payload count.
    Everything here is a built-in over the binary column (length/md5
    are JVM codegen on bytes), so at 100 TB this is a single scan with
    counters-only shuffle — Python never touches the payload."""
    media = build_media_fixture(spark, n=300)
    return (
        media.groupBy("media_type")
        .agg(
            F.count(F.lit(1)).alias("n_media"),
            F.sum(F.length("content")).cast("bigint").alias("payload_bytes"),
            F.sum(F.when(F.length("content") == 0, 1).otherwise(0))
            .cast("bigint")
            .alias("n_empty"),
            F.countDistinct(F.md5("content")).alias("n_distinct_md5"),
            F.min(F.length("content")).alias("min_bytes"),
            F.max(F.length("content")).alias("max_bytes"),
        )
        .orderBy("media_type")
    )


@register(
    "mm_preprocess_audit",
    oracle=None,
    description="preprocessing plumbing audit: resize + frame-sample legs with per-leg invariant stats",
)
def mm_preprocess_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The two preprocessing legs a vision/video training pipeline
    runs between ingest and feature extraction, audited in one frame:
    the resize leg (images re-headered to 64×64 — decode re-reads the
    REWRITTEN payload, proving the binary round-trip, not just the
    metadata) and the frame-sampling leg (videos exploded 1→N at 1
    fps inside the Arrow batch iterator). Per leg: item counts, total
    output bytes, and the invariant the fake preserves (uniform dims /
    frames-per-video floor).

    Scale: both legs are mapInPandas over the binary column —
    Arrow-batched, generator-per-batch so one video's frames never
    co-reside in memory; each leg filters its media type at the scan
    so the other types are never shipped to Python."""
    media = build_media_fixture(spark, n=300)
    resized = decode_media(resize_images(media, 64, 64, fake=True), fake=True)
    resize_leg = resized.agg(
        F.lit("resize_64x64").alias("leg"),
        F.count(F.lit(1)).cast("bigint").alias("n_items"),
        F.sum("n_bytes").cast("bigint").alias("total_bytes"),
        F.sum(
            F.when((F.col("width") == 64) & (F.col("height") == 64), 0).otherwise(1)
        )
        .cast("bigint")
        .alias("n_invariant_violations"),
    )
    frames = frame_sample(media, every_ms=1000, fake=True)
    per_video = frames.groupBy("media_id").agg(
        F.count(F.lit(1)).alias("n_frames"),
        F.sum(F.length("frame")).alias("frame_bytes"),
    )
    frame_leg = per_video.agg(
        F.lit("frame_sample_1fps").alias("leg"),
        F.count(F.lit(1)).cast("bigint").alias("n_items"),
        F.sum("frame_bytes").cast("bigint").alias("total_bytes"),
        F.sum(F.when(F.col("n_frames") >= 1, 0).otherwise(1))
        .cast("bigint")
        .alias("n_invariant_violations"),
    )
    return resize_leg.unionByName(frame_leg).orderBy("leg")


# ---------------------------------------------------------------------------
# perceptual near-dup (average-hash + hamming banding)
# ---------------------------------------------------------------------------

AHASH_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("ahash", LongType(), False),
    ]
)

AHASH_GRID = 64  # 8×8 sample grid → 64-bit signature
AHASH_HAMMING_TAU = 6


def media_ahash(df: DataFrame, fake: bool | None = None) -> DataFrame:
    """64-bit average-hash per payload — the perceptual-dedup
    signature. Fake mode samples 64 evenly-spaced body bytes as the
    "pixel grid" and thresholds against their mean, which preserves
    the property that matters: payloads differing in a few bytes get
    signatures differing in a few BITS (a cryptographic hash would
    scatter them). A real build would decode pixels, resize to 8×8
    grayscale and threshold — same signature contract.

    Arrow-batched like every payload stage; output is 8 bytes/item,
    so the downstream dedup join never touches the binary again.
    """
    _require_fake(fake)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, sigs = [], []
            for media_id, content in zip(pdf["media_id"], pdf["content"]):
                body = bytes(content)[25:]  # skip the LMM1 header
                if not body:
                    body = b"\x00"
                cells = [
                    body[(i * len(body)) // AHASH_GRID] for i in range(AHASH_GRID)
                ]
                mean = sum(cells) / AHASH_GRID
                sig = 0
                for i, c in enumerate(cells):
                    if c > mean:
                        sig |= 1 << i
                # store as signed 64-bit
                if sig >= 1 << 63:
                    sig -= 1 << 64
                ids.append(int(media_id))
                sigs.append(sig)
            yield pd.DataFrame({"media_id": ids, "ahash": sigs})

    return df.select("media_id", "content").mapInPandas(run, AHASH_SCHEMA)


def ahash_near_dup_pairs(
    sigs: DataFrame, tau: int = AHASH_HAMMING_TAU
) -> DataFrame:
    """Candidate pairs by 4×16-bit hamming banding (two signatures
    within hamming distance ≤ 15 MUST agree on at least one band when
    tau < 16/... — with tau=6 < 4 bands, pigeonhole guarantees a
    shared band), verified by exact popcount on the XOR. All JVM-side:
    band split is shift/mask arithmetic, verify is bit_count — the
    Python stage ended at signature extraction."""
    bands = sigs.select(
        "media_id",
        "ahash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_ix"),
                        F.shiftright("ahash", 16 * b)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("band_val"),
                    )
                    for b in range(4)
                ]
            )
        ).alias("band"),
    ).select("media_id", "ahash", "band.band_ix", "band.band_val")
    a, b = bands.alias("a"), bands.alias("b")
    cands = (
        a.join(
            b,
            (F.col("a.band_ix") == F.col("b.band_ix"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.media_id") < F.col("b.media_id")),
        )
        .select(
            F.col("a.media_id").alias("media_a"),
            F.col("a.ahash").alias("hash_a"),
            F.col("b.media_id").alias("media_b"),
            F.col("b.ahash").alias("hash_b"),
        )
        .distinct()
    )
    hamming = F.bit_count(F.col("hash_a").bitwiseXOR(F.col("hash_b")))
    return cands.select(
        "media_a", "media_b", hamming.cast("int").alias("hamming")
    ).where(F.col("hamming") <= tau)


def _perturbed_media_corpus(spark: SparkSession, n: int = 200) -> DataFrame:
    """Fixture ∪ lightly-perturbed copies of every 10th payload (3
    flipped body bytes — a re-encode/metadata-tweak stand-in)."""
    base = build_media_fixture(spark, n=n)

    def perturb(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            keep = pdf[pdf["media_id"] % 10 == 0].copy()
            out = []
            for content in keep["content"]:
                raw = bytearray(bytes(content))
                for off in (30, 60, 90):
                    if off < len(raw):
                        raw[off] ^= 0xFF
                out.append(bytes(raw))
            keep["content"] = out
            keep["media_id"] = keep["media_id"] + 1_000_000
            yield keep

    copies = base.mapInPandas(perturb, MEDIA_SCHEMA)
    return base.unionByName(copies)


@register(
    "mm_image_near_dup",
    oracle=None,  # signature extraction is the (fake-gated) Python stage;
    # pytest proves planted perturbed copies are found and distinct
    # payloads are not
    description="perceptual near-dup: average-hash signatures + hamming-band candidates",
)
def mm_image_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate detection for binary media — the image twin of
    MinHash text dedup: Python touches each payload once to emit a
    64-bit average-hash; banding, candidate join and popcount verify
    run JVM-side on 8-byte signatures. At 100 TB the signature table
    is ~1/10⁶ the payload bytes, so the dedup join costs what text
    LSH costs regardless of media size.
    """
    corpus = _perturbed_media_corpus(spark, n=200)
    sigs = media_ahash(corpus, fake=True).persist()
    return ahash_near_dup_pairs(sigs).orderBy("media_a", "media_b")


# ---------------------------------------------------------------------------
# audio energy windows
# ---------------------------------------------------------------------------

ENERGY_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("window_ix", IntegerType(), False),
        StructField("energy", FloatType(), False),
    ]
)


def audio_energy_windows(
    df: DataFrame, window_ms: int = 500, fake: bool | None = None
) -> DataFrame:
    """Per-window RMS-style energy profile for audio payloads — the
    silence-trim / voice-activity precursor every audio pipeline runs
    before feature extraction. 1→N window explosion happens inside
    the Arrow batch generator (same discipline as frame_sample: one
    clip's windows never materialize as a list-of-all).

    FAKE path: energy per window is a deterministic byte-mean over
    the payload slice covering that window (a real build reads PCM
    via libav/soundfile and computes true RMS); window COUNT comes
    from the header duration, so the Spark-side shape — schema,
    explosion factor, partitioning — is exactly what the real decode
    produces.
    """
    _require_fake(fake)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for media_id, content in zip(pdf["media_id"], pdf["content"]):
                raw = bytes(content)
                _ti, _w, _h, _ch, _sr, dur = struct.unpack("<BIIIII", raw[4:25])
                payload = raw[25:]
                n_windows = max(1, (dur + window_ms - 1) // window_ms)
                step = max(1, len(payload) // n_windows)
                rows = []
                for ix in range(n_windows):
                    sl = payload[ix * step : (ix + 1) * step] or b"\x00"
                    rows.append(
                        {
                            "media_id": int(media_id),
                            "window_ix": ix,
                            "energy": float(sum(sl) / len(sl)) / 255.0,
                        }
                    )
                yield pd.DataFrame(rows)

    return (
        df.where(F.col("media_type") == "audio")
        .select("media_id", "content")
        .mapInPandas(run, ENERGY_SCHEMA)
    )


@register(
    "mm_audio_energy",
    oracle=None,
    description="audio energy-window profile: fixture → per-window fake RMS → per-clip silence/peak stats",
)
def mm_audio_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio leg of the multimodal family: window-energy profile per
    clip rolled up to (n_windows, mean/peak energy, silent-window
    count) — the triage table that decides which clips are worth
    real decode compute. Windows explode inside Arrow batches;
    the rollup is a counters-only groupBy on media_id."""
    media = build_media_fixture(spark, n=300)
    en = audio_energy_windows(media, fake=True)
    return (
        en.groupBy("media_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_windows"),
            F.avg("energy").alias("mean_energy"),
            F.max("energy").alias("peak_energy"),
            F.sum(F.when(F.col("energy") < 0.05, 1).otherwise(0))
            .cast("bigint")
            .alias("n_silent_windows"),
        )
        .orderBy("media_id")
    )


def decode_media_arrow(df: DataFrame, fake: bool | None = None) -> DataFrame:
    """``decode_media`` on the LOWER-overhead interop surface:
    ``mapInArrow`` hands the worker raw ``pyarrow.RecordBatch``es —
    no Arrow→pandas→Arrow conversion, no pandas object boxing of the
    binary payloads. For MB-scale media rows that conversion is real
    CPU and a full extra copy of every payload, so the Arrow-native
    form is the one a production decode stage wants; pytest proves it
    row-identical to the pandas form. Same fake-decode gate."""
    import pyarrow as pa

    _require_fake(fake)

    def run(batches):
        for batch in batches:
            ids = batch.column("media_id").to_pylist()
            payloads = batch.column("content").to_pylist()
            rows = [_fake_decode_one(int(i), bytes(c)) for i, c in zip(ids, payloads)]
            yield pa.RecordBatch.from_pylist(
                rows,
                schema=pa.schema(
                    [
                        ("media_id", pa.int64()),
                        ("media_type", pa.string()),
                        ("width", pa.int32()),
                        ("height", pa.int32()),
                        ("n_bytes", pa.int32()),
                        ("checksum", pa.string()),
                    ]
                ),
            )

    return df.select("media_id", "content").mapInArrow(run, DECODED_SCHEMA)
