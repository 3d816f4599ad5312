"""Multimodal tests: REAL container decode (PPM/WAV/Y4M on numpy +
stdlib `wave`), schemas, determinism, 1→N explosion, and the codec
gate for compressed formats this environment cannot decode."""

from __future__ import annotations

import io
import wave

import numpy as np
import pytest

from lime_etl_spark.operators import multimodal as mm


@pytest.fixture(scope="module")
def media(spark):
    df = mm.build_media_fixture(spark, n=60, partitions=4)
    df.cache().count()
    return df


def test_fixture_schema_and_determinism(spark, media):
    assert media.schema == mm.MEDIA_SCHEMA
    assert media.count() == 60
    again = {r["media_id"]: bytes(r["content"]) for r in mm.build_media_fixture(spark, 60).collect()}
    first = {r["media_id"]: bytes(r["content"]) for r in media.collect()}
    assert first == again
    types = {r["media_type"] for r in media.select("media_type").distinct().collect()}
    assert types == {"image", "audio", "video"}


def test_fixture_payloads_are_real_formats(media):
    """Every payload must carry a genuine container magic — PPM (P6),
    RIFF/WAVE, or YUV4MPEG2 — and stdlib/3rd-party parsers must accept
    the audio leg without touching our decoder."""
    rows = media.collect()
    for r in rows:
        raw = bytes(r["content"])
        if r["media_type"] == "image":
            assert raw[:2] == b"P6"
        elif r["media_type"] == "audio":
            assert raw[:4] == b"RIFF" and raw[8:12] == b"WAVE"
            with wave.open(io.BytesIO(raw), "rb") as w:  # stdlib accepts it
                assert w.getframerate() == mm.AUDIO_RATE
                assert w.getnchannels() == 1 and w.getsampwidth() == 2
        else:
            assert raw[:9] == b"YUV4MPEG2"


def test_decode_media_derives_dims_from_bytes(media):
    decoded = mm.decode_media(media)
    assert decoded.schema == mm.DECODED_SCHEMA
    rows = {r["media_id"]: r for r in decoded.collect()}
    assert len(rows) == 60
    src = {r["media_id"]: r for r in media.collect()}
    for mid, r in rows.items():
        meta = src[mid]["meta"]
        assert r["media_type"] == src[mid]["media_type"]
        assert r["n_bytes"] == len(bytes(src[mid]["content"]))
        if r["media_type"] == "image":
            assert (r["width"], r["height"]) == (meta["width"], meta["height"])
            assert r["sample_rate"] is None
        elif r["media_type"] == "audio":
            assert r["sample_rate"] == meta["sample_rate"]
            assert r["duration_ms"] == meta["duration_ms"]
            assert r["width"] is None
        else:
            assert (r["width"], r["height"]) == (meta["width"], meta["height"])
            assert r["duration_ms"] == meta["duration_ms"]
            assert r["n_frames"] == mm.VIDEO_FPS * meta["duration_ms"] // 1000


def test_extract_features_deterministic_and_content_derived(spark, media):
    f1 = {r["media_id"]: r["features"] for r in mm.extract_features(media, dim=8).collect()}
    f2 = {r["media_id"]: r["features"] for r in mm.extract_features(media, dim=8).collect()}
    assert f1 == f2
    assert all(len(v) == 8 for v in f1.values())
    assert all(0.0 <= x < 1.0 for v in f1.values() for x in v)
    # content-derived: a one-pixel change must move at least one segment mean
    one = media.where("media_type = 'image'").limit(1).collect()[0]
    raw = bytearray(bytes(one["content"]))
    raw[mm._data_offset(bytes(raw))] ^= 0xFF
    tweaked = spark.createDataFrame(
        [(one["media_id"], bytes(raw))], "media_id long, content binary"
    )
    ft = mm.extract_features(tweaked, dim=8).collect()[0]["features"]
    assert ft != f1[one["media_id"]]


def test_resize_images_resamples_pixels(spark, media):
    resized = mm.resize_images(media, 32, 32)
    rows = resized.collect()
    n_images = media.where("media_type = 'image'").count()
    assert len(rows) == n_images > 0
    src = {r["media_id"]: bytes(r["content"]) for r in media.where("media_type='image'").collect()}
    for r in rows:
        assert r["meta"]["width"] == 32 and r["meta"]["height"] == 32
        w, h, ch, px = mm._parse_netpbm(bytes(r["content"]))
        assert (w, h, ch) == (32, 32, 3)
        # nearest-neighbor: every output pixel exists in the source image
        w0, h0, _c0, px0 = mm._parse_netpbm(src[r["media_id"]])
        rows_ix = (np.arange(32) * h0) // 32
        cols_ix = (np.arange(32) * w0) // 32
        assert (px == px0[rows_ix][:, cols_ix]).all()
    # pixel rewrite round-trips through the real decoder
    redecoded = mm.decode_media(resized).collect()
    assert all(r["width"] == 32 and r["height"] == 32 for r in redecoded)


def test_frame_sample_explodes_by_duration(media):
    frames = mm.frame_sample(media, every_ms=1000)
    per_media = {
        r["media_id"]: r["n"]
        for r in frames.groupBy("media_id").count().withColumnRenamed("count", "n").collect()
    }
    videos = {r["media_id"]: r["meta"] for r in media.where("media_type = 'video'").collect()}
    assert set(per_media) == set(videos)
    for mid, meta in videos.items():
        assert per_media[mid] == max(1, meta["duration_ms"] // 1000)
    # each sampled frame is a decodable P5 luma image matching the video dims
    one = frames.where("media_id = 2 and frame_ix = 0").collect()[0]
    w, h, ch, px = mm._parse_netpbm(bytes(one["frame"]))
    assert (w, h, ch) == (videos[2]["width"], videos[2]["height"], 1)
    # ...and its pixels are exactly the Y plane of the source frame 0
    src_raw = [bytes(r["content"]) for r in media.where("media_id = 2").collect()][0]
    _w, _h, planes = mm._y4m_frame(src_raw, 0)
    assert px[:, :, 0].tobytes() == planes[0].tobytes()


def test_av_codec_formats_metadata_parse_and_sample_gate(spark):
    """MP3/MP4/Ogg parse to header metadata only (r6 verdict #3):
    decode_media yields real duration/rate/dims with
    sample_decode=False, a CORRUPT container still fails loudly, the
    pixel/PCM stages raise the documented gate, and truly unknown
    containers still gate in _sniff (Matroska parses since r8). (PNG
    left the image gate in r5a,
    JPEG/GIF/BMP in r5b.)"""
    from lime_etl_spark.operators import av_containers as av

    good = [
        (1, bytearray(av.encode_mp3(1, 13))),
        (2, bytearray(av.encode_mp4(2, 1500, 336, 240, 512))),
        (3, bytearray(av.encode_ogg(3, 2500, 600))),
    ]
    df = spark.createDataFrame(good, "media_id long, content binary")
    rows = {r.media_id: r for r in mm.decode_media(df).collect()}
    assert rows[1].codec == "mp3" and rows[1].duration_ms == 13 * 36
    assert rows[1].sample_rate == 32000 and rows[1].n_frames == 13
    assert rows[2].codec == "mp4v" and rows[2].duration_ms == 1500
    assert (rows[2].width, rows[2].height) == (336, 240)
    assert rows[3].codec == "vorbis" and rows[3].duration_ms == 2500
    assert rows[3].sample_rate == 8000
    assert all(not r.sample_decode for r in rows.values())
    # corrupt MP4 (zero-size box after ftyp) fails loudly — garbage
    # structure must never yield garbage metadata
    bad = b"\x00\x00\x00\x18ftypmp42" + b"\x00" * 64
    dfbad = spark.createDataFrame([(9, bytearray(bad))], "media_id long, content binary")
    with pytest.raises(Exception, match="corrupt box size"):
        mm.decode_media(dfbad).collect()
    # flipping one payload byte breaks the Ogg page CRC — loud
    flipped = bytearray(av.encode_ogg(3, 2500, 600))
    flipped[100] ^= 0xFF
    dfcrc = spark.createDataFrame([(8, flipped)], "media_id long, content binary")
    with pytest.raises(Exception, match="CRC mismatch"):
        mm.decode_media(dfcrc).collect()
    # sample-touching stages keep the loud gate for metadata-only kinds
    with pytest.raises(Exception, match="sample decode for mp3 is gated"):
        mm.extract_features(df.where("media_id = 1")).collect()
    # Matroska now routes to the EBML walk (r8); truly unknown magics
    # still raise the documented codec gate
    assert mm._sniff(b"\x1aE\xdf\xa3" + b"\x00" * 16) == "mkv"
    with pytest.raises(NotImplementedError, match="no codec"):
        mm._sniff(b"\x00\x01unknown-container" + b"\x00" * 16)
    assert mm._sniff(b"\x89PNG\r\n\x1a\n" + b"\x00" * 16) == "png"
    assert mm._sniff(b"\xff\xd8\xff\xe0" + b"\x00" * 16) == "jpeg"
    assert mm._sniff(b"GIF89a" + b"\x00" * 16) == "gif"
    assert mm._sniff(b"BM" + b"\x00" * 16) == "bmp"
    assert mm._sniff(b"\x00\x00\x00\x18ftypisom") == "mp4"
    assert mm._sniff(b"OggS" + b"\x00" * 16) == "ogg"
    assert mm._sniff(b"\xff\xfb\x98\xc4" + b"\x00" * 16) == "mp3"


def test_av_container_roundtrips_and_formulas():
    """Encoder→parser round trips pin the byte-layout formulas the
    mm_decode_stats oracle replays arithmetically."""
    from lime_etl_spark.operators import av_containers as av

    raw = av.encode_mp3(7, 13)
    assert len(raw) == 13 * 576
    assert av.mp3_info(raw) == {
        "codec": "mp3", "sample_rate": 32000, "n_frames": 13, "duration_ms": 468,
    }
    raw = av.encode_mp4(5, 1500, 336, 240, 512)
    assert len(raw) == av.mp4_overhead() + 512
    assert av.mp4_info(raw) == {
        "codec": "mp4v", "duration_ms": 1500, "width": 336, "height": 240,
    }
    raw = av.encode_ogg(9, 2500, 600)
    assert len(raw) == 27 + 1 + 30 + 27 + (600 // 255 + 1) + 600
    assert av.ogg_info(raw) == {
        "codec": "vorbis", "sample_rate": 8000, "channels": 1,
        "n_pages": 2, "duration_ms": 2500,
    }
    # parsers validate structure, not just magic bytes
    with pytest.raises(ValueError, match="sync lost"):
        av.mp3_info(raw[:100])
    with pytest.raises(ValueError, match="truncated MP3"):
        av.mp3_info(av.encode_mp3(7, 2)[:-10])
    # real-world MP3s carry an ID3v2 tag before the first frame: the
    # parser must skip it (synchsafe size), not call the file corrupt
    tag_body = b"TIT2" + b"\x00" * 96  # 100-byte tag body
    id3 = b"ID3\x04\x00\x00" + bytes([0, 0, 100 >> 7, 100 & 0x7F]) + tag_body
    tagged = id3 + av.encode_mp3(7, 13)
    info = av.mp3_info(tagged)
    assert info["n_frames"] == 13 and info["duration_ms"] == 13 * 36


def test_mm_decode_stats_gate_rate_is_measured(spark, sf_dir):
    from lime_etl_spark.plans.registry import get

    rows = {r.codec: r for r in get("mm_decode_stats").builder(spark, sf_dir).collect()}
    assert set(rows) == {
        "ppm", "pcm_s16le", "y4m", "mp3", "mp4v", "vorbis", "flac", "v_vp9",
    }
    # flac gate-rate 0.0 is the r7-verdict #1 'done' condition: the
    # compressed container whose SAMPLE decode is fully available
    for codec in ("ppm", "pcm_s16le", "y4m", "flac"):
        assert rows[codec].n_gated == 0 and rows[codec].gate_rate == 0.0
    for codec in ("mp3", "mp4v", "vorbis", "v_vp9"):
        assert rows[codec].n_gated == rows[codec].n_media
        assert rows[codec].gate_rate == 1.0
        assert rows[codec].max_duration_ms > 0


def test_audio_energy_windows_true_rms(spark, media):
    """Energy must equal numpy RMS of the wave-decoded samples, and the
    fixture's amplitude envelope must produce genuinely silent windows."""
    audio = media.where("media_type = 'audio'")
    en = {(r["media_id"], r["window_ix"]): r["energy"] for r in mm.audio_energy_windows(audio, window_ms=500).collect()}
    raws = {r["media_id"]: bytes(r["content"]) for r in audio.collect()}
    n_silent = 0
    for mid, raw in raws.items():
        rate, _dur, samples = mm._parse_wav(raw)
        spw = rate * 500 // 1000
        for ix in range(-(-len(samples) // spw)):
            sl = samples[ix * spw : (ix + 1) * spw].astype(np.float64)
            want = float(np.sqrt((sl * sl).mean())) / 32768.0
            assert en[(mid, ix)] == pytest.approx(want, abs=1e-6)
            n_silent += want < 0.05
    assert n_silent > 0, "fixture envelope must zero some windows"


def test_payload_integrity_audit(spark, sf_dir):
    """The no-decode integrity audit: every payload non-empty, unique,
    and counted — computed entirely JVM-side over the binary column."""
    from lime_etl_spark.plans.registry import get

    rows = get("mm_payload_integrity").builder(spark, sf_dir).collect()
    assert {r["media_type"] for r in rows} == {"audio", "image", "video"}
    assert sum(r["n_media"] for r in rows) == 300
    for r in rows:
        assert r["n_empty"] == 0
        assert r["n_distinct_md5"] == r["n_media"]  # synthetic payloads unique
        assert 0 < r["min_bytes"] <= r["max_bytes"]


def test_payload_integrity_matches_duckdb_over_persisted_fixture(spark, sf_dir):
    """r5 verdict #6: the audit is now a hash-matched oracle query —
    DuckDB replays the identical aggregate over the SAME persisted
    fixture parquet the Spark leg reads."""
    import duckdb

    from lime_etl_spark.plans.registry import get
    from tests.oracle import compare_frames

    spec = get("mm_payload_integrity")
    assert spec.oracle is not None
    sdf = spec.builder(spark, sf_dir).toPandas()
    odf = duckdb.connect().execute(spec.oracle).fetchdf()
    assert not compare_frames(sdf, odf)


def test_audio_energy_matches_pcm_reconstruction_oracle(spark, sf_dir):
    """mm_audio_energy is hash-matched since r6: DuckDB reconstructs
    every PCM sample from the fixture's md5-chain formula and must
    reach the same exact int64 energies the Spark side computes from
    the REAL WAV bytes."""
    import duckdb

    from lime_etl_spark.plans.registry import get
    from tests.oracle import compare_frames

    spec = get("mm_audio_energy")
    assert spec.oracle is not None
    sdf = spec.builder(spark, sf_dir).toPandas()
    odf = duckdb.connect().execute(spec.oracle).fetchdf()
    assert not compare_frames(sdf, odf)
    # silence is genuinely exercised: some but not all windows silent
    assert sdf["n_silent_windows"].sum() > 0
    assert sdf["n_silent_windows"].sum() < sdf["n_windows"].sum()


def test_image_near_dup_matches_reconstruction_oracle(spark, sf_dir):
    """mm_image_near_dup is hash-matched since r6: DuckDB rebuilds
    every sampled aHash cell (incl. the perturbed twins' flipped
    bytes), the integer-threshold signatures, the band join and the
    popcount from the md5-chain formulas."""
    import duckdb

    from lime_etl_spark.plans.registry import get
    from tests.oracle import compare_frames

    spec = get("mm_image_near_dup")
    assert spec.oracle is not None
    sdf = spec.builder(spark, sf_dir).toPandas()
    assert len(sdf) > 0
    odf = duckdb.connect().execute(spec.oracle).fetchdf()
    assert not compare_frames(sdf, odf)


def test_decode_stats_matches_formula_oracle(spark, sf_dir):
    """mm_decode_stats is hash-matched since r6: DuckDB recomputes the
    per-type stats ARITHMETICALLY from the fixture's media_id→geometry
    formulas; the Spark side must recover identical numbers from the
    real container BYTES — a decoder or writer bug on either side
    breaks this."""
    import duckdb

    from lime_etl_spark.plans.registry import get
    from tests.oracle import compare_frames

    spec = get("mm_decode_stats")
    assert spec.oracle is not None
    sdf = spec.builder(spark, sf_dir).toPandas()
    odf = duckdb.connect().execute(spec.oracle).fetchdf()
    assert not compare_frames(sdf, odf)


def test_preprocess_audit_invariants(spark, sf_dir):
    """Both preprocessing legs present, non-empty, and invariant-clean
    (uniform resize dims; >=1 frame per video)."""
    from lime_etl_spark.plans.registry import get

    rows = {r["leg"]: r for r in get("mm_preprocess_audit").builder(spark, sf_dir).collect()}
    assert set(rows) == {"resize_64x64", "frame_sample_1fps"}
    for r in rows.values():
        assert r["n_items"] > 0
        assert r["total_bytes"] > 0
        assert r["n_invariant_violations"] == 0


def test_arrow_decode_equals_pandas_decode(spark):
    """mapInArrow decode must emit exactly the rows the mapInPandas
    decode does — the surfaces differ only in interop overhead."""
    media = mm.build_media_fixture(spark, n=120)
    a = {r.media_id: r.asDict() for r in mm.decode_media(media).collect()}
    b = {r.media_id: r.asDict() for r in mm.decode_media_arrow(media).collect()}
    assert a == b


def _cross_container_df(spark):
    """One deterministic 24x32 pixel array shipped through FIVE image
    containers (+ a 64-color quantized copy for GIF's palette bound)."""
    from pyspark.sql import functions as F  # noqa: F401

    from lime_etl_spark.operators.bmp_codec import encode_bmp
    from lime_etl_spark.operators.gif_codec import encode_gif
    from lime_etl_spark.operators.jpeg_codec import encode_jpeg
    from lime_etl_spark.operators.png_codec import encode_png

    px = np.frombuffer(mm._payload(4242, 24 * 32 * 3), dtype=np.uint8).reshape(
        24, 32, 3
    )
    quant = (px // 128) * 128 + 64  # 2 levels/channel = 8 colors → GIF-safe
    payloads = {
        1: (b"P6\n32 24\n255\n" + px.tobytes(), "lossless"),
        2: (encode_png(px), "lossless"),
        3: (encode_bmp(px), "lossless"),
        4: (encode_jpeg(px, quality=92), "lossy"),
        5: (encode_gif(quant), "quantized"),
        6: (b"P6\n32 24\n255\n" + quant.tobytes(), "quantized"),
    }
    df = spark.createDataFrame(
        [(k, bytearray(v[0])) for k, (v) in payloads.items()],
        "media_id long, content binary",
    )
    return df, payloads, px, quant


def test_decode_media_cross_container_dims(spark):
    df, payloads, _px, _q = _cross_container_df(spark)
    rows = {r["media_id"]: r for r in mm.decode_media(df).collect()}
    assert len(rows) == len(payloads)
    for mid, r in rows.items():
        assert r["media_type"] == "image"
        assert (r["width"], r["height"]) == (32, 24), mid


def test_lossless_containers_same_features_and_ahash(spark):
    """PPM, PNG and BMP of the SAME pixels must produce IDENTICAL
    features and a-hashes; GIF (quantized copy) must match the PPM of
    the same quantized pixels; JPEG must land within quantization
    distance of the lossless feature vector."""
    df, _payloads, _px, _q = _cross_container_df(spark)
    feats = {
        r["media_id"]: r["features"]
        for r in mm.extract_features(df, dim=8).collect()
    }
    assert feats[1] == feats[2] == feats[3]
    assert feats[5] == feats[6]
    lossless = np.array(feats[1])
    jpeg = np.array(feats[4])
    assert np.abs(lossless - jpeg).max() < 0.02
    hashes = {r["media_id"]: r["ahash"] for r in mm.media_ahash(df).collect()}
    assert hashes[1] == hashes[2] == hashes[3]
    assert hashes[5] == hashes[6]


def test_resize_reemits_source_container(spark):
    from pyspark.sql import functions as F

    from lime_etl_spark.operators.bmp_codec import decode_bmp
    from lime_etl_spark.operators.gif_codec import decode_gif
    from lime_etl_spark.operators.jpeg_codec import decode_jpeg

    df, payloads, _px, _q = _cross_container_df(spark)
    wide = df.select(
        "media_id",
        F.lit("image").alias("media_type"),
        "content",
        F.struct(
            F.lit(32).alias("width"),
            F.lit(24).alias("height"),
            F.lit(3).alias("channels"),
            F.lit(None).cast("int").alias("sample_rate"),
            F.lit(None).cast("int").alias("duration_ms"),
            F.lit("mixed").alias("codec"),
        ).alias("meta"),
    )
    out = {r["media_id"]: bytes(r["content"]) for r in mm.resize_images(wide, 8, 8).collect()}
    assert out[1][:2] == b"P6"
    assert out[2][:8] == b"\x89PNG\r\n\x1a\n"
    assert out[3][:2] == b"BM"
    assert out[4][:2] == b"\xff\xd8"
    assert out[5][:6] in (b"GIF87a", b"GIF89a")
    # and each re-emitted payload decodes to 8x8
    assert decode_bmp(out[3])[:2] == (8, 8)
    assert decode_jpeg(out[4])[:2] == (8, 8)
    w, h, frames = decode_gif(out[5])
    assert (w, h, len(frames)) == (8, 8, 1)


def test_resize_animated_gif_keeps_all_frames(spark):
    """resize_images on an animated GIF must resize EVERY frame and
    preserve per-frame delays, not silently emit a single-frame GIF
    (r5 ADVICE finding)."""
    from pyspark.sql import functions as F

    from lime_etl_spark.operators.gif_codec import decode_gif, encode_gif

    rng = np.random.default_rng(21)
    pal = rng.integers(0, 256, (8, 3), dtype=np.uint8)
    src_frames = [(d, pal[rng.integers(0, 8, (16, 20))]) for d in (30, 70, 110)]
    df = spark.createDataFrame(
        [(7, bytearray(encode_gif(src_frames)))], "media_id long, content binary"
    ).select(
        "media_id",
        F.lit("image").alias("media_type"),
        "content",
        F.struct(
            F.lit(20).alias("width"),
            F.lit(16).alias("height"),
            F.lit(3).alias("channels"),
            F.lit(None).cast("int").alias("sample_rate"),
            F.lit(None).cast("int").alias("duration_ms"),
            F.lit("gif").alias("codec"),
        ).alias("meta"),
    )
    out = bytes(mm.resize_images(df, 10, 8).collect()[0]["content"])
    w, h, frames = decode_gif(out)
    assert (w, h, len(frames)) == (10, 8, 3)
    assert [d for d, _ in frames] == [30, 70, 110]
    # nearest-neighbor per frame against the SOURCE's composited frames
    _, _, src_composited = decode_gif(encode_gif(src_frames))
    rows_ix = (np.arange(8) * 16) // 8
    cols_ix = (np.arange(10) * 20) // 10
    for (_, got), (_, src) in zip(frames, src_composited):
        assert (got == src[rows_ix][:, cols_ix]).all()


def test_animated_gif_reports_frames_and_duration(spark):
    from lime_etl_spark.operators.gif_codec import encode_gif

    rng = np.random.default_rng(12)
    pal = rng.integers(0, 256, (16, 3), dtype=np.uint8)
    frames = [(50, pal[rng.integers(0, 16, (10, 12))]) for _ in range(4)]
    df = spark.createDataFrame(
        [(9, bytearray(encode_gif(frames)))], "media_id long, content binary"
    )
    r = mm.decode_media(df).collect()[0]
    assert r["media_type"] == "image"
    assert (r["width"], r["height"]) == (12, 10)
    assert r["n_frames"] == 4
    assert r["duration_ms"] == 200


def test_mm_codec_matrix_invariants(spark, sf_dir):
    from lime_etl_spark.plans.registry import get

    rows = {r["codec"]: r for r in get("mm_codec_matrix").builder(spark, sf_dir).collect()}
    assert set(rows) == {"netpbm", "png", "bmp", "jpeg", "gif"}
    for codec, r in rows.items():
        assert r["n_images"] == 96
        assert r["n_dim_mismatch"] == 0, codec
        assert r["total_bytes"] > 0
    # lossless containers read back bit-identical features & hashes
    for codec in ("netpbm", "png", "bmp", "gif"):
        assert rows[codec]["max_feat_delta"] == 0.0, codec
        assert rows[codec]["n_ahash_mismatch"] == 0, codec
    # JPEG pays bounded quantization error, not garbage
    assert 0.0 < rows["jpeg"]["max_feat_delta"] < 0.05
    # PNG/GIF beat raw PPM on the quantized fixture (entropy coding works)
    assert rows["png"]["total_bytes"] < rows["netpbm"]["total_bytes"]
    assert rows["gif"]["total_bytes"] < rows["netpbm"]["total_bytes"]


def test_mkv_ebml_parse_and_gates():
    """Matroska metadata-first (r8): strict EBML walk recovers
    dims/duration/codec from real VINT-coded structure; structural
    corruption and non-Matroska DocTypes fail loudly; samples gate."""
    import pytest as _pytest

    from lime_etl_spark.operators import av_containers as av
    from lime_etl_spark.operators.multimodal import _decode_one, _gray_series, _sniff

    raw = av.encode_mkv(42, 4500, 384, 240, 311)
    assert _sniff(raw) == "mkv"
    info = av.mkv_info(raw)
    assert info["duration_ms"] == 4500 and (info["width"], info["height"]) == (384, 240)
    assert info["codec"] == "v_vp9" and info["doctype"] == "matroska"

    out = _decode_one(42, raw)
    assert out["media_type"] == "video" and out["sample_decode"] is False
    assert out["width"] == 384 and out["duration_ms"] == 4500

    with _pytest.raises(ValueError, match="overruns|tile"):
        av.mkv_info(raw[:-5])
    with _pytest.raises(ValueError, match="EBML"):
        av.mkv_info(b"\x1a\x45\xdf\xa4" + raw[4:])
    with _pytest.raises(NotImplementedError, match="DocType"):
        av.mkv_info(raw.replace(b"matroska", b"matroskb"))
    with _pytest.raises(NotImplementedError, match="gated"):
        _gray_series(raw)


def test_mkv_vint_roundtrip():
    from lime_etl_spark.operators import av_containers as av

    for n in (0, 1, 126, 127, 128, 16382, 16383, 16384, (1 << 21) - 3, 1 << 30):
        enc = av._vint(n)
        got, pos = av._read_vint(enc, 0)
        assert got == n and pos == len(enc)
    # RFC 8794 all-ones "unknown size" VINT is a loud gate, not a size
    for unknown in (b"\xff", b"\x7f\xff", b"\x1f\xff\xff\xff"):
        with pytest.raises(NotImplementedError, match="unknown-size"):
            av._read_vint(unknown, 0)


def test_audio_near_dup_finds_planted_twins_zero_false_pairs(spark, sf_dir):
    """r8 verdict #6: the re-encoded muted-window twins (WAV and FLAC
    — CRCs regenerated, decode verified) must ALL be found at small
    hamming, and no unrelated pair may survive the popcount verify."""
    from lime_etl_spark.operators.multimodal import (
        AUDIO_TWIN_BASE,
        FLAC_ID_BASE,
        FLAC_FIXTURE_N,
        mm_audio_near_dup,
    )

    rows = mm_audio_near_dup(spark, sf_dir).collect()
    want = {
        (i, i + AUDIO_TWIN_BASE) for i in range(300) if i % 3 == 1 and i % 30 == 1
    } | {
        (i, i + AUDIO_TWIN_BASE)
        for i in range(FLAC_ID_BASE, FLAC_ID_BASE + FLAC_FIXTURE_N)
        if i % 10 == 0
    }
    got = {(r["media_a"], r["media_b"]) for r in rows}
    assert got == want, (sorted(got - want), sorted(want - got))
    assert all(r["hamming"] <= 2 for r in rows)  # one muted window → ≤2 delta bits


def test_audio_energy_sig_cross_container_stability(spark):
    """The fingerprint is a property of the PCM, not the container:
    the same samples through WAV and FLAC must produce the SAME
    signature (the precondition for cross-container audio dedup)."""
    import io as iomod
    import wave as wavemod

    import pandas as pd

    from lime_etl_spark.operators.flac_codec import encode_flac
    from lime_etl_spark.operators.multimodal import (
        AUDIO_RATE,
        MEDIA_SCHEMA,
        _flac_pcm,
        audio_energy_sig,
    )

    pcm = _flac_pcm(2003)
    buf = iomod.BytesIO()
    with wavemod.open(buf, "wb") as wv:
        wv.setnchannels(1)
        wv.setsampwidth(2)
        wv.setframerate(AUDIO_RATE)
        wv.writeframes(pcm.tobytes())
    rows = [
        (1, "audio", buf.getvalue(), (None, None, 1, AUDIO_RATE, None, "pcm_s16le")),
        (2, "audio", encode_flac(pcm, AUDIO_RATE), (None, None, 1, AUDIO_RATE, None, "flac")),
    ]
    pdf = pd.DataFrame(
        {
            "media_id": [r[0] for r in rows],
            "media_type": [r[1] for r in rows],
            "content": [r[2] for r in rows],
            "meta": [
                dict(
                    zip(
                        ("width", "height", "channels", "sample_rate", "duration_ms", "codec"),
                        r[3],
                    )
                )
                for r in rows
            ],
        }
    )
    df = spark.createDataFrame(pdf, MEDIA_SCHEMA)
    sigs = {r["media_id"]: r["ahash"] for r in audio_energy_sig(df).collect()}
    assert sigs[1] == sigs[2]
