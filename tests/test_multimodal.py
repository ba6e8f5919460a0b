"""Multimodal plumbing: the Arrow-batched codec stages must agree with
their declarative equivalents, and the stub gates must be explicit."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kafka_streams_repartition_spark.operators.multimodal import (
    MEDIA_SCHEMA,
    decode_image_meta,
    documents_as_media,
    extract_features,
    multimodal_frames,
    resize_media,
    sample_frames_pandas,
)
from kafka_streams_repartition_spark.sources.tables import load_tables


@pytest.fixture(scope="module")
def tables(spark, sf_dir):
    return load_tables(spark, sf_dir)


def _collect_frames(df):
    return sorted(
        (r["media_id"], r["frame_idx"], r["frame_len"], r["frame_hash"])
        for r in df.collect()
    )


def test_pandas_frame_sampler_matches_declarative(spark, tables):
    """The mapInPandas codec stub and the posexplode form are the same
    operator — bit-identical frames."""
    media = documents_as_media(tables["documents"])
    got = _collect_frames(sample_frames_pandas(media, fake=True))
    want = _collect_frames(multimodal_frames(tables))
    assert got == want and len(got) > 0


def test_resize_media_plumbing(spark, tables):
    media = documents_as_media(tables["documents"].limit(20))
    out = resize_media(media, width=8, height=4, fake=True).collect()
    assert len(out) == 20
    for r in out:
        assert len(r["payload"]) == 32
        assert (r["width"], r["height"]) == (8, 4)


def test_extract_features_shape(spark, tables):
    media = documents_as_media(tables["documents"].limit(5))
    out = extract_features(media, fake=True).collect()
    assert len(out) == 5 * 8
    assert all(0.0 <= r["x"] < 1.0 for r in out)


def test_codec_stubs_raise_without_fake(spark, tables):
    from kafka_streams_repartition_spark.operators.multimodal import _PILImage

    media = documents_as_media(tables["documents"].limit(1))
    stages = [
        sample_frames_pandas(media),
        resize_media(media, 4, 4),
        extract_features(media),
    ]
    if _PILImage is None:  # decode is real when Pillow imports
        stages.append(decode_image_meta(media))
    for stage in stages:
        with pytest.raises(Exception, match="NotImplementedError|not available"):
            stage.collect()


def test_decode_image_meta_real_or_stub(spark):
    """Either-path contract: with Pillow installed the decode reads real
    image bytes (and quarantines undecodable ones as nulls); without it
    the non-fake path raises — never silently fakes."""
    from kafka_streams_repartition_spark.operators.multimodal import _PILImage

    if _PILImage is None:
        media = spark.createDataFrame(
            [(1, bytearray(b"not an image"), "image/png")], MEDIA_SCHEMA
        )
        with pytest.raises(Exception, match="NotImplementedError|requires Pillow"):
            decode_image_meta(media).collect()
        return

    import io

    buf = io.BytesIO()
    _PILImage.new("RGB", (12, 7)).save(buf, format="PNG")
    media = spark.createDataFrame(
        [
            (1, bytearray(buf.getvalue()), "image/png"),
            (2, bytearray(b"corrupt bytes"), "image/png"),
        ],
        MEDIA_SCHEMA,
    )
    rows = {r["media_id"]: r for r in decode_image_meta(media).collect()}
    assert (rows[1]["width"], rows[1]["height"], rows[1]["n_frames"]) == (12, 7, 1)
    assert rows[2]["width"] is None  # log-and-continue, not a crash


def test_decode_image_meta_deterministic(spark, tables):
    media = documents_as_media(tables["documents"].limit(50))
    a = {r["media_id"]: (r["width"], r["height"], r["n_frames"])
         for r in decode_image_meta(media, fake=True).collect()}
    b = {r["media_id"]: (r["width"], r["height"], r["n_frames"])
         for r in decode_image_meta(media, fake=True).collect()}
    assert a == b and len(a) == 50


def test_vectorized_ann_matches_jvm_bruteforce(spark, tables):
    """Two physical strategies, one logical result."""
    from kafka_streams_repartition_spark.operators.similarity import (
        ann_topk_bruteforce,
        ann_topk_vectorized,
    )

    key = lambda df: sorted(
        (r["query_id"], r["rank"], r["cand_id"], r["cosine"]) for r in df.collect()
    )
    assert key(ann_topk_vectorized(tables)) == key(ann_topk_bruteforce(tables))


def _make_png(w: int, h: int, n_frames: int | None = None) -> bytes:
    """Minimal valid (A)PNG via pure stdlib — no codec library."""
    import struct
    import zlib

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)  # 8-bit RGB
    raw = b"".join(b"\x00" + b"\x00\x00\x00" * w for _ in range(h))
    png = b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
    if n_frames is not None:
        png += chunk(b"acTL", struct.pack(">II", n_frames, 0))
    return png + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b"")


def test_decode_image_meta_png_without_pillow(spark):
    """The REAL (non-fake) decode path must run in a Pillow-less
    environment for PNG payloads: width/height from IHDR, frame count
    from APNG acTL, malformed-after-signature bytes quarantined as
    null metadata (log-and-continue, not a crash)."""
    media = spark.createDataFrame(
        [
            (1, bytearray(_make_png(12, 7)), "image/png"),
            (2, bytearray(_make_png(640, 480, n_frames=3)), "image/png"),
            (3, bytearray(b"\x89PNG\r\n\x1a\n" + b"garbage"), "image/png"),
        ],
        MEDIA_SCHEMA,
    )
    rows = {r["media_id"]: r for r in decode_image_meta(media).collect()}
    assert (rows[1]["width"], rows[1]["height"], rows[1]["n_frames"]) == (12, 7, 1)
    assert (rows[2]["width"], rows[2]["height"], rows[2]["n_frames"]) == (
        640,
        480,
        3,
    )
    assert rows[3]["width"] is None and rows[3]["n_bytes"] == 15


def _make_wav(rate: int, channels: int, bits: int, n_samples: int) -> bytes:
    """Minimal valid WAV via pure stdlib."""
    import struct

    block = channels * bits // 8
    data = b"\x00" * (n_samples * block)
    fmt = struct.pack("<HHIIHH", 1, channels, rate, rate * block, block, bits)
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _make_mp4(timescale: int, duration: int, n_tracks: int) -> bytes:
    """Minimal valid MP4 (ftyp + moov/mvhd + empty traks)."""
    import struct

    def box(btype: bytes, payload: bytes) -> bytes:
        return struct.pack(">I", 8 + len(payload)) + btype + payload

    ftyp = box(b"ftyp", b"isom\x00\x00\x02\x00isomiso2")
    mvhd = box(
        b"mvhd",
        b"\x00" + b"\x00" * 3  # version 0 + flags
        + struct.pack(">II", 0, 0)  # ctime, mtime
        + struct.pack(">II", timescale, duration)
        + b"\x00" * 80,  # rate/volume/matrix/next_track (don't care)
    )
    traks = b"".join(box(b"trak", b"") for _ in range(n_tracks))
    return ftyp + box(b"moov", mvhd + traks)


def test_decode_audio_video_meta_stdlib(spark):
    """WAV and MP4 container metadata must parse without any codec
    library: duration/rate/track accounting is struct-layout work, not
    decode work.  Malformed-after-signature payloads quarantine as
    nulls; wrong-container payloads raise."""
    from kafka_streams_repartition_spark.operators.multimodal import (
        decode_audio_meta,
        decode_video_meta,
    )

    audio = spark.createDataFrame(
        [
            (1, bytearray(_make_wav(16000, 1, 16, 16000)), "audio/wav"),
            (2, bytearray(_make_wav(44100, 2, 16, 44100 * 3)), "audio/wav"),
            (3, bytearray(b"RIFF\x04\x00\x00\x00WAVE"), "audio/wav"),
        ],
        MEDIA_SCHEMA,
    )
    rows = {r["media_id"]: r for r in decode_audio_meta(audio).collect()}
    assert (
        rows[1]["sample_rate"],
        rows[1]["channels"],
        rows[1]["duration_ms"],
    ) == (16000, 1, 1000)
    assert (rows[2]["sample_rate"], rows[2]["channels"]) == (44100, 2)
    assert rows[2]["duration_ms"] == 3000
    assert rows[3]["sample_rate"] is None  # malformed → nulls

    video = spark.createDataFrame(
        [
            (1, bytearray(_make_mp4(600, 1800, 2)), "video/mp4"),
            (2, bytearray(_make_mp4(90000, 90000 * 42, 1)), "video/mp4"),
        ],
        MEDIA_SCHEMA,
    )
    vrows = {r["media_id"]: r for r in decode_video_meta(video).collect()}
    assert (
        vrows[1]["duration_ms"],
        vrows[1]["timescale"],
        vrows[1]["n_tracks"],
    ) == (3000, 600, 2)
    assert (vrows[2]["duration_ms"], vrows[2]["n_tracks"]) == (42000, 1)

    import pytest as _pytest

    not_wav = spark.createDataFrame(
        [(9, bytearray(b"OggS rest-of-an-ogg"), "audio/ogg")], MEDIA_SCHEMA
    )
    with _pytest.raises(Exception, match="NotImplementedError|not WAV"):
        decode_audio_meta(not_wav).collect()


def test_container_parsers_roundtrip_property():
    """Hypothesis round-trip: any WAV/MP4 we can construct must parse
    back to its own parameters (pure-function check — no Spark)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from kafka_streams_repartition_spark.operators.multimodal import (
        _mp4_meta,
        _wav_meta,
    )

    @settings(max_examples=50, deadline=None)
    @given(
        rate=st.integers(min_value=1, max_value=384_000),
        channels=st.integers(min_value=1, max_value=8),
        bits=st.sampled_from([8, 16, 24, 32]),
        n_samples=st.integers(min_value=0, max_value=2000),
    )
    def check_wav(rate, channels, bits, n_samples):
        got = _wav_meta(_make_wav(rate, channels, bits, n_samples))
        block = channels * bits // 8
        want_ms = (n_samples * block) * 1000 // (rate * block)
        assert got == (rate, channels, bits, want_ms)

    @settings(max_examples=50, deadline=None)
    @given(
        timescale=st.integers(min_value=1, max_value=10**6),
        duration=st.integers(min_value=0, max_value=2**32 - 1),
        n_tracks=st.integers(min_value=0, max_value=6),
    )
    def check_mp4(timescale, duration, n_tracks):
        got = _mp4_meta(_make_mp4(timescale, duration, n_tracks))
        assert got == (duration * 1000 // timescale, timescale, n_tracks)

    check_wav()
    check_mp4()


def test_wav_pcm_samples_cross_validated_with_wave_module():
    """The hand-rolled PCM16 parser and synthesizer agree with the
    stdlib `wave` module in BOTH directions: wave-written files decode
    to the same samples, and synthesized payloads read back identically
    through wave."""
    import io
    import struct
    import wave

    import numpy as np

    from kafka_streams_repartition_spark.operators.multimodal import (
        AUDIO_PCM_RATE,
        _wav_pcm_samples,
    )

    samples = [0, 1, -1, 32767, -32768, 12345, -12345, 7]
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(AUDIO_PCM_RATE)
        w.writeframes(struct.pack("<8h", *samples))
    got = _wav_pcm_samples(buf.getvalue())
    assert got.tolist() == samples

    # synthesized payload → wave module reads the same samples back
    # reconstruct expected samples from the documented formula
    import hashlib

    want = [
        int(hashlib.md5(f"3:{k}".encode()).hexdigest()[:4], 16) - 32768
        for k in range(10)
    ]
    # build the payload exactly as synthesize_pcm_wavs does
    data = struct.pack("<10h", *want)
    fmt = struct.pack("<HHIIHH", 1, 1, AUDIO_PCM_RATE, AUDIO_PCM_RATE * 2, 2, 16)
    payload = (
        b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data)) + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    with wave.open(io.BytesIO(payload), "rb") as r:
        assert r.getnchannels() == 1
        assert r.getsampwidth() == 2
        assert r.getframerate() == AUDIO_PCM_RATE
        assert (
            np.frombuffer(r.readframes(10), dtype="<i2").tolist() == want
        )
    assert _wav_pcm_samples(payload).tolist() == want


def test_wav_pcm_samples_rejects_compressed():
    """Non-PCM (compressed) WAV raises — it genuinely needs a codec."""
    import struct

    import pytest as _pytest

    from kafka_streams_repartition_spark.operators.multimodal import (
        _wav_pcm_samples,
    )

    fmt = struct.pack("<HHIIHH", 7, 1, 8000, 8000, 1, 8)  # 7 = mu-law
    payload = (
        b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8) + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", 0)
    )
    with _pytest.raises(NotImplementedError):
        _wav_pcm_samples(payload)


def test_audio_features_pipeline_matches_local_replay(spark, tables):
    """The full synthesize → RIFF decode → feature pipeline over real
    Spark, spot-checked against a straight local replay of the sample
    formula (the same arithmetic the SQL oracle runs)."""
    import hashlib

    import numpy as np

    from kafka_streams_repartition_spark.operators import multimodal as mm

    rows = {
        r["media_id"]: r
        for r in mm.audio_features(tables).collect()
    }
    assert len(rows) == tables["documents"].count()
    for mid in list(rows)[:5]:
        n = 64 + mid % 64
        s = np.array(
            [
                int(hashlib.md5(f"{mid}:{k}".encode()).hexdigest()[:4], 16)
                - 32768
                for k in range(n)
            ],
            dtype=np.int64,
        )
        r = rows[mid]
        assert r["n_samples"] == n
        assert r["peak"] == int(np.abs(s).max())
        assert r["zero_crossings"] == int(
            np.count_nonzero((s[1:] < 0) != (s[:-1] < 0))
        )
        assert r["rms"] == round(float(np.sqrt((s.astype(float) ** 2).sum() / n)), 4)
        assert r["duration_ms"] == n * 1000 // mm.AUDIO_PCM_RATE


def test_png_pixel_roundtrip_all_filters():
    """The stdlib PNG pixel codec: encode cycles through all five PNG
    filter types (row y gets filter y % 5), so a bit-exact round trip
    proves real unfiltering of Sub/Up/Average/Paeth, not just the
    filter-0 path."""
    import numpy as np

    from kafka_streams_repartition_spark.operators.multimodal import (
        _png_decode_rgb,
        _png_encode_rgb,
        _stdlib_png_meta,
    )

    rng = np.random.default_rng(11)
    for h, w in [(1, 1), (6, 3), (11, 16)]:
        arr = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        b = _png_encode_rgb(arr)
        back = _png_decode_rgb(b)
        assert back is not None and (back == arr).all()
        # the metadata parser agrees with the pixel parser
        assert _stdlib_png_meta(b)[:2] == (w, h)
    # gradients stress Average/Paeth predictors specifically
    grad = np.fromfunction(
        lambda y, x, c: (y * 7 + x * 3 + c * 11) % 256, (10, 10, 3)
    ).astype(np.uint8)
    assert (_png_decode_rgb(_png_encode_rgb(grad)) == grad).all()
    # truncated payload → None (log-and-continue), never garbage pixels
    assert _png_decode_rgb(_png_encode_rgb(grad)[:40]) is None


def test_png_pixel_decode_rejects_exotic_variants():
    """Palette / 16-bit / interlaced PNGs genuinely need a codec and
    must raise, not silently misdecode."""
    import struct
    import zlib

    import pytest as _pytest

    from kafka_streams_repartition_spark.operators.multimodal import (
        _PNG_SIG,
        _png_chunk,
        _png_decode_rgb,
    )

    for depth, color, interlace in [(8, 3, 0), (16, 2, 0), (8, 2, 1)]:
        ihdr = struct.pack(">IIBBBBB", 4, 4, depth, color, 0, 0, interlace)
        b = (
            _PNG_SIG
            + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", zlib.compress(b"\x00" * 52))
            + _png_chunk(b"IEND", b"")
        )
        with _pytest.raises(NotImplementedError):
            _png_decode_rgb(b)


def test_image_features_pipeline_matches_local_replay(spark, tables):
    """synthesize → real PNG decode → features over Spark, spot-checked
    against a local replay of the md5 pixel formula."""
    import hashlib

    from kafka_streams_repartition_spark.operators import multimodal as mm

    rows = {r["media_id"]: r for r in mm.image_features(tables).collect()}
    assert len(rows) == tables["documents"].count()
    for mid in list(rows)[:3]:
        w, h = 8 + mid % 8, 8 + mid % 5
        sums = [0, 0, 0]
        for y in range(h):
            for x in range(w):
                d = hashlib.md5(f"{mid}:{y}:{x}".encode()).digest()
                for c in range(3):
                    sums[c] += d[c]
        r = rows[mid]
        assert (r["width"], r["height"]) == (w, h)
        n = w * h
        # half-away rounding, matching F.round/DuckDB (Python round()
        # is banker's and flips exact .xxxx5 ties)
        import math

        rnd = lambda v: math.floor(v * 10000 + 0.5) / 10000  # noqa: E731
        assert r["mean_r"] == rnd(sums[0] / n)
        assert r["mean_g"] == rnd(sums[1] / n)
        assert r["mean_b"] == rnd(sums[2] / n)
        assert r["brightness"] == rnd(sum(sums) / (3 * n))
