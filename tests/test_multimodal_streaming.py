"""Multimodal binary-column plumbing and streaming events pipeline."""

from __future__ import annotations

import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from vcf_pg_loader_spark.operators import multimodal as M


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        (1, "image", b"imagebytes-aaaa", "image/png", (8, 8, None, None)),
        (2, "image", b"imagebytes-bbbb", "image/png", (8, 8, None, None)),
        (3, "image", b"imagebytes-aaaa", "image/png", (8, 8, None, None)),  # dup of 1
        (4, "video", b"videobytes-cccc", "video/mp4", (None, None, 5000, None)),
        (5, "audio", b"audiobytes-dddd", "audio/wav", (None, None, 3000, 16000)),
    ]
    return spark.createDataFrame(
        [
            {
                "media_id": mid,
                "kind": kind,
                "content": content,
                "mime": mime,
                "meta": {
                    "width": meta[0],
                    "height": meta[1],
                    "duration_ms": meta[2],
                    "sample_rate": meta[3],
                },
            }
            for mid, kind, content, mime, meta in rows
        ],
        M.MEDIA_SCHEMA,
    )


class TestMultimodal:
    def test_image_features_shape_and_determinism(self, spark, media):
        feats = {r.media_id: r for r in M.image_features(media, dim=16).collect()}
        assert set(feats) == {1, 2, 3, 4, 5}
        f1 = feats[1]
        assert len(f1.feature) == 16
        # L2-normalized
        assert sum(x * x for x in f1.feature) == pytest.approx(1.0, rel=1e-5)
        # identical bytes -> identical features + hash (deterministic seam)
        assert feats[3].feature == f1.feature
        assert feats[3].content_sha256 == f1.content_sha256
        assert feats[2].content_sha256 != f1.content_sha256

    def test_frame_sampling(self, spark, media):
        frames = M.sample_frames(media, n_frames=3).collect()
        assert len(frames) == 3  # only the video row
        assert sorted(f.frame_idx for f in frames) == [0, 1, 2]
        assert len({f.frame_sha256 for f in frames}) == 3

    def test_dedup_by_content(self, spark, media):
        classes = {r.content_sha256: r for r in M.dedup_by_content(media).collect()}
        dup_class = [c for c in classes.values() if c.n_copies == 2]
        assert len(dup_class) == 1
        assert dup_class[0].canonical_id == 1

    def test_partitioning(self, spark, media):
        out = M.partition_by_content(media, 4)
        assert out.rdd.getNumPartitions() == 4
        assert out.count() == 5


class TestAudio:
    def test_audio_features_shape_and_determinism(self, spark, media):
        feats = {
            r.media_id: r for r in M.audio_features(media, bands=13).collect()
        }
        # only the audio row crosses the boundary
        assert set(feats) == {5}
        r = feats[5]
        assert len(r.feature) == 13
        assert r.sample_rate == 16000
        assert r.n_samples >= 256
        again = M.audio_features(media, bands=13).collect()[0]
        assert again.feature == r.feature  # deterministic fake

    def test_audio_default_sample_rate(self, spark):
        rows = [
            {
                "media_id": 9,
                "kind": "audio",
                "content": b"clip-without-rate",
                "mime": "audio/wav",
                "meta": {
                    "width": None,
                    "height": None,
                    "duration_ms": None,
                    "sample_rate": None,
                },
            }
        ]
        df = spark.createDataFrame(rows, M.MEDIA_SCHEMA)
        out = M.audio_features(df).collect()[0]
        assert out.sample_rate == 16000


class TestStreaming:
    def test_windowed_counts_available_now(self, spark, tmp_path):
        from vcf_pg_loader_spark.streaming.events import (
            read_events_stream,
            run_available_now,
            windowed_event_counts,
        )

        # stage the fixture events as the stream input
        src = str(tmp_path / "stream_in")
        from vcf_pg_loader_spark.sources.tables import load_table

        load_table(spark, "/root/testdata/sf0.001", "events").write.parquet(src)

        stream = read_events_stream(spark, src)
        assert stream.isStreaming
        result = windowed_event_counts(stream, window="1 hour", watermark="2 hours")
        out = str(tmp_path / "stream_out")
        run_available_now(result, str(tmp_path / "ckpt"), out)

        got = spark.read.parquet(out)
        assert got.count() > 0
        # streaming result must equal the batch computation
        batch = (
            load_table(spark, "/root/testdata/sf0.001", "events")
            .groupBy(F.window("ts", "1 hour").alias("w"), F.col("event_type"))
            .agg(F.count(F.lit(1)).alias("n_events"))
            .select("w.start", "event_type", "n_events")
        )
        b = {(r.start, r.event_type): r.n_events for r in batch.collect()}
        s = {
            (r.window_start, r.event_type): r.n_events
            for r in got.collect()
        }
        # every emitted window matches the batch computation exactly
        for k, v in s.items():
            assert b[k] == v
        # append mode holds back only windows still inside the watermark
        # at end-of-input (correct late-data semantics, not data loss)
        import datetime

        max_ts = max(k[0] for k in b)
        for k in set(b) - set(s):
            assert k[0] >= max_ts - datetime.timedelta(hours=2)


class TestStatefulSessionization:
    def test_stream_equals_batch_for_closed_sessions(self, spark, tmp_path):
        import datetime

        from vcf_pg_loader_spark.sources.tables import load_table
        from vcf_pg_loader_spark.streaming.events import (
            read_events_stream,
            run_available_now,
            sessionize_batch,
            sessionize_stream,
        )

        src = str(tmp_path / "sess_in")
        events = load_table(spark, "/root/testdata/sf0.001", "events")
        events.write.parquet(src)

        stream = sessionize_stream(read_events_stream(spark, src), gap_minutes=30)
        out = str(tmp_path / "sess_out")
        run_available_now(stream, str(tmp_path / "sess_ckpt"), out)
        got = {
            (r.user_id, r.session_start, r.session_end): (r.n_events, round(r.total_value, 6))
            for r in spark.read.parquet(out).collect()
        }
        assert got, "no sessions emitted"

        batch = sessionize_batch(events, gap_minutes=30)
        max_ts = events.agg(F.max("ts")).collect()[0][0]
        gap = datetime.timedelta(minutes=30)
        closed = {
            (r.user_id, r.session_start, r.session_end): (r.n_events, round(r.total_value, 6))
            for r in batch.collect()
            if r.session_end + gap <= max_ts
        }
        # every emitted streaming session matches the batch twin exactly
        for k, v in got.items():
            assert closed.get(k) == v, k
        # and every batch session that must have closed was emitted
        assert set(closed) == set(got)


    def test_late_events_merge_into_held_sessions(self, spark, tmp_path):
        """Round-2 ADVICE scenario: with a nonzero watermark (allowed
        lateness), late events must merge into not-yet-emitted sessions —
        lowering a session start (11:55 before the 12:00 event) and
        bridging two sessions (12:20 joins [12:00] and [12:45]) — instead
        of producing splits that diverge from sessionize_batch."""
        import datetime
        import shutil
        import time as _time

        from vcf_pg_loader_spark.streaming.events import (
            read_events_stream,
            run_available_now,
            sessionize_batch,
            sessionize_stream,
        )

        def ts(h, m):
            return datetime.datetime(2024, 1, 1, h, m)

        file_batches = [
            # trigger 1: two sessions for user 1 + a 13:30 head event
            [(1, ts(10, 0)), (1, ts(10, 10)), (1, ts(12, 0)),
             (1, ts(12, 45)), (1, ts(13, 30))],
            # trigger 2: LATE events (>= watermark 11:30): 11:55 lowers the
            # 12:00 session start; 12:20 bridges [12:00] and [12:45]
            [(1, ts(11, 55)), (1, ts(12, 20))],
            # trigger 3: watermark pusher (user 2)
            [(2, ts(18, 0))],
        ]
        src = tmp_path / "late_src"
        src.mkdir()
        all_rows = []
        for i, batch in enumerate(file_batches):
            rows = [
                (100 * i + j, t, u, "click", 1.0, None)
                for j, (u, t) in enumerate(batch)
            ]
            all_rows += rows
            tmp = tmp_path / f"stage_{i}"
            spark.createDataFrame(
                rows, "event_id long, ts timestamp, user_id long, "
                      "event_type string, value double, props string",
            ).coalesce(1).write.parquet(str(tmp))
            part = next(p for p in tmp.iterdir() if p.name.endswith(".parquet"))
            shutil.copy(part, src / f"events_{i}.parquet")
            _time.sleep(1.1)  # distinct mtimes -> deterministic file order

        stream = sessionize_stream(
            read_events_stream(spark, str(src), max_files_per_trigger=1),
            gap_minutes=30,
            watermark="2 hours",
        )
        out = tmp_path / "late_out"
        run_available_now(stream, str(tmp_path / "late_ckpt"), str(out))
        got = {
            (r.user_id, r.session_start, r.session_end): (r.n_events, r.total_value)
            for r in spark.read.parquet(str(out)).collect()
        }

        batch_df = spark.createDataFrame(
            all_rows, "event_id long, ts timestamp, user_id long, "
                      "event_type string, value double, props string",
        )
        gap = datetime.timedelta(minutes=30)
        final_wm = ts(18, 0) - datetime.timedelta(hours=2)
        closed = {
            (r.user_id, r.session_start, r.session_end): (r.n_events, r.total_value)
            for r in sessionize_batch(batch_df, gap_minutes=30).collect()
            if r.session_end + gap <= final_wm
        }
        assert got == closed
        # the bridged session is present as ONE unsplit session
        assert (1, ts(11, 55), ts(12, 45)) in got
        assert got[(1, ts(11, 55), ts(12, 45))][0] == 4


class TestRealCodecs:
    """Golden tests for the REAL decode path — skip-marked in containers
    without the codec libraries, drop-in verified on images that have
    them."""

    def test_png_decode_golden(self, spark):
        """8-bit PNG decodes REAL everywhere (stdlib zlib/struct codec,
        operators/_png.py) — no PIL required."""
        import numpy as np

        from vcf_pg_loader_spark.operators import _png

        arr = np.zeros((2, 4, 3), dtype=np.uint8)
        arr[:, :] = (10, 20, 30)
        png = _png.encode_png(arr)
        got = M._decode_image(png)
        assert got.shape == (2, 4, 3)
        assert (got == [10, 20, 30]).all()
        df = spark.createDataFrame(
            [(1, "image", png, "image/png", (4, 2, None, None))],
            M.MEDIA_SCHEMA,
        )
        feats = M.image_features(df).collect()
        assert len(feats) == 1 and len(feats[0]["feature"]) == 16

    def test_png_roundtrip_all_color_types(self):
        import numpy as np

        from vcf_pg_loader_spark.operators import _png

        rng = np.arange(5 * 3 * 4, dtype=np.uint8)
        for ch in (1, 2, 3, 4):
            a = (rng[: 5 * 3 * ch] * 7 % 256).astype(np.uint8).reshape(5, 3, ch)
            back = _png.decode_png(_png.encode_png(a))
            assert (back == a).all(), ch

    def test_png_all_filter_types_defilter(self):
        """Hand-filter rows with Sub/Up/Average/Paeth per the PNG spec
        and confirm the decoder inverts each one exactly."""
        import struct
        import zlib

        import numpy as np

        from vcf_pg_loader_spark.operators import _png

        h, w, ch = 4, 5, 3
        orig = (np.arange(h * w * ch, dtype=np.int32) * 11 % 256).astype(
            np.uint8
        ).reshape(h, w, ch)
        flat = orig.reshape(h, w * ch).astype(np.int32)
        raw = bytearray()
        prev = np.zeros(w * ch, dtype=np.int32)
        for y, ftype in enumerate([1, 2, 3, 4]):  # Sub, Up, Average, Paeth
            row = flat[y]
            filt = np.zeros(w * ch, dtype=np.int32)
            for i in range(w * ch):
                a = int(row[i - ch]) if i >= ch else 0
                b = int(prev[i])
                c = int(prev[i - ch]) if i >= ch else 0
                pred = {
                    1: a,
                    2: b,
                    3: (a + b) // 2,
                    4: _png._paeth(a, b, c),
                }[ftype]
                filt[i] = (int(row[i]) - pred) % 256
            raw.append(ftype)
            raw.extend(filt.astype(np.uint8).tobytes())
            prev = row

        def chunk(ctype, body):
            crc = zlib.crc32(ctype + body) & 0xFFFFFFFF
            return (
                struct.pack(">I", len(body)) + ctype + body
                + struct.pack(">I", crc)
            )

        ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
        png = (
            _png._SIG
            + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(bytes(raw)))
            + chunk(b"IEND", b"")
        )
        assert (_png.decode_png(png) == orig).all()

    def test_png_unsupported_shapes_fall_through(self):
        import struct
        import zlib

        import numpy as np

        from vcf_pg_loader_spark.operators import _png

        # 16-bit depth PNG must raise (and _decode_image falls back)
        def chunk(ctype, body):
            crc = zlib.crc32(ctype + body) & 0xFFFFFFFF
            return (
                struct.pack(">I", len(body)) + ctype + body
                + struct.pack(">I", crc)
            )

        ihdr = struct.pack(">IIBBBBB", 2, 1, 16, 2, 0, 0, 0)
        body = zlib.compress(b"\x00" + b"\x00" * 12)
        png16 = _png._SIG + chunk(b"IHDR", ihdr) + chunk(b"IDAT", body) + chunk(b"IEND", b"")
        with pytest.raises(ValueError):
            _png.decode_png(png16)
        out = M._decode_image(png16)  # falls to PIL or the fake: no crash
        assert out.ndim == 3 and out.dtype == np.uint8

    def test_wav_decode_golden(self):
        """PCM WAV decodes REAL everywhere (stdlib wave/struct, no codec
        library): round-trip a written sine through _decode_audio and
        against the checked-in fixture."""
        import io as _io
        import math
        import struct
        import wave as _wave

        import numpy as np

        sr = 8000
        want = np.array(
            [0.5 * math.sin(2 * math.pi * 440 * i / sr) for i in range(sr)],
            dtype=np.float32,
        )
        buf = _io.BytesIO()
        with _wave.open(buf, "wb") as wf:
            wf.setnchannels(1)
            wf.setsampwidth(2)
            wf.setframerate(sr)
            wf.writeframes(
                b"".join(struct.pack("<h", int(32767 * x)) for x in want)
            )
        got = M._decode_audio(buf.getvalue(), sr)
        assert got.shape == (sr,)
        assert np.allclose(got, want, atol=1e-3)

    def test_wav_fixture_decode_and_features(self, spark):
        """The checked-in WAV runs the full audio_features path with a
        REAL decode — no library, no fake seam."""
        import os

        import numpy as np

        path = os.path.join(os.path.dirname(__file__), "fixtures", "tone_pcm16.wav")
        with open(path, "rb") as fh:
            content = fh.read()
        got = M._decode_audio(content, 8000)
        assert got.shape == (800,)
        # 440 Hz half-amplitude sine: RMS ~ 0.5/sqrt(2)
        assert abs(float(np.sqrt(np.mean(np.square(got)))) - 0.3536) < 0.01
        df = spark.createDataFrame(
            [(1, "audio", content, "audio/wav", (None, None, 100, 8000))],
            M.MEDIA_SCHEMA,
        )
        feats = M.audio_features(df, bands=4).collect()
        assert len(feats) == 1
        row = feats[0]
        assert row["n_samples"] == 800 and row["sample_rate"] == 8000
        # every band of a steady tone carries the same log-RMS energy
        f = row["feature"]
        assert len(f) == 4 and max(f) - min(f) < 0.01
        assert abs(f[0] - float(np.log1p(0.3536))) < 0.01

    def test_wav_stereo_downmix_and_8bit(self):
        import io as _io
        import struct
        import wave as _wave

        import numpy as np

        # stereo 16-bit: L = -R  => downmix to ~0
        buf = _io.BytesIO()
        with _wave.open(buf, "wb") as wf:
            wf.setnchannels(2)
            wf.setsampwidth(2)
            wf.setframerate(8000)
            wf.writeframes(
                b"".join(
                    struct.pack("<hh", v, -v) for v in (1000, -2000, 30000)
                )
            )
        got = M._decode_audio(buf.getvalue(), 8000)
        assert got.shape == (3,)
        assert np.allclose(got, 0.0, atol=1e-4)
        # unsigned 8-bit PCM: 128 is silence
        buf8 = _io.BytesIO()
        with _wave.open(buf8, "wb") as wf:
            wf.setnchannels(1)
            wf.setsampwidth(1)
            wf.setframerate(8000)
            wf.writeframes(bytes([128, 255, 0]))
        got8 = M._decode_audio(buf8.getvalue(), 8000)
        assert np.allclose(got8, [0.0, 127 / 128, -1.0], atol=1e-6)

    def test_non_wav_bytes_fall_through(self):
        # not RIFF/WAVE -> stdlib path declines, deterministic fallback
        assert M._decode_wav_pcm(b"payload-1") is None
        a = M._decode_audio(b"payload-1", 16000)
        b = M._decode_audio(b"payload-1", 16000)
        assert (a == b).all()

    def test_fake_seams_active_without_libs(self):
        # In this container the seams must be the deterministic fakes —
        # and identical bytes must decode identically (dedup invariant).
        if M.HAVE_PIL or M.HAVE_SOUNDFILE:
            pytest.skip("real codecs present")
        a = M._decode_image(b"payload-1")
        b = M._decode_image(b"payload-1")
        assert (a == b).all() and a.shape == (8, 8, 3)


class TestStreamingDedup:
    def test_replayed_rows_dropped_once(self, spark, tmp_path):
        from vcf_pg_loader_spark.sources.tables import load_table
        from vcf_pg_loader_spark.streaming.events import (
            dedup_stream,
            read_events_stream,
            run_available_now,
        )

        events = load_table(spark, "/root/testdata/sf0.001", "events").limit(500)
        src = str(tmp_path / "dedup_in")
        # simulate at-least-once delivery: the whole drop arrives twice,
        # plus a partial third replay
        events.write.parquet(src)
        events.write.mode("append").parquet(src)
        events.limit(100).write.mode("append").parquet(src)

        stream = dedup_stream(read_events_stream(spark, src), ["event_id"])
        out = str(tmp_path / "dedup_out")
        run_available_now(stream, str(tmp_path / "dedup_ckpt"), out)

        got = spark.read.parquet(out)
        n_distinct = events.select("event_id").distinct().count()
        assert got.count() == n_distinct
        assert got.select("event_id").distinct().count() == n_distinct


class TestMJPEGFrames:
    @staticmethod
    def _frame(payload: bytes) -> bytes:
        return b"\xff\xd8" + payload + b"\xff\xd9"

    def test_marker_split_and_even_sampling(self):
        import hashlib as _hl

        frames = [self._frame(bytes([i]) * 10) for i in range(7)]
        stream = b"".join(frames)
        got = M._split_mjpeg_frames(stream)
        assert got == frames
        sampled = M._decode_video_frames(stream, 3)
        # first, middle, last of the 7 real frames
        assert sampled == [frames[0], frames[3], frames[6]]
        assert M._decode_video_frames(stream, 1) == [frames[0]]
        # fewer frames than requested: all of them, no padding
        short = b"".join(frames[:2])
        assert M._decode_video_frames(short, 5) == frames[:2]

    def test_sample_frames_real_hashes(self, spark):
        import hashlib as _hl

        frames = [self._frame(bytes([i]) * 32) for i in range(5)]
        stream = b"".join(frames)
        df = spark.createDataFrame(
            [(1, "video", stream, "video/x-motion-jpeg",
              (None, None, 5000, None))],
            M.MEDIA_SCHEMA,
        )
        rows = sorted(
            M.sample_frames(df, n_frames=3).collect(),
            key=lambda r: r.frame_idx,
        )
        assert [r.frame_idx for r in rows] == [0, 1, 2]
        want = [frames[0], frames[2], frames[4]]
        assert [r.frame_sha256 for r in rows] == [
            _hl.sha256(f).hexdigest() for f in want
        ]

    def test_non_mjpeg_falls_back_deterministically(self):
        a = M._decode_video_frames(b"not a jpeg stream", 3)
        b = M._decode_video_frames(b"not a jpeg stream", 3)
        assert a == b and len(a) == 3


class TestBaselineJPEG:
    """Pure-Python baseline JPEG codec (operators/_jpeg.py): round-trip
    correctness across subsampling modes and restart intervals, a
    checked-in golden fixture decoded to pinned pixels, and the image /
    video feature paths running on REAL JPEG pixels without PIL."""

    def test_roundtrip_444(self):
        from vcf_pg_loader_spark.operators._jpeg import decode_jpeg, encode_jpeg

        rng = np.random.default_rng(7)
        img = rng.integers(0, 256, (24, 32, 3), dtype=np.uint8)
        dec = decode_jpeg(encode_jpeg(img, "4:4:4"))
        assert dec.shape == img.shape
        # all-ones quantization: the only loss is IDCT rounding
        assert int(np.max(np.abs(dec.astype(int) - img.astype(int)))) <= 2

    def test_roundtrip_420_constant_blocks_exact(self):
        from vcf_pg_loader_spark.operators._jpeg import decode_jpeg, encode_jpeg

        rng = np.random.default_rng(11)
        blocks = rng.integers(16, 240, (2, 3, 3), dtype=np.uint8)
        img = np.repeat(np.repeat(blocks, 16, axis=0), 16, axis=1)
        dec = decode_jpeg(encode_jpeg(img, "4:2:0"))
        # 16x16-constant color: chroma subsampling is lossless, so the
        # 4:2:0 MCU interleave + upsample path must round-trip within
        # the same IDCT rounding budget
        assert int(np.max(np.abs(dec.astype(int) - img.astype(int)))) <= 2

    def test_restart_intervals(self):
        from vcf_pg_loader_spark.operators._jpeg import decode_jpeg, encode_jpeg

        rng = np.random.default_rng(13)
        img = rng.integers(0, 256, (16, 64, 3), dtype=np.uint8)
        plain = decode_jpeg(encode_jpeg(img, "4:4:4"))
        for ri in (1, 3, 5):
            with_rst = decode_jpeg(
                encode_jpeg(img, "4:4:4", restart_interval=ri)
            )
            # RSTn segmentation and DC-predictor resets must not change
            # a single pixel
            assert (with_rst == plain).all(), ri

    def test_golden_fixture_pinned_pixels(self):
        import hashlib

        from vcf_pg_loader_spark.operators._jpeg import decode_jpeg

        with open("tests/fixtures/golden_16x16.jpg", "rb") as fh:
            enc = fh.read()
        assert (
            hashlib.sha256(enc).hexdigest()
            == "4b6eda00a39fe72d662c56841b4d47d74a68f2c67e02f62f2bf5ce43a772ba7f"
        )
        dec = decode_jpeg(enc)
        assert dec.shape == (16, 16, 3)
        assert (
            hashlib.sha256(dec.tobytes()).hexdigest()
            == "6907b626544cf09e1b29894fa2c0c376adf7c1194199696f1b02885ed551e07b"
        )
        assert dec[0, 0].tolist() == [0, 0, 0]
        assert dec[0, 15].tolist() == [230, 6, 117]
        assert dec[15, 0].tolist() == [10, 234, 123]
        assert dec[15, 15].tolist() == [240, 240, 240]

    def test_decode_image_routes_jpeg_without_pil(self):
        from vcf_pg_loader_spark.operators._jpeg import encode_jpeg

        rng = np.random.default_rng(17)
        img = rng.integers(0, 256, (16, 24, 3), dtype=np.uint8)
        arr = M._decode_image(encode_jpeg(img, "4:4:4"))
        assert arr.shape == (16, 24, 3)  # real dims, not the 8x8 fake
        assert int(np.max(np.abs(arr.astype(int) - img.astype(int)))) <= 2

    def test_image_features_on_real_jpeg_pixels(self, spark):
        from vcf_pg_loader_spark.operators._jpeg import encode_jpeg

        rng = np.random.default_rng(19)
        img = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
        enc = encode_jpeg(img, "4:4:4")
        df = spark.createDataFrame(
            [(1, "image", enc, "image/jpeg", (16, 16, None, None))],
            M.MEDIA_SCHEMA,
        )
        feat = np.array(M.image_features(df, dim=8).first().feature)
        want = np.array(M._pool_feature(M._decode_image(enc), 8))
        assert np.allclose(feat, want) and len(feat) == 8

    def test_frame_features_end_to_end_real_pixels(self, spark):
        """Video -> real MJPEG frame extraction -> real JPEG pixel
        decode -> pooled features, all dependency-free: the feature of
        each sampled frame equals the feature of that frame's SOURCE
        image within the codec's rounding budget."""
        from vcf_pg_loader_spark.operators._jpeg import encode_jpeg

        rng = np.random.default_rng(23)
        imgs = [
            rng.integers(0, 256, (16, 16, 3), dtype=np.uint8) for _ in range(5)
        ]
        frames = [encode_jpeg(im, "4:4:4") for im in imgs]
        stream = b"".join(frames)
        df = spark.createDataFrame(
            [(1, "video", stream, "video/x-motion-jpeg",
              (16, 16, 5000, None))],
            M.MEDIA_SCHEMA,
        )
        rows = sorted(
            M.frame_features(df, n_frames=3, dim=8).collect(),
            key=lambda r: r.frame_idx,
        )
        assert [r.frame_idx for r in rows] == [0, 1, 2]
        sampled = [imgs[0], imgs[2], imgs[4]]  # even temporal sampling
        for row, src in zip(rows, sampled):
            src_feat = np.array(M._pool_feature(src.astype(np.float32), 8))
            got = np.array(row.feature)
            # decoded pixels differ from source by <=2/255 per value;
            # pooled+normalized features land within a tight band
            assert np.allclose(got, src_feat, atol=0.01), row.frame_idx

    def test_progressive_falls_through(self):
        from vcf_pg_loader_spark.operators import _jpeg

        # SOF2 (progressive) must raise so the seam can fall through
        fake_sof2 = b"\xff\xd8\xff\xc2\x00\x0b\x08\x00\x10\x00\x10\x01\x01\x11\x00"
        with pytest.raises(ValueError):
            _jpeg.decode_jpeg(fake_sof2)
        assert _jpeg.is_jpeg(fake_sof2)

    def test_malformed_jpeg_raises_valueerror(self):
        from vcf_pg_loader_spark.operators import _jpeg

        # truncated mid-marker, garbage after SOI, truncated entropy data
        for bad in (
            b"\xff\xd8\xff",
            b"\xff\xd8\xff\xdb\x00\x43\x00",
            b"\xff\xd8\xff\xc0\x00\x05\x08\x00",
        ):
            try:
                _jpeg.decode_jpeg(bad)
                assert False, "should have raised"
            except ValueError:
                pass  # the seam's contract: only ValueError escapes
