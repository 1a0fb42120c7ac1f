"""Multimodal binary-column plumbing and streaming events pipeline."""

from __future__ import annotations

import os

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
