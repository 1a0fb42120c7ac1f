"""Stream-stream interval join: streaming result equals the batch join.

The same interval_join() code runs on batch frames and on watermarked
streams; the streaming run (availableNow over two file-source streams)
must produce exactly the batch rows for every pair inside the
attribution window, with state bounded by watermark + window.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vcf_pg_loader_spark.sources.tables import load_table
from vcf_pg_loader_spark.streaming.events import read_events_stream
from vcf_pg_loader_spark.streaming.joins import interval_join

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events(spark):
    return load_table(spark, SF_DIR, "events")


def _sides(df):
    clicks = df.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "event_id"
    )
    purchases = df.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id", "value"
    )
    return clicks, purchases


class TestIntervalJoin:
    def test_stream_equals_batch(self, spark, events, tmp_path):
        # batch reference
        bc, bp = _sides(events)
        want = {
            (r.l_event_id, r.r_event_id)
            for r in interval_join(bc, bp, "user_id", within="1 hour").collect()
        }
        assert want  # fixture must actually produce attributed pairs

        # streaming run over file drops of the same data
        cdir, pdir = str(tmp_path / "c"), str(tmp_path / "p")
        c, p = _sides(events)
        c.write.parquet(cdir)
        p.write.parquet(pdir)
        sc = read_events_stream(spark, cdir).select("user_id", "ts", "event_id")
        sp = read_events_stream(spark, pdir).select(
            "user_id", "ts", "event_id", "value"
        )
        out = str(tmp_path / "out")
        q = (
            interval_join(sc, sp, "user_id", within="1 hour")
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", str(tmp_path / "ck"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        got = {
            (r.l_event_id, r.r_event_id)
            for r in spark.read.parquet(out).collect()
        }
        assert got == want

    def test_range_constraint_filters(self, spark, events):
        c, p = _sides(events)
        joined = interval_join(c, p, "user_id", within="1 hour")
        bad = joined.filter(
            (F.col("r_ts") <= F.col("l_ts"))
            | (F.col("r_ts") > F.col("l_ts") + F.expr("INTERVAL 1 HOUR"))
        )
        assert bad.count() == 0


class TestStreamingSessionWindow:
    def test_native_session_window_stream_equals_batch(self, spark, events, tmp_path):
        """Spark's built-in session_window on a watermarked stream emits
        exactly the batch sessions once the watermark passes (the JVM
        twin of the applyInPandasWithState equivalence proof)."""
        src = str(tmp_path / "in")
        events.write.parquet(src)
        stream = read_events_stream(spark, src)
        agg = (
            stream.withWatermark("ts", "0 seconds")
            .groupBy("user_id", F.session_window("ts", "30 minutes").alias("w"))
            .agg(F.count(F.lit(1)).alias("n"))
            .select("user_id", "w.start", "w.end", "n")
        )
        out = str(tmp_path / "out")
        q = (
            agg.writeStream.outputMode("append")
            .format("parquet")
            .option("path", out)
            .option("checkpointLocation", str(tmp_path / "ck"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        got = {
            (r.user_id, r.start, r.n)
            for r in spark.read.parquet(out).collect()
        }
        batch = {
            (r.user_id, r.w.start, r.n)
            for r in events.groupBy(
                "user_id", F.session_window("ts", "30 minutes").alias("w")
            )
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        # append mode holds back sessions not yet closed by the final
        # watermark; everything emitted must match the batch sessions,
        # and the holdback is bounded by the last gap horizon
        assert got <= batch
        assert len(batch) - len(got) <= events.select("user_id").distinct().count()
        assert len(got) > 0
