"""JDBC sink round-trip against embedded Derby (shipped in Spark's jars).

The reference's central sink is a Postgres binary-COPY bulk load
(reference loader.py:492-516, db_loader.py:11-78); this engine's
analogue is tuned JDBC batch writes.  These tests EXECUTE that write
path — write, read-back, delete-batch, idempotent re-append — so the
sink is verified code, not config."""

from __future__ import annotations

import pytest

from vcf_pg_loader_spark.sources.jdbc import (
    JdbcSinkConfig,
    delete_batch_sql,
    idempotent_reload,
    read_table_jdbc,
    serialize_complex_columns,
    write_variants_jdbc,
)

VARIANT_COLS = ["chrom", "pos", "ref", "alt", "qual", "load_batch_id"]


def _variants(spark, batch_id: str, n: int = 500):
    rows = [
        (f"chr{(i % 22) + 1}", 1000 + i, "A", "CG"[i % 2], float(i % 60), batch_id)
        for i in range(n)
    ]
    return spark.createDataFrame(rows, VARIANT_COLS)


@pytest.fixture(scope="module")
def cfg(tmp_path_factory):
    db = tmp_path_factory.mktemp("derby") / "variantdb"
    return JdbcSinkConfig(
        url=f"jdbc:derby:{db};create=true",
        table="variants_rt",
        batch_size=200,
        num_partitions=4,
        # Derby maps StringType -> CLOB, which can't sit in a WHERE
        # clause; the delete-batch predicate needs a real VARCHAR.
        create_table_column_types=(
            "chrom VARCHAR(8), ref VARCHAR(64), alt VARCHAR(64), "
            "load_batch_id VARCHAR(36)"
        ),
    )


class TestConfig:
    def test_postgres_options_keep_copy_tuning(self):
        c = JdbcSinkConfig(url="jdbc:postgresql://db:5432/variants")
        opts = c.options()
        assert opts["driver"] == "org.postgresql.Driver"
        assert opts["reWriteBatchedInserts"] == "true"
        assert opts["batchsize"] == "30000"
        assert opts["numPartitions"] == "8"

    def test_derby_driver_inferred(self, cfg):
        opts = cfg.options()
        assert opts["driver"] == "org.apache.derby.iapi.jdbc.AutoloadedDriver"
        assert "reWriteBatchedInserts" not in opts  # postgres-only knob
        assert opts["batchsize"] == "200"

    def test_delete_batch_sql_escapes_and_quotes(self):
        assert (
            delete_batch_sql("t", "a'b")
            == 'DELETE FROM t WHERE "load_batch_id" = \'a\'\'b\''
        )

    def test_first_load_on_fresh_db_tolerates_missing_table(
        self, spark, tmp_path
    ):
        fresh = JdbcSinkConfig(
            url=f"jdbc:derby:{tmp_path}/freshdb;create=true",
            table="never_written",
            create_table_column_types=(
                "chrom VARCHAR(8), ref VARCHAR(64), alt VARCHAR(64), "
                "load_batch_id VARCHAR(36)"
            ),
            num_partitions=2,
        )
        idempotent_reload(_variants(spark, "b0", n=10), fresh, "b0")
        assert read_table_jdbc(spark, fresh).count() == 10


class TestRoundTrip:
    def test_write_then_read_back(self, spark, cfg):
        df = _variants(spark, "batch-1")
        write_variants_jdbc(df, cfg, mode="append")
        back = read_table_jdbc(spark, cfg)
        assert back.count() == 500
        got = sorted(
            tuple(r) for r in back.select(*VARIANT_COLS).collect()
        )
        want = sorted(tuple(r) for r in df.collect())
        assert got == want

    def test_idempotent_reload_converges(self, spark, cfg):
        df = _variants(spark, "batch-1")
        # Re-running the same batch twice must not duplicate rows.
        idempotent_reload(df, cfg, "batch-1")
        idempotent_reload(df, cfg, "batch-1")
        back = read_table_jdbc(spark, cfg)
        assert back.count() == 500

    def test_second_batch_appends(self, spark, cfg):
        df2 = _variants(spark, "batch-2", n=100)
        idempotent_reload(df2, cfg, "batch-2")
        back = read_table_jdbc(spark, cfg)
        assert back.count() == 600
        per_batch = {
            r["load_batch_id"]: r["n"]
            for r in back.groupBy("load_batch_id").count().withColumnRenamed(
                "count", "n"
            ).collect()
        }
        assert per_batch == {"batch-1": 500, "batch-2": 100}


class TestComplexColumns:
    """Array + map columns through the JDBC sink (reference schema.py:119,151:
    variants.filter is TEXT[], variants.info is JSONB).  Generic JDBC
    targets have neither type, so the sink JSON-serializes on write and
    from_json-restores on read — executed here against embedded Derby,
    asserting VALUE fidelity, not just config."""

    COMPLEX_COLS = "chrom string, pos long, filter array<string>, info map<string,string>, csq struct<gene:string,impact:string>, load_batch_id string"

    def _complex(self, spark, batch_id: str, n: int = 200):
        rows = [
            (
                f"chr{(i % 22) + 1}",
                1000 + i,
                [] if i % 3 == 0 else ["LowQual", f"f{i % 5}"],
                {"DP": str(i % 100), "AF": f"0.{i % 9 + 1}"},
                (f"GENE{i % 7}", "HIGH" if i % 2 else "LOW"),
                batch_id,
            )
            for i in range(n)
        ]
        return spark.createDataFrame(rows, self.COMPLEX_COLS)

    @pytest.fixture(scope="class")
    def ccfg(self, tmp_path_factory):
        db = tmp_path_factory.mktemp("derby_cx") / "complexdb"
        return JdbcSinkConfig(
            url=f"jdbc:derby:{db};create=true",
            table="variants_cx",
            batch_size=100,
            num_partitions=2,
            create_table_column_types=(
                "chrom VARCHAR(8), filter VARCHAR(256), info VARCHAR(512), "
                "csq VARCHAR(256), load_batch_id VARCHAR(36)"
            ),
        )

    def test_array_and_map_round_trip_values(self, spark, ccfg):
        df = self._complex(spark, "cx-1")
        types = write_variants_jdbc(df, ccfg, serialize_complex=True)
        assert set(types) == {"filter", "info", "csq"}
        assert types["filter"] == "array<string>"
        assert types["info"] == "map<string,string>"
        back = read_table_jdbc(spark, ccfg, complex_types=types)
        # restored schema matches the original frame's complex types
        want_schema = {f.name: f.dataType for f in df.schema.fields}
        got_schema = {f.name: f.dataType for f in back.schema.fields}
        assert got_schema == want_schema
        key = lambda r: r["pos"]  # noqa: E731
        want = sorted(df.collect(), key=key)
        got = sorted(back.collect(), key=key)
        for w, g in zip(want, got):
            assert g["filter"] == w["filter"]
            assert g["info"] == w["info"]
            assert g["csq"] == w["csq"]

    def test_idempotent_reload_with_complex_columns(self, spark, ccfg):
        df = self._complex(spark, "cx-1")
        ser, types = serialize_complex_columns(df)
        idempotent_reload(ser, ccfg, "cx-1")
        idempotent_reload(ser, ccfg, "cx-1")
        back = read_table_jdbc(spark, ccfg, complex_types=types)
        assert back.count() == 200
