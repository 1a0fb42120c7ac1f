"""JDBC sink — the reference's binary-COPY bulk path (loader.py:492-516,
db_loader.py:11-78) re-expressed as tuned JDBC batch writes, per
BASELINE.json ("Spark DataFrame parsing and JDBC bulk writes").

Production target is Postgres; tests exercise the identical write path
against embedded Derby (shipped in Spark's jars), so the sink is verified
end-to-end: write -> read-back -> delete-batch -> idempotent re-append.
Idempotent reload (delete batch then append) mirrors loader.py:230-252.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

_DRIVER_BY_SCHEME = {
    "postgresql": "org.postgresql.Driver",
    "derby": "org.apache.derby.iapi.jdbc.AutoloadedDriver",
    "sqlite": "org.sqlite.JDBC",
    "h2": "org.h2.Driver",
}


def _scheme(url: str) -> str:
    # jdbc:postgresql://... -> postgresql ; jdbc:derby:/path -> derby
    parts = url.split(":", 2)
    return parts[1] if len(parts) > 1 else ""


@dataclass
class JdbcSinkConfig:
    url: str  # jdbc:postgresql://host:port/db | jdbc:derby:/path;create=true
    table: str = "variants"
    user: str | None = None
    password: str | None = None
    batch_size: int = 30_000  # reference's optimal COPY batch
    num_partitions: int = 8  # parallel connections (pool analogue)
    driver: str | None = None  # inferred from URL scheme when None
    # Override Spark's default type mapping at CREATE time — e.g. Derby
    # maps StringType to CLOB, which cannot appear in a WHERE clause, so
    # key columns need explicit VARCHARs.
    create_table_column_types: str | None = None
    extra_options: dict[str, str] = field(default_factory=dict)

    def resolved_driver(self) -> str | None:
        return self.driver or _DRIVER_BY_SCHEME.get(_scheme(self.url))

    def options(self) -> dict[str, str]:
        opts = {
            "url": self.url,
            "dbtable": self.table,
            "batchsize": str(self.batch_size),
            "numPartitions": str(self.num_partitions),
        }
        drv = self.resolved_driver()
        if drv:
            opts["driver"] = drv
        if _scheme(self.url) == "postgresql":
            # rewrite INSERTs into multi-row batches server-side — the
            # closest JDBC gets to binary COPY throughput
            opts["reWriteBatchedInserts"] = "true"
            opts["stringtype"] = "unspecified"
        if self.create_table_column_types:
            opts["createTableColumnTypes"] = self.create_table_column_types
        if self.user:
            opts["user"] = self.user
        if self.password:
            opts["password"] = self.password
        opts.update(self.extra_options)
        return opts


def serialize_complex_columns(df: DataFrame) -> tuple[DataFrame, dict[str, str]]:
    """JSON-serialize every array/map/struct column for a JDBC target
    without native complex types.

    The reference's variants row carries `filter TEXT[]` and `info JSONB`
    (reference schema.py:119,151); generic JDBC has neither, so complex
    columns travel as JSON text — which is literally what JSONB stores,
    and what Postgres casts server-side under stringtype=unspecified.
    Returns (serialized_df, {column: original Spark DDL type}); feed the
    mapping to :func:`restore_complex_columns` (or keep it in the load
    audit) to get typed columns back on read.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.types import ArrayType, MapType, StructType

    types: dict[str, str] = {}
    out = df
    for f in df.schema.fields:
        if isinstance(f.dataType, (ArrayType, MapType, StructType)):
            types[f.name] = f.dataType.simpleString()
            out = out.withColumn(f.name, F.to_json(F.col(f.name)))
    return out, types


def restore_complex_columns(df: DataFrame, types: dict[str, str]) -> DataFrame:
    """Inverse of :func:`serialize_complex_columns`: from_json each JSON
    text column back to its recorded Spark type."""
    from pyspark.sql import functions as F

    out = df
    for name, ddl in types.items():
        out = out.withColumn(name, F.from_json(F.col(name), ddl))
    return out


def write_variants_jdbc(
    df: DataFrame,
    cfg: JdbcSinkConfig,
    mode: str = "append",
    serialize_complex: bool = False,
) -> dict[str, str]:
    """Bulk-append a variants frame over `numPartitions` connections.

    With serialize_complex=True, array/map/struct columns are written as
    JSON text (see :func:`serialize_complex_columns`); returns the
    column->type mapping needed to restore them on read (empty when
    nothing was serialized)."""
    types: dict[str, str] = {}
    if serialize_complex:
        df, types = serialize_complex_columns(df)
    (
        df.repartition(cfg.num_partitions)
        .write.format("jdbc")
        .options(**cfg.options())
        .mode(mode)
        .save()
    )
    return types


def read_table_jdbc(
    spark: SparkSession,
    cfg: JdbcSinkConfig,
    complex_types: dict[str, str] | None = None,
) -> DataFrame:
    """Read the sink table back (verification / round-trip tests).
    `complex_types` restores JSON-serialized array/map/struct columns."""
    df = spark.read.format("jdbc").options(**cfg.options()).load()
    if complex_types:
        df = restore_complex_columns(df, complex_types)
    return df


def delete_batch_sql(table: str, batch_id: str) -> str:
    """Idempotent-reload pre-delete (loader.py:249-252).

    The table name is used VERBATIM (Spark's JDBC writer passes it
    unquoted into CREATE TABLE, so the stored name matches what the user
    configured); column identifiers are double-quoted because Spark
    quotes them at CREATE time, which makes them case-sensitive on
    case-folding databases (Derby, Postgres)."""
    safe = batch_id.replace("'", "''")
    return f"DELETE FROM {table} WHERE \"load_batch_id\" = '{safe}'"


def execute_statement(spark: SparkSession, cfg: JdbcSinkConfig, sql: str) -> int:
    """Run one DML statement over a driver-side JDBC connection (the
    delete half of idempotent reload).  Returns the update count.

    Uses java.sql.DriverManager in the driver JVM — a single short
    statement, never row data, so there is no scale concern."""
    jvm = spark._jvm  # py4j bridge to the driver JVM
    drv = cfg.resolved_driver()
    if drv:
        jvm.java.lang.Class.forName(drv)
    props = jvm.java.util.Properties()
    if cfg.user:
        props.setProperty("user", cfg.user)
    if cfg.password:
        props.setProperty("password", cfg.password)
    conn = jvm.java.sql.DriverManager.getConnection(cfg.url, props)
    try:
        stmt = conn.createStatement()
        try:
            return stmt.executeUpdate(sql)
        finally:
            stmt.close()
    finally:
        conn.close()


_MISSING_TABLE_MARKERS = ("does not exist", "42X05", "42P01")


def idempotent_reload(df: DataFrame, cfg: JdbcSinkConfig, batch_id: str) -> None:
    """Delete any prior rows of `batch_id`, then bulk-append — re-running
    a failed load converges instead of duplicating (loader.py:230-252).
    A missing table (very first load) is not an error."""
    try:
        execute_statement(df.sparkSession, cfg, delete_batch_sql(cfg.table, batch_id))
    except Exception as e:  # noqa: BLE001 — py4j wraps the SQL error
        if not any(m in str(e) for m in _MISSING_TABLE_MARKERS):
            raise
    write_variants_jdbc(df, cfg, mode="append")
