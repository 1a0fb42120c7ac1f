"""JDBC (Postgres) sink — the reference's binary-COPY bulk path
(loader.py:492-516, db_loader.py:11-78) re-expressed as tuned JDBC batch
writes, per BASELINE.json ("Spark DataFrame parsing and JDBC bulk
writes").

No Postgres is available in this environment, so everything here is
config assembly + write-plan construction; the write itself is exercised
only when a URL is supplied.  Idempotent reload (delete batch then
append) mirrors loader.py:230-252 via a pre-delete statement.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame


@dataclass
class JdbcSinkConfig:
    url: str  # jdbc:postgresql://host:port/db
    table: str = "variants"
    user: str | None = None
    password: str | None = None
    batch_size: int = 30_000  # reference's optimal COPY batch
    num_partitions: int = 8  # parallel connections (pool analogue)

    def options(self) -> dict[str, str]:
        opts = {
            "url": self.url,
            "dbtable": self.table,
            "batchsize": str(self.batch_size),
            "numPartitions": str(self.num_partitions),
            "driver": "org.postgresql.Driver",
            # rewrite INSERTs into multi-row batches server-side — the
            # closest JDBC gets to binary COPY throughput
            "reWriteBatchedInserts": "true",
            "stringtype": "unspecified",
        }
        if self.user:
            opts["user"] = self.user
        if self.password:
            opts["password"] = self.password
        return opts


def write_variants_jdbc(
    df: DataFrame, cfg: JdbcSinkConfig, mode: str = "append"
) -> None:
    """Bulk-append a variants frame over `numPartitions` connections."""
    (
        df.repartition(cfg.num_partitions)
        .write.format("jdbc")
        .options(**cfg.options())
        .mode(mode)
        .save()
    )


def delete_batch_sql(table: str, batch_id: str) -> str:
    """Idempotent-reload pre-delete (loader.py:249-252); execute via any
    Postgres client before re-appending the batch."""
    safe = batch_id.replace("'", "''")
    return f"DELETE FROM {table} WHERE load_batch_id = '{safe}'"
