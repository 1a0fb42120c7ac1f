"""Continuous VCF ingestion: watch a directory, load new files into the
variant store as they land.

The reference's loader is invoked per file by hand (cli.load); the
streaming twin turns the same load into a standing pipeline: a
`binaryFile` file-source stream discovers NEW files (checkpoint-tracked,
so each file is seen exactly once), and foreachBatch hands their paths
to the ordinary batch loader — full parse/decompose/normalize through
read_vcf, audit rows, and content-hash skip semantics included.

Two layers of exactly-once, matching streaming/sink.py's reasoning:
the source's checkpoint prevents re-discovery, and VariantStore.load's
content-hash audit makes a replayed file a skip rather than a duplicate
batch — so even a crash between "file parsed" and "checkpoint advanced"
converges (sources/store.py find_existing).

Scale notes: the stream carries only file PATHS through the driver
(content is read by the cluster-side scan in read_vcf — binaryFile's
content column is dropped before any action); `maxFilesPerTrigger`
bounds per-batch work; each file's parse is the same fully-parallel
scan as a batch load (BGZF range reader for .vcf.gz).
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from vcf_pg_loader_spark.sources.store import LoadResult, VariantStore


class VCFIngestStream:
    """Standing ingest pipeline: directory -> VariantStore."""

    def __init__(
        self,
        spark: SparkSession,
        store: VariantStore,
        watch_dir: str,
        pattern: str = "*.vcf*",
        normalize: bool = True,
        features: str = "auto",
    ):
        self.spark = spark
        self.store = store
        self.watch_dir = watch_dir.rstrip("/")
        self.pattern = pattern
        self.normalize = normalize
        self.features = features
        self.loaded: list[LoadResult] = []

    def _apply_batch(self, batch_df, batch_id: int) -> None:
        from vcf_pg_loader_spark.sources.vcf import read_vcf

        # paths only — binaryFile also carries `content`, which must never
        # be collected; the real read happens cluster-side in read_vcf
        paths = [r.path for r in batch_df.select("path").collect()]
        for path in sorted(paths):
            local = path.removeprefix("file:")
            res = self.store.load(
                read_vcf(
                    self.spark,
                    local,
                    normalize=self.normalize,
                    features=self.features,
                ),
                local,
            )
            self.loaded.append(res)

    def start(self, checkpoint: str, available_now: bool = True):
        files = (
            self.spark.readStream.format("binaryFile")
            # binaryFile's fixed schema, required explicitly for streams
            .schema(
                "path string, modificationTime timestamp, "
                "length long, content binary"
            )
            .option("pathGlobFilter", self.pattern)
            .load(self.watch_dir)
        )
        writer = files.writeStream.foreachBatch(self._apply_batch).option(
            "checkpointLocation", checkpoint
        )
        if available_now:
            writer = writer.trigger(availableNow=True)
        return writer.start()
