"""Iceberg corpus source (north-star input: an Iceberg table of
source-code repositories (repo, path, commit, lang, content)).

Spark-first: `spark.read.format("iceberg")` hands the scan to Iceberg's
DataSourceV2 relation, so partition pruning, hidden-partition transform
pruning, and column projection all happen from table metadata before a
single data file is opened — the engine's filters (e.g. lang = 'py')
push down the same way they do against parquet, but against the
manifest tree instead of a directory listing. Snapshot pinning makes
index builds REPRODUCIBLE: an index built from snapshot S can be
rebuilt bit-identically later regardless of concurrent commits, and
the snapshot id is recorded in the index lineage (jobs/build_index_job
meta) so "which data produced this index" is answerable from the
artifact alone.

The sandbox has no Iceberg runtime on the classpath, so these helpers
fail with an actionable error instead of Spark's raw ClassNotFound —
the code path up to the DataSource resolution is exercised by
tests/test_pipeline_ops.py.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession

_RUNTIME_HINT = (
    "Iceberg runtime not on the Spark classpath. Submit with e.g. "
    "--packages org.apache.iceberg:iceberg-spark-runtime-3.5_2.12:<ver> "
    "and a configured catalog (spark.sql.catalog.<name>=...)."
)


def read_iceberg_corpus(
    spark: SparkSession,
    table: str,
    snapshot_id: Optional[int] = None,
    as_of_timestamp_ms: Optional[int] = None,
) -> DataFrame:
    """Load an Iceberg table (optionally time-traveled) as the corpus.

    snapshot_id: pin the scan to one immutable snapshot (reproducible
    index builds + lineage); as_of_timestamp_ms: time-travel to the
    snapshot current at that epoch-millis instant. At most one may be
    given (Iceberg rejects both).
    """
    if snapshot_id is not None and as_of_timestamp_ms is not None:
        raise ValueError("pass snapshot_id or as_of_timestamp_ms, not both")
    reader = spark.read.format("iceberg")
    if snapshot_id is not None:
        reader = reader.option("snapshot-id", str(int(snapshot_id)))
    if as_of_timestamp_ms is not None:
        reader = reader.option("as-of-timestamp", str(int(as_of_timestamp_ms)))
    try:
        return reader.load(table)
    except Exception as e:  # surface a setup hint, keep the cause
        msg = str(e)
        if (
            "iceberg" in msg.lower()
            and ("ClassNotFound" in msg or "Failed to find" in msg
                 or "data source" in msg.lower())
        ):
            raise RuntimeError(_RUNTIME_HINT) from e
        raise


def current_snapshot_id(spark: SparkSession, table: str) -> Optional[int]:
    """Latest committed snapshot id via the `<table>.snapshots` metadata
    table — the id a build job records in its lineage when none was
    pinned explicitly. One metadata-only query; no data files touched."""
    rows = spark.sql(
        f"SELECT snapshot_id FROM {table}.snapshots "
        "ORDER BY committed_at DESC LIMIT 1"
    ).collect()
    return int(rows[0]["snapshot_id"]) if rows else None
