"""Table source adapters: Iceberg-first with parquet fallback.

The production deployment (north_rule) reads trillion-row **Iceberg**
image+caption tables; this sandbox has no Iceberg runtime jar, so the
loader degrades gracefully to parquet paths while keeping the
Iceberg-specific behaviors in one place:

  * snapshot pinning (``snapshot_id``/``as_of``) for reproducible
    validation runs — a resumed run must see the same snapshot it
    started on (checkpoint.py records it in the ledger fingerprint);
  * partition-pruning pushdown: the validator's per-partition loop
    filters on the table's partition column (``fmt``); with Iceberg this
    prunes manifests/files, with parquet it prunes row groups via
    min/max stats — both visible in .explain as PushedFilters;
  * column projection: ``columns`` keeps wide binary payloads out of
    scans that only need metadata.

Runtime-jar status (checked each round): no ``iceberg-spark-runtime``
jar exists anywhere in this sandbox (``find / -iname '*iceberg*'`` hits
nothing), ``pyiceberg`` is not installed, and the container has no
network (``pip download pyiceberg`` and Maven Central are both
unreachable), so the Iceberg route of ``load_table`` cannot be
integration-tested here. The seam is deliberately one function with the
format string and snapshot option in one place; a production deployment
adds ``--packages org.apache.iceberg:iceberg-spark-runtime-3.5_2.13``
(or drops the jar in ``$SPARK_HOME/jars``) and
``iceberg_available`` flips to True with no code change.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def iceberg_available(spark: SparkSession) -> bool:
    # NOTE: a bare `spark._jvm.org.apache.iceberg.Table` attribute probe is
    # WRONG — py4j resolves missing classes to a lazy JavaPackage without
    # raising, so it reports available on every JVM (latent r3 bug, caught
    # by tests/test_snapshot_resume.py). Class.forName actually loads the
    # class and raises through py4j when the runtime jar is absent.
    try:
        spark._jvm.java.lang.Class.forName("org.apache.iceberg.Table")
        return True
    except Exception:
        return False


def load_table(
    spark: SparkSession,
    path_or_table: str,
    snapshot_id: int | None = None,
    columns: list[str] | None = None,
) -> DataFrame:
    """Load an Iceberg table (catalog name or path) or a parquet path.

    Iceberg route honors ``snapshot_id`` (time travel); the parquet
    fallback ignores it (parquet has no snapshots — immutability must be
    guaranteed by the caller's layout, e.g. write-once run directories).
    """
    if iceberg_available(spark) and not path_or_table.endswith(".parquet"):
        reader = spark.read.format("iceberg")
        if snapshot_id is not None:
            reader = reader.option("snapshot-id", str(snapshot_id))
        df = reader.load(path_or_table)
    else:
        df = spark.read.parquet(path_or_table)
    if columns:
        df = df.select(*columns)
    return df
