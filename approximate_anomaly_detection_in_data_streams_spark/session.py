"""SparkSession construction with the engine's standard settings."""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "aads-spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    driver_memory: str | None = None,
    extra: dict[str, str] | None = None,
    master: str | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession tuned for this engine.

    ``master`` resolution order: explicit argument, $SPARK_GRAFT_MASTER,
    then — ONLY when not running under spark-submit — ``local[cores]``.
    Under spark-submit (detected via the PYSPARK_GATEWAY_PORT env the
    PythonRunner sets for the driver script) no master is forced, so the
    submitted ``--master`` / cluster manager wins; forcing local[n] there
    would silently turn a cluster job into a driver-local one.

    ``cores`` controls local parallelism (``local[cores]``); default comes
    from $SPARK_GRAFT_CPUS, falling back to all cores. Shuffle partitions
    default to 2x cores — at cluster scale this would instead be sized from
    input volume / target partition bytes; AQE coalesces the excess either
    way.
    """
    if cores is None:
        cores = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or os.cpu_count() or 4
    if shuffle_partitions is None:
        shuffle_partitions = max(2 * cores, 8)
    # Keep glibc from returning large buffers to the kernel between Arrow
    # batches: concurrent mmap/page-fault storms are pathologically slow on
    # virtualized guests, and the Python workers re-allocate per batch.
    # (Workers inherit this env through the JVM -> daemon fork chain.)
    os.environ.setdefault("MALLOC_MMAP_THRESHOLD_", "1073741824")
    os.environ.setdefault("MALLOC_TRIM_THRESHOLD_", "1073741824")
    # ...and route Arrow allocations through that hoarding glibc pool
    # instead of the bundled jemalloc, whose purge/refault cycle is
    # page-fault-bound on this guest REGARDLESS of core count (measured:
    # alloc+touch+free of 8 MB buffers aggregates ~18-20 GB/s flat at
    # 8-32 procs under jemalloc — even with decay disabled — vs
    # 2271 GB/s @ 8 procs and 7044 GB/s @ 32 procs under the system pool,
    # which reuses pages from freelists and therefore scales WITH procs).
    # This was the dominant N->4N anti-scaling term: Arrow IPC read
    # buffers and kernel outputs are freed and refaulted every batch.
    os.environ.setdefault("ARROW_DEFAULT_MEMORY_POOL", "system")
    if master is None:
        master = os.environ.get("SPARK_GRAFT_MASTER")
    builder = SparkSession.builder
    if master:
        builder = builder.master(master)
    elif "PYSPARK_GATEWAY_PORT" not in os.environ:
        builder = builder.master(f"local[{cores}]")
    builder = (
        builder.appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # this engine's post-decode shuffles carry narrow digest/count
        # rows; the 64 MB default advisory size coalesces them to 1-3
        # partitions and serializes mid-pipeline aggregations. Env
        # override is an A/B knob only (BENCH.md micro-regression audit).
        .config(
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            os.environ.get("AADS_ADVISORY_BYTES", "8m"),
        )
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # bound the transient per-batch allocation in Python workers
        # (binary image rows are wide; 10k-row default batches are ~300MB)
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "2048")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", driver_memory or os.environ.get("AADS_DRIVER_MEM", "8g"))
    )
    # Pinned-budget runs (scripts/bench_scaling.py) export $AADS_JAVA_OPTS
    # (e.g. -XX:ActiveProcessorCount=N): a taskset-bounded JVM otherwise
    # sizes GC/JIT/common pools for the MACHINE's 32 cores — 23 parallel
    # GC threads thrashing a 4-core budget — where a real N-core executor
    # host would report N processors to the JVM.
    java_opts = os.environ.get("AADS_JAVA_OPTS")
    if java_opts:
        builder = builder.config("spark.driver.extraJavaOptions", java_opts)
    for key, value in (extra or {}).items():
        builder = builder.config(key, value)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
