"""SparkSession factory tuned for the dedup engine.

Local mode here; the same builder settings apply on a real cluster (AQE,
Arrow, skew-join). Iceberg catalog support is gated behind an import-try —
the runtime image carries no Iceberg jars, so stage checkpoints fall back to
plain Parquet (see checkpoint.py); on a cluster with the Iceberg runtime jar,
``iceberg_configs`` supplies the catalog settings the north rule expects.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def iceberg_configs(warehouse: str, catalog: str = "local") -> dict[str, str]:
    """Catalog config for an Iceberg Hadoop catalog (only usable when
    org.apache.iceberg:iceberg-spark-runtime is on the classpath)."""
    return {
        f"spark.sql.catalog.{catalog}": "org.apache.iceberg.spark.SparkCatalog",
        f"spark.sql.catalog.{catalog}.type": "hadoop",
        f"spark.sql.catalog.{catalog}.warehouse": warehouse,
        "spark.sql.extensions":
            "org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions",
    }


def has_iceberg(spark: SparkSession) -> bool:
    try:
        spark._jvm.java.lang.Class.forName("org.apache.iceberg.spark.SparkCatalog")
        return True
    except Exception:
        return False


def _tune_worker_malloc() -> None:
    """Make Python-worker numpy allocations REUSE memory instead of
    mmap/munmap-ing per batch. glibc mmaps allocations over ~128KB and
    returns them to the OS on free, so every Arrow batch's numpy temporaries
    are fresh pages — on hosts with slow first-touch (ballooned VMs; this
    sandbox serializes faults at ~6MB/s) that dominates the whole pipeline
    and ANTI-scales with worker count (32 workers fault 4x the pages of 8).
    Raising the mmap threshold and disabling trim keeps freed memory in the
    worker's heap for reuse. Must run BEFORE the JVM (workers' parent) spawns."""
    os.environ.setdefault("MALLOC_MMAP_THRESHOLD_", str(1 << 30))
    os.environ.setdefault("MALLOC_TRIM_THRESHOLD_", str(1 << 30))


def get_spark(
    app_name: str = "lsh_cascade_poc_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    _tune_worker_malloc()
    master = master or os.environ.get("SPARK_GRAFT_MASTER") or "local[%s]" % (
        os.environ.get("SPARK_GRAFT_CPUS", "32")
    )
    if shuffle_partitions is None:
        # local[N] -> N; anything else -> 2x default parallelism is a
        # reasonable floor for the band self-join shuffles
        n = master[master.find("[") + 1 : master.find("]")] if "[" in master else "32"
        shuffle_partitions = 32 if n == "*" else max(8, int(n))

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.default.parallelism", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # 2048 (not the 10000 default): multi-KB documents make 10k-row Arrow
        # batches ~40MB+; with 32 concurrent workers the transient allocations
        # overwhelm this host's serialized fault handler (UDF kernels ALSO
        # re-chunk internally — see functions/signature_udf.py)
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "2048")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        # a crashed Python worker should leave a traceback, not a bare
        # "exited unexpectedly" (r1's bench died blind in stage 262)
        .config("spark.python.worker.faulthandler.enabled", "true")
        .config("spark.sql.execution.pyspark.udf.faulthandler.enabled", "true")
        # do NOT force frequent JVM GC (periodicGC / System.gc()): G1 full
        # collections UNCOMMIT heap regions, and re-faulting them is the
        # expensive thing on this host. Block hygiene is explicit unpersist
        # (pipeline.py persist_registry), not GC pressure.
        # keep the G1 heap at its high-water mark — uncommitted regions would
        # be re-faulted at ~6MB/s on this host
        .config("spark.driver.extraJavaOptions",
                "-XX:MaxHeapFreeRatio=100 -XX:MinHeapFreeRatio=20")
        .config("spark.ui.enabled", "false")
        # 8MB, NOT bigger: building a broadcast relation is SERIAL driver
        # work (collect + build + serialize before any task runs). At 64MB
        # AQE broadcast the ~50MB candidate side of the overlap text joins
        # and the driver stalled ~5s per join with zero tasks running —
        # pure parallelism-independent overhead (and at cluster scale, a
        # 64MB blob shipped to every executor). Mid-size relations belong
        # in shuffle joins, which scale with executors.
        .config("spark.sql.autoBroadcastJoinThreshold", str(8 * 1024 * 1024))
        .config("spark.sql.adaptive.autoBroadcastJoinThreshold",
                str(8 * 1024 * 1024))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
