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


def get_spark(
    app_name: str = "lsh_cascade_poc_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
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
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        # a crashed Python worker should leave a traceback, not a bare
        # "exited unexpectedly" (r1's bench died blind in stage 262)
        .config("spark.python.worker.faulthandler.enabled", "true")
        .config("spark.sql.execution.pyspark.udf.faulthandler.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
