"""SparkSession factory tuned for the sandbox (local[N]) but with the
settings we would ship on a real cluster: AQE on (skew-join + partition
coalescing), Arrow on (all our UDFs are pandas UDFs), shuffle
partitions sized to cores rather than the 200 default.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def _export_pythonpath() -> None:
    """Make the package importable by Spark's Python workers no matter
    where the driver script lives.  Local-mode workers inherit the
    driver env, so prepending our parent dir to PYTHONPATH suffices; on
    a real cluster ship the package with ``spark-submit --py-files``."""
    pkg_parent = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pp = os.environ.get("PYTHONPATH", "")
    if pkg_parent not in pp.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            pkg_parent + (os.pathsep + pp if pp else ""))


def get_spark(app: str = "lucene_1_spark", cores: int | None = None,
              shuffle_partitions: int | None = None) -> SparkSession:
    cores = cores or int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    shuffle_partitions = shuffle_partitions or cores
    _export_pythonpath()
    spark = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(app)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "48g"))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    _warm_python_workers(spark, cores)
    return spark


def _warm_python_workers(spark: SparkSession, cores: int) -> None:
    """Spawn the reusable Python worker pool at session creation.

    The FIRST Arrow/pandas job of a session pays the whole worker-pool
    spawn (~5 s measured at local[8]); with
    ``spark.python.worker.reuse`` (the default) every later job reuses
    the pool.  Paying it here — session initialization, where JVM
    startup already lives — instead of inside whichever operator
    happens to run first keeps per-operator timings honest and cuts the
    first query/build latency.  Guarded so repeated ``get_spark`` calls
    on a live session cost nothing.  Disable with
    SPARK_GRAFT_NO_WARMUP=1 (e.g. for sessions that never run a Python
    kernel)."""
    if os.environ.get("SPARK_GRAFT_NO_WARMUP") == "1":
        return
    try:
        if spark.conf.get("spark.lucene_1_spark.workers_warm", None):
            return
    except Exception:
        pass

    def _ident(it):
        # pre-import the kernel dependencies so the reused workers
        # don't pay module import latency inside the first real job
        import numpy  # noqa: F401
        import pandas  # noqa: F401
        try:
            import lucene_1_spark.functions.bm25  # noqa: F401
            import lucene_1_spark.functions.codecs  # noqa: F401
            import lucene_1_spark.analysis.standard  # noqa: F401
        except Exception:
            pass
        for pdf in it:
            yield pdf

    try:
        (spark.range(int(cores)).repartition(int(cores))
         .mapInPandas(_ident, "id long").collect())
        spark.conf.set("spark.lucene_1_spark.workers_warm", "1")
    except Exception:
        pass  # warmup is best-effort; never block session creation
