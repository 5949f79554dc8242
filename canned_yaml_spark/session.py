"""SparkSession factory tuned for this engine.

Local-mode settings follow the sandbox brief; at cluster scale the
same builder is driven by spark-submit conf instead. AQE stays on so
skewed partitions are re-planned at runtime (backstop for explicit
salting, SURVEY.md §2.2 #24)."""

from __future__ import annotations

import os

from pyspark import SparkConf
from pyspark.sql import SparkSession


def _submitted_master() -> str | None:
    """The master spark-submit (or the environment) already chose, if any.

    Builder-level .master() OVERRIDES `spark-submit --master`, so the
    factory must not set one when the launcher did — otherwise
    `spark-submit --master yarn --py-files canned_yaml_spark.zip ...`
    (the north-rule launch contract) silently runs local-mode on the
    driver host. Detection: spark-submit's PythonRunner launches this
    process with PYSPARK_GATEWAY_PORT pointing at a JVM that already
    holds the submitted conf as system properties — connect to it
    (cheap, the port is open) and read spark.master. Under a bare
    `python` invocation neither signal exists and the sandbox default
    applies. (Pre-gateway SparkConf() is a plain dict and can NOT see
    submitted properties, hence the explicit _ensure_initialized.)
    """
    if os.environ.get("MASTER"):
        return os.environ["MASTER"]
    if "PYSPARK_GATEWAY_PORT" not in os.environ:
        return None
    from pyspark import SparkContext
    SparkContext._ensure_initialized()
    return SparkConf().get("spark.master", None)


def get_spark(app: str = "canned_yaml_spark",
              cores: int | None = None,
              shuffle_partitions: int | None = None,
              extra_conf: dict | None = None) -> SparkSession:
    cores = cores or int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    shuffle_partitions = shuffle_partitions or max(cores, 8)
    # shuffle/spill on tmpfs when available: this sandbox's /tmp is a
    # throttled cloud disk that serializes shuffle I/O across all
    # cores (production executors have local NVMe). Override with
    # SPARK_LOCAL_DIRS.
    local_dir = os.environ.get("SPARK_LOCAL_DIRS")
    if not local_dir and os.path.isdir("/dev/shm"):
        local_dir = "/dev/shm/spark-tmp"
        os.makedirs(local_dir, exist_ok=True)
    b = (
        SparkSession.builder
        .appName(app)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "48g"))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "8192")
        # whole-stage codegen deactivates above this many fields
        # (default 100) — the K=130 minhash signature aggregation then
        # runs interpreted at ~2x the cost (measured 7.9 s -> 4.4 s on
        # the sf0.1 dedup corpus). 260 covers every schema this engine
        # builds (widest: 130 agg buffers) with generated-code size
        # still far under JIT limits; scale-independent setting.
        .config("spark.sql.codegen.maxFields", "260")
        .config("spark.ui.enabled", "false")
        # shuffle files live until the ContextCleaner GCs their
        # dependencies; the 30min default lets a many-job driver
        # accumulate tens of GB of dead shuffle on spark.local.dir —
        # fatal when that dir is tmpfs (counts against RAM)
        .config("spark.cleaner.periodicGC.interval", "45s")
    )
    if _submitted_master() is None:
        # sandbox / bare-python default; a spark-submit launch keeps
        # the --master it was given (see _submitted_master)
        b = b.master(f"local[{cores}]")
    if local_dir:
        b = b.config("spark.local.dir", local_dir)
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
