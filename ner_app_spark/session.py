"""SparkSession factory with scale-oriented defaults.

Defaults target the sandbox (local[N], single JVM) but every knob is the
one you would set on a 1000-executor cluster: AQE on (runtime re-plan,
skew-join splitting, partition coalescing), Arrow on (all Python
boundaries are vectorized batches), UTC session timezone (the reference
stores UTC, /root/reference/src/database/models.py:10-11; display-tz
conversion is a presentation concern, config.py:17).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CONF = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.session.timeZone": "UTC",
    # Arrow batch size governs mapInPandas batch shape: big enough to
    # amortize per-batch Python overhead, small enough to bound memory.
    "spark.sql.execution.arrow.maxRecordsPerBatch": "2048",
    "spark.ui.enabled": "false",
    "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"),
    # Task-memory page size: the default scales with heap (~28 MB pages
    # at 24g/32 cores) and every hash-agg/sort task zeroes whole pages —
    # measured 6-8x slowdown from allocation churn with many concurrent
    # tasks on small-to-mid partitions. 4 MB keeps allocation
    # proportional to actual data.
    "spark.buffer.pageSize": "4m",
    # Parquet sink codec: zstd writes ~41% fewer bytes than snappy for
    # the fused KG table at equal-or-better wall (interleaved min-of-3 at
    # local[32], 20k pages: snappy 13.7s/72.7MB, zstd 11.8s/42.8MB, lz4
    # 10.3s/71.0MB, uncompressed 11.3s/338.7MB). Bytes are the scaling
    # currency: the local sink is DRAM-backed tmpfs and a real warehouse
    # is NIC+object-store bound, so the smallest stream that doesn't cost
    # wall wins; zstd is also the common Iceberg table default.
    "spark.sql.parquet.compression.codec": "zstd",
}


def cpu_count() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def local_df(spark: SparkSession, rows: list, schema: str):
    """Small driver-local dimension table -> DataFrame via the Arrow path.

    ``createDataFrame(list_of_rows)`` plans a Python-RDD scan: every
    action re-runs ``defaultParallelism`` Python worker tasks just to
    re-serialize a few hundred rows — measured ~1-6 s per broadcast
    rebuild at local[32], the dominant cost of small-dim joins. Routing
    through pandas + Arrow materializes the rows JVM-side once;
    coalesce(1) keeps a 700-row dimension from being scheduled as 32
    tasks."""
    import pandas as pd

    pdf = pd.DataFrame(list(rows), columns=_schema_field_names(schema))
    return spark.createDataFrame(pdf, schema=schema).coalesce(1)


def _schema_field_names(schema: str) -> list[str]:
    """Field names from a DDL schema string, splitting on TOP-LEVEL commas
    only — ``decimal(18,4)`` / ``map<k,v>`` / struct types contain commas
    that a naive split would break on."""
    names: list[str] = []
    depth = 0
    field: list[str] = []
    for ch in schema + ",":
        if ch in "<(":
            depth += 1
        elif ch in ">)":
            depth -= 1
        elif ch == "," and depth == 0:
            names.append("".join(field).strip().split()[0])
            field = []
            continue
        field.append(ch)
    return names


def _free_gib(path: str) -> float:
    try:
        st = os.statvfs(path)
        return st.f_bavail * st.f_frsize / 2**30
    except OSError:
        return 0.0


def scratch_base() -> str:
    """Base dir for scratch parquet spills: tmpfs when it has >= 8 GiB
    free (same gate as the shuffle-dir rule below — /tmp is a slow virtio
    disk on this host), else /tmp. Shared by plans.pipeline and bench
    (round-3 ADVICE #3: one helper, not three copies). The 8 GiB gate is
    a point-in-time check, not a reservation — callers spilling unbounded
    data should prefer an explicit workdir."""
    base = "/dev/shm" if os.path.isdir("/dev/shm") else "/tmp"
    if _free_gib(base) < 8.0:
        base = "/tmp"
    return base


def get_session(
    app_name: str = "ner-app-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    cpus = cpu_count()
    master = master or os.environ.get("SPARK_GRAFT_MASTER") or f"local[{cpus}]"
    builder = SparkSession.builder.appName(app_name).master(master)
    conf = dict(DEFAULT_CONF)
    # local-mode shuffle files on tmpfs: /tmp sits on a slow virtio disk
    # here, and shuffle-block mmap/write syscalls serialize under many
    # task threads (measured: anti-scaling local[8] -> local[32]). On a
    # real cluster this is the executors' fast local SSD, not a conf.
    # Gated on free space (>= 8 GiB) so a large spill never competes with
    # executor heap for host RAM (round-1 ADVICE) — falls back to the
    # default local dir otherwise; SPARK_GRAFT_LOCAL_DIR overrides.
    shm = os.environ.get("SPARK_GRAFT_LOCAL_DIR", "/dev/shm/spark-local")
    parent = os.path.dirname(shm) or "/"
    if os.path.isdir(parent) and _free_gib(parent) >= 8.0:
        os.makedirs(shm, exist_ok=True)
        conf.setdefault("spark.local.dir", shm)
    conf["spark.sql.shuffle.partitions"] = str(shuffle_partitions or cpus)
    conf["spark.default.parallelism"] = str(cpus)
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
