"""SparkSession factory tuned for the engine.

Local-mode defaults mirror what we'd set on a real cluster: AQE on
(runtime re-plan + skew-join splitting replaces Halyard's manual
forkAndFilterBy parallel split, tools/.../ParallelSplitFunction.java:52-70),
shuffle partitions sized to cores (not the 200 default), Arrow enabled for
every pandas-UDF exchange.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import SparkSession

DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def _local_dir() -> str:
    shm = "/dev/shm/spark-local"
    try:
        os.makedirs(shm, exist_ok=True)
        return shm
    except OSError:
        return tempfile.gettempdir()


def _ship_package(spark: SparkSession) -> None:
    """Ship halyard_spark to executors (the `spark-submit --py-files` analog).

    mapInPandas closures reference this package by module name; workers
    must be able to import it no matter where the driver was launched.
    """
    import hashlib

    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    # CONTENT-ADDRESSED zip name: the cache key hashes every source
    # file's (path, mtime, size), so editing the package invalidates the
    # shipped copy (an existence-only check made workers run stale code
    # after any edit) and concurrent drivers with identical sources
    # share one artifact safely.
    h = hashlib.sha1()
    for root, _, files in sorted(os.walk(pkg_dir)):
        for f in sorted(files):
            if not f.endswith(".py"):
                continue
            fp = os.path.join(root, f)
            st = os.stat(fp)
            h.update(f"{fp}:{st.st_mtime_ns}:{st.st_size}".encode())
    zip_base = os.path.join(
        tempfile.gettempdir(), f"halyard_spark_pyfiles_{h.hexdigest()[:16]}"
    )
    zip_path = zip_base + ".zip"
    if not os.path.exists(zip_path):
        # build under a unique temp name, then atomic rename: a racing
        # driver never observes (or ships) a truncated zip
        tmp = shutil.make_archive(
            f"{zip_base}.{os.getpid()}", "zip", os.path.dirname(pkg_dir), "halyard_spark"
        )
        os.replace(tmp, zip_path)
    spark.sparkContext.addPyFile(zip_path)


def get_spark(
    cpus: int | None = None,
    app_name: str = "halyard_spark",
    shuffle_partitions: int | None = None,
    driver_memory: str | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession.

    At cluster scale these same configs apply; only ``master`` changes to
    YARN/K8s.  AQE handles runtime coalescing and skew-join splitting so a
    plan tuned at sf0.01 still holds at 100 TB.
    """
    cpus = cpus or DEFAULT_CPUS
    shuffle_partitions = shuffle_partitions or max(cpus, 8)
    aqe = os.environ.get("SPARK_GRAFT_AQE", "1") == "1"
    # Shuffle WIDTH must scale with data volume, not core count — but NOT
    # via a blanket-high initialPartitionNum: a 1024 default (tried after
    # the sf1.0 spill rehearsal) turned every small-scale shuffle into
    # ~1024 tiny tasks and cost 5-20x on shuffle-iterating stages (CC
    # rounds, LSH band joins, the triples build) — scheduling and
    # per-task overhead, not data, dominated.  Width is instead sized
    # per JOB from the job's own input volume: run_pipeline calls
    # adaptive_shuffle_width(...) and sets spark.sql.shuffle.partitions
    # (a runtime conf) before its stages, so the sf1.0 corpus gets
    # hundreds of sort partitions (no external-sort spill wall) while
    # bench/test scales keep the core-count width that measured fastest.
    # The env knob remains for experiments.
    initial_partitions = os.environ.get("SPARK_GRAFT_INITIAL_PARTITIONS")
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", str(aqe).lower())
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", driver_memory or os.environ.get("SPARK_GRAFT_DRIVER_MEM", "64g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.sql.parquet.aggregatePushdown", "true")
        # shuffle/spill on tmpfs when available: local-mode shuffles are
        # disk round-trips on the driver host; a cluster has fast local
        # SSDs per executor.  Keeps CPU scaling measurements honest.
        .config("spark.local.dir", _local_dir())
    )
    if initial_partitions:
        builder = builder.config(
            "spark.sql.adaptive.coalescePartitions.initialPartitionNum",
            initial_partitions,
        )
    # Compression codec knob (shuffle + parquet together): on a
    # bandwidth-bound host, trading abundant CPU for scarce memory
    # bandwidth (zstd) is the same lever a 100-TB cluster pulls to keep
    # shuffle volume off the network.  Unset = Spark defaults
    # (lz4 shuffle, snappy parquet).
    codec = os.environ.get("SPARK_GRAFT_CODEC")
    if codec:
        builder = (
            builder.config("spark.io.compression.codec", codec)
            .config("spark.sql.parquet.compression.codec", codec)
        )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try:
        _ship_package(spark)
    except Exception:
        pass  # already shipped in this context, or running from repo root
    return spark


def adaptive_shuffle_width(spark: SparkSession, df, expansion: float = 4.0,
                           target_mb: int = 128, cap: int = 4096) -> int:
    """Shuffle width sized to a job's INPUT volume.

    The sf1.0 rehearsal showed why width cannot be a session constant:
    at 20x the routine corpus every sort/join partition crossed the
    external-sort spill threshold (4-5x/unit super-linear stage walls),
    while a blanket-wide initialPartitionNum made small runs 5-20x
    slower in pure task overhead.  This sizes width from the bytes the
    job will actually shuffle: on-disk input size (parquet footers via
    inputFiles) times an ``expansion`` factor for decompression +
    row-object overhead, divided into ``target_mb`` partitions, floored
    at the session's core-count width and capped at ``cap``.  Callers
    set ``spark.sql.shuffle.partitions`` (a runtime conf) with the
    result before running their stages; AQE still coalesces the small
    tail stages below it.

    The floor is the session's CORE-COUNT width, not the current conf
    value: a prior wide job sets spark.sql.shuffle.partitions high, and
    flooring at the conf would ratchet every later small job up to that
    width permanently (code-review regression) — exactly the per-task
    overhead cliff this function exists to avoid.  Callers restore the
    conf after their run for the same reason.
    """
    try:
        floor = max(int(spark.sparkContext.defaultParallelism), 8)
    except Exception:
        floor = int(spark.conf.get("spark.sql.shuffle.partitions"))
    total = 0
    try:
        from urllib.parse import unquote, urlparse

        for uri in df.inputFiles():
            p = urlparse(uri)
            path = unquote(p.path) if p.scheme in ("file", "") else None
            if path and os.path.exists(path):
                total += os.path.getsize(path)
    except Exception:
        total = 0
    if total <= 0:
        try:  # in-memory / non-file source: Catalyst's own size estimate
            est = int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
            if 0 < est < (1 << 50):  # ignore the unknown-size sentinel
                total = est // 4  # plan stats are uncompressed-row sizes
        except Exception:
            total = 0
    if total <= 0:
        return floor
    width = int(total * expansion // (target_mb * 1024 * 1024)) + 1
    return max(floor, min(cap, width))


def widen_small_input(df, target: int | None = None, max_bytes_per_core: int = 8 * 1024 * 1024):
    """Round-robin repartition a TINY scan up to the session's core count.

    Guide §2.5 "input skew": a small table written as one parquet file
    scans as ONE task, so compute-heavy narrow chains over it (shingle
    explode + per-shingle hashing, simhash bit sums) serialize on a
    single core while 31 sit idle — measured 2x the whole query wall on
    dedup_minhash at sf0.1.  This widens exactly that case and is a
    deliberate NO-OP whenever the scan already parallelizes:

    - input bytes unknown (non-file source) or > target * max_bytes_per_core:
      a real corpus at scale gets its parallelism from scan splits, and
      round-robin repartitioning it would shuffle the full payload —
      the anti-pattern guide §8 warns about;
    - the scan already has >= target input files.

    Safe for results: round-robin repartition only changes row placement,
    and every caller aggregates with order-insensitive functions.
    """
    spark = df.sparkSession
    try:
        target = target or spark.sparkContext.defaultParallelism
    except Exception:
        return df
    try:
        files = df.inputFiles()
    except Exception:
        return df
    if not files or len(files) >= target:
        return df
    total = 0
    try:
        from urllib.parse import unquote, urlparse

        for uri in files:
            p = urlparse(uri)
            path = unquote(p.path) if p.scheme in ("file", "") else None
            if path is None or not os.path.exists(path):
                return df  # remote store: let scan splits decide
            total += os.path.getsize(path)
    except Exception:
        return df
    if total > target * max_bytes_per_core:
        return df
    return df.repartition(target)


def checkpoint_parallel(df, target: int | None = None):
    """Eager localCheckpoint whose materialized RDD keeps >= ``target``
    partitions (default: the session's core count).

    AQE's partition coalescing sizes post-shuffle output by BYTES, so a
    small-but-compute-heavy intermediate (LSH bucket frames, signature
    tables) materializes as ONE partition — and every downstream consumer
    of the checkpoint (join map sides, df-cap aggregations) then runs as a
    single serial task while the other cores idle (guide §2.5 input skew,
    measured ~1 s serial stages per consumer on dedup_minhash at sf0.1).
    When the checkpoint lands below ``target`` partitions it is, by the
    same coalescing logic, SMALL — so re-spreading it costs one tiny
    shuffle; frames that materialize wide (the 100 TB case) pass through
    untouched.

    The default target is a QUARTER of the core count (floor 8), not full
    width: an interleaved A/B measured full-width re-spreading ~0.3 s
    SLOWER cold (32 tiny tasks x 3 consumer stages of extra scheduling)
    while width 8 keeps the insurance — in degraded host windows the
    serial consumer stages were the dominant cost (~6 s), and 8-way
    spreading removes that tail for ~0.1 s in healthy windows."""
    ck = df.localCheckpoint(eager=True)
    spark = df.sparkSession
    try:
        target = target or max(8, spark.sparkContext.defaultParallelism // 4)
        n = ck.rdd.getNumPartitions()
    except Exception:
        return ck
    if n >= target:
        return ck
    return ck.repartition(target).localCheckpoint(eager=True)


def rebind_to_session(df, session: SparkSession):
    """Re-home a MATERIALIZED (checkpointed) DataFrame onto another
    SparkSession that shares the same SparkContext.

    ``SparkSession.newSession()`` gives an isolated SQL-conf clone — the
    supported way to run one computation under different runtime settings
    (e.g. a latency-tuned fixed-point loop) without mutating the conf that
    concurrently-running jobs on the caller's session are planned with.
    DataFrames are session-bound, so the clone needs its own frame over
    the already-materialized rows; wrapping the checkpointed InternalRow
    RDD costs nothing (no recompute, no Python boundary).  Callers MUST
    pass an eagerly-materialized frame (localCheckpoint) — rebinding a
    lazy plan would silently re-plan it under the target session's conf.
    """
    from pyspark.sql import DataFrame as _DF

    jdf = df._jdf
    jrdd = jdf.queryExecution().toRdd()
    new_jdf = session._jsparkSession.internalCreateDataFrame(jrdd, jdf.schema(), False)
    return _DF(new_jdf, session)


def stop_all() -> None:
    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
