"""Source/sink implementations (see package docstring for reference mapping)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def nano_timestamp_columns(path: str) -> list[tuple[str, bool]]:
    """(column, is_nanos) for timestamp columns of a parquet file/directory,
    from footer metadata only (no data read; safe at 100 TB — one driver-side
    footer fetch)."""
    try:
        import pyarrow.dataset as ds

        schema = ds.dataset(path, format="parquet").schema
        out = []
        for field in schema:
            t = str(field.type)
            if t.startswith("timestamp"):
                out.append((field.name, "[ns" in t))
        return out
    except Exception:  # noqa: BLE001 - footer probing is best-effort
        return []


def _parquet_scan_width(spark: SparkSession, path: str, cap: int) -> int | None:
    """Upper bound on the effective scan parallelism of a parquet source,
    from footer metadata only.

    Effective parallelism is bounded by BOTH byte-range splits
    (``spark.sql.files.maxPartitionBytes``) and row-group layout (a split
    only does work for row groups whose midpoint it contains, so one giant
    single-row-group file is one task however it is split). Driver cost is
    bounded: if the listing already shows >= ``cap`` files the scan cannot
    be narrow and no footer is opened."""
    try:
        import math
        import os

        import pyarrow.dataset as ds
        import pyarrow.parquet as pq

        files = list(ds.dataset(path, format="parquet").files)
        if len(files) >= cap:
            return cap
        max_bytes = parse_byte_size(
            spark.conf.get("spark.sql.files.maxPartitionBytes", None)
        )
        total_bytes = sum(os.path.getsize(f) for f in files)
        total_rgs = sum(pq.ParquetFile(f).metadata.num_row_groups for f in files)
        byte_splits = max(1, math.ceil(total_bytes / max_bytes))
        return min(byte_splits, max(1, total_rgs))
    except Exception:  # noqa: BLE001 - probing is best-effort
        return None


def parse_byte_size(value: str | None, default: int = 128 * 1024 * 1024) -> int:
    """Spark byte-size conf parser: bare bytes or a k/m/g/t/p suffix
    (optionally with ``b``, case-insensitive) — the same grammar Spark's
    ``JavaUtils.byteStringAsBytes`` accepts. A tuned conf like ``128m`` must
    not silently fall back to the default (it would mis-estimate scan
    narrowness); only an absent/unparseable value does."""
    if value is None:
        return default
    import re

    m = re.fullmatch(r"\s*(\d+)\s*([kmgtp]?)b?\s*", str(value), flags=re.IGNORECASE)
    if not m:
        return default
    mult = 1024 ** ("kmgtp".index(m.group(2).lower()) + 1) if m.group(2) else 1
    return int(m.group(1)) * mult


def rebalance_narrow_scan(df: DataFrame, path: str | None = None) -> DataFrame:
    """Round-robin repartition up to cluster parallelism when a scan yields
    fewer partitions than cores.

    Parquet scan parallelism is bounded by row-group layout: a single-row-
    group file is one task no matter how many executors exist, so an
    expensive per-row map stage downstream (HOF folds, pandas UDFs) runs
    nearly single-threaded. The guard makes this a no-op exactly when it
    would hurt: a 100 TB table already scans with thousands of partitions,
    so no extra shuffle is introduced there — only genuinely narrow inputs
    pay one tiny rebalancing exchange.

    Pass ``path`` when the source is a parquet location: narrowness is then
    decided from footer metadata alone (no ``df.rdd`` materialization — on a
    100 TB listing the RDD conversion plans the whole scan driver-side just
    to count partitions)."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if path is not None:
        width = _parquet_scan_width(df.sparkSession, path, cap=target)
        if width is not None:
            return df.repartition(target) if width < target else df
    if df.rdd.getNumPartitions() < target:
        df = df.repartition(target)
    return df


def read_parquet_table(spark: SparkSession, path: str) -> DataFrame:
    """Parquet with inferred schema. Nanosecond timestamps (which arrive as
    BIGINT nanos via ``spark.sql.legacy.parquet.nanosAsLong``) are converted
    to TIMESTAMP_NTZ at microsecond precision, matching DuckDB's truncation."""
    df = spark.read.parquet(path)
    dtypes = dict(df.dtypes)
    for col, is_ns in nano_timestamp_columns(path):
        if is_ns and dtypes.get(col) == "bigint":
            # backtick-quoted: a column named "event time" (or a reserved
            # word) would otherwise fail the whole table read at F.expr
            q = col.replace("`", "``")
            df = df.withColumn(
                col,
                F.expr(f"CAST(timestamp_micros(`{q}` DIV 1000) AS TIMESTAMP_NTZ)"),
            )
    return df


def read_csv_table(
    spark: SparkSession,
    path: str,
    schema: StructType | str | None = None,
    sep: str = ",",
    header: bool = True,
    mode: str = "PERMISSIVE",
) -> DataFrame:
    """``mode`` passes through to the CSV parser (round-14 reader
    hardening): the PERMISSIVE default nulls the columns of a malformed
    row SILENTLY — the right exploration default, but a pipeline joining
    on a nulled key loses rows invisibly; pass ``mode="FAILFAST"`` to
    make malformed input loud."""
    reader = (
        spark.read.option("sep", sep)
        .option("header", str(header).lower())
        .option("mode", mode)
    )
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", "true")
    return reader.csv(path)


def read_json_table(
    spark: SparkSession,
    path: str,
    schema: StructType | str | None = None,
    mode: str = "PERMISSIVE",
) -> DataFrame:
    """Newline-delimited JSON. Schema should be supplied in production:
    inference scans the data once extra, and at 100 TB that doubles the read
    — the inferred path is for exploration only. ``mode`` passes through
    to the JSON parser (``"FAILFAST"`` makes corrupt lines raise instead
    of silently nulling the row — round-14 reader hardening)."""
    reader = spark.read.option("mode", mode)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def write_json(df: DataFrame, path: str, compression: str = "gzip") -> None:
    df.write.mode("overwrite").option("compression", compression).json(path)


def read_orc_table(spark: SparkSession, path: str) -> DataFrame:
    """ORC source (columnar alternative to parquet; same pushdown/pruning
    machinery — ``spark.sql.orc.filterPushdown`` is on by default)."""
    return spark.read.orc(path)


def write_orc(df: DataFrame, path: str, compression: str = "zstd") -> None:
    df.write.mode("overwrite").option("compression", compression).orc(path)


def partitioned_write_width(spark: SparkSession, n_partitions: int) -> int:
    """Explicit shuffle width for the pre-repartition feeding a
    hive-partitioned write (optimization round 14, guide §2.4/§6).

    An UN-numbered ``repartition(F.col(...))`` is an AQE-coalescible
    exchange: inside a write job AQE materializes the shuffle as its own
    query stage, re-optimizes, and coalesces the (tiny at bench scale)
    output toward one partition — so a SINGLE task then creates every
    partition directory's file serially. Measured on the 47-list IVF base
    index write at sf0.1: 1.31 s un-numbered vs 0.74 s with an explicit
    width (any width 4..47 lands 0.68-0.80 s — the stage barrier, not the
    task count, is the cost). An explicit numPartitions pins the exchange
    (AQE leaves user-specified repartitions alone) and keeps the
    one-file-per-partition layout with parallel writers.

    ``min(session width, partition-dir count)`` is scale-adaptive: more
    tasks than output directories only adds empty tasks, and at 100 TB the
    directory count exceeds the session width so this degrades to exactly
    the session-wide shuffle the un-numbered spelling intended."""
    sess = int(spark.conf.get("spark.sql.shuffle.partitions"))
    return max(1, min(sess, n_partitions))


def overwrite_partitions(
    df: DataFrame, path: str, partition_by: list[str], compression: str = "zstd"
) -> None:
    """Incremental hive-layout write: replace ONLY the partitions present in
    ``df``, leaving all other partitions untouched (dynamic partition
    overwrite).

    The daily-ingest primitive at 100 TB: re-running one day's pipeline
    rewrites that day's directory instead of truncating the whole table
    (static overwrite mode would). The mode is a per-write
    DataFrameWriter option (it overrides the session conf), so the shared
    session is never mutated — safe under concurrent writers."""
    (
        df.write.mode("overwrite")
        .option("compression", compression)
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(*partition_by)
        .parquet(path)
    )


# Fingerprint modulus for persisted-table partition keys (prime, small
# enough that a sum of per-row residues stays far from int64 overflow at
# any realistic corpus size on the Spark side; DuckDB sums in HUGEINT).
FP_MOD = 1_000_003


def fp_fold(mn: int, mx: int, s: int) -> int:
    """Fold (min, max, sum-of-residues) of a key column into the content
    fingerprint used in persisted-table partition keys — must match
    :func:`duck_fp_sql`'s oracle-side fold exactly."""
    return (mn + 31 * mx + 17 * s) % FP_MOD


def duck_fp_sql(col: str) -> str:
    """The ONE DuckDB spelling of :func:`fp_fold` over key column ``col``
    (round-14 review: the fold was hand-copied per module, and each copy
    used DuckDB's C-style ``%`` — sign of the dividend — where Python's
    ``%`` is always non-negative, so NEGATIVE key ids would derive a
    different partition value per engine and the oracle would silently
    read zero rows). The outer fold is pmod-spelled; the per-row residues
    inside SUM stay C-style on BOTH engines (Spark's ``%`` matches
    DuckDB's there), so only the final fold needed the sign fix."""
    inner = (
        f"(COALESCE(MIN({col}), 0) + 31 * COALESCE(MAX({col}), 0)"
        f" + 17 * COALESCE(SUM({col} % {FP_MOD}), 0))"
    )
    return f"CAST((({inner} % {FP_MOD}) + {FP_MOD}) % {FP_MOD} AS BIGINT)"


def frame_fingerprint_stats(df: DataFrame, key: str) -> tuple[int, int, int]:
    """(row count, content fingerprint, max key) of ``df`` over integer
    column ``key`` — ONE aggregate pass shared by every persisted-table
    location keyer (the max rides along because the upsert callers need
    it for insert-id offsets anyway)."""
    row = df.agg(
        F.count("*").alias("n"),
        F.coalesce(F.min(key), F.lit(0)).alias("mn"),
        F.coalesce(F.max(key), F.lit(0)).alias("mx"),
        F.coalesce(F.sum(F.col(key) % FP_MOD), F.lit(0)).alias("s"),
    ).collect()[0]
    return (
        int(row["n"]),
        fp_fold(int(row["mn"]), int(row["mx"]), int(row["s"])),
        int(row["mx"]),
    )


def frame_fingerprint(df: DataFrame, key: str) -> tuple[int, int]:
    """(row count, content fingerprint) — see :func:`frame_fingerprint_stats`."""
    n, fp, _ = frame_fingerprint_stats(df, key)
    return n, fp


def warehouse_root() -> str:
    """Root directory for persisted index tables: repo-relative by
    default, overridable via ``$SPARK_GRAFT_WAREHOUSE`` (round-13 review
    — a fixed absolute path made the repo non-relocatable)."""
    import os

    default = os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
        "spark-warehouse",
    )
    return os.environ.get("SPARK_GRAFT_WAREHOUSE", default)


def drop_partition_dirs(spark: SparkSession, dirs: list[str]) -> None:
    """Drop emptied hive partition directories via the Hadoop FileSystem
    API — the DROP PARTITION companion of :func:`overwrite_partitions`
    (dynamic overwrite only replaces partitions PRESENT in the output, so
    a partition whose every row was removed keeps its stale directory
    unless dropped explicitly). The same FS abstraction every other
    read/write goes through, so the drop works wherever the table lives
    (HDFS/S3A/local), unlike a local-only ``shutil.rmtree`` (round-14
    review, ADVICE medium). A drop that fails must be LOUD, and the
    directory must be VERIFIED gone before returning: a stale partition
    would be served by every later read of the maintained table —
    swallowing the error converts a crash into silent corruption."""
    from ..errors import StorageError

    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()
    for d in dirs:
        p = jvm.org.apache.hadoop.fs.Path(d)
        fs = p.getFileSystem(hconf)
        if fs.exists(p):
            fs.delete(p, True)  # recursive
        if fs.exists(p):
            raise StorageError(
                f"failed to drop emptied partition directory {d}; a stale "
                "partition would be served by every later read of the "
                "maintained table"
            )


def read_tbl_table(
    spark: SparkSession,
    path: str,
    schema: StructType | str,
    strict: bool = True,
) -> DataFrame:
    """TPC-H ``.tbl``: pipe-delimited, no header, trailing ``|`` producing a
    placeholder column dropped on load (reference benchmarks/src/tpch/
    mod.rs:41-45, convert.rs:97-106).

    ``strict`` (default, round-14 reader hardening) makes a row with
    missing or extra fields RAISE at scan time instead of silently
    parsing to NULLs — a .tbl row whose key column nulls out just
    vanishes from every downstream join, the worst failure shape for
    benchmark data whose row counts are the ground truth. The CSV parser
    cannot express this check: Spark documents that a token-count
    mismatch is NOT "corruption" (FAILFAST ignores it), and Univocity
    normalizes the empty trailing token to NULL regardless of
    nullValue/emptyValue, so a padding-column probe cannot tell a
    well-formed row from a short one. ``.tbl`` has no quoting or escapes,
    so strict mode parses structurally instead — ``spark.read.text`` +
    ``split`` on ``|`` IS a faithful parser for this format — and
    validates that every line carries exactly ``n_fields`` pipe-terminated
    tokens, raising through a ``raise_error`` CASE wrapped around every
    projected column (the cdc_merge guard pattern: fires on any
    row-materializing read). Pass ``strict=False`` to salvage a
    known-dirty dump through the old permissive CSV path (malformed rows
    null out)."""
    if isinstance(schema, str):
        schema = StructType.fromDDL(schema)
    if strict and schema.fields:
        nf = len(schema.fields)
        raw = spark.read.text(path).filter(F.col("value") != "")
        parts = F.split(F.col("value"), r"\|", -1)
        ok = (F.size(parts) == nf + 1) & (F.element_at(parts, nf + 1) == "")
        err = F.raise_error(
            F.concat(
                F.lit(
                    f"malformed .tbl row in {path} (every row must carry "
                    f"exactly {nf} |-terminated fields; pass strict=False "
                    "to salvage a dirty dump): "
                ),
                F.col("value"),
            )
        )

        def _field(i, f):
            # Three strict checks per field (round-14 review): bad token
            # COUNT raises; an EMPTY token parses to NULL (parity with the
            # CSV salvage path, whose nullValue='' did the same — flipping
            # the default must not silently change IS NULL semantics); a
            # NON-EMPTY token the type cast nulls out raises — under this
            # session's ANSI-off conf a plain cast would swallow a garbage
            # value into NULL, the exact vanishing-key failure strict mode
            # exists to prevent.
            tok = F.element_at(parts, i + 1)
            val = tok.cast(f.dataType)
            bad_value = F.raise_error(
                F.concat(
                    F.lit(
                        f"corrupt .tbl value in {path}: field '{f.name}' "
                        f"cannot parse as {f.dataType.simpleString()} in row: "
                    ),
                    F.col("value"),
                )
            )
            return (
                F.when(~ok, err)
                .when(tok == "", F.lit(None).cast(f.dataType))
                .when(val.isNull(), bad_value)
                .otherwise(val)
                .alias(f.name)
            )

        return raw.select(*[_field(i, f) for i, f in enumerate(schema.fields)])
    padded = StructType(schema.fields[:]).add("__placeholder", "string")
    return (
        spark.read.option("sep", "|")
        .option("header", "false")
        .schema(padded)
        .csv(path)
        .drop("__placeholder")
    )


def memory_table(df: DataFrame, partitions: int | None = None) -> DataFrame:
    """Materialize in memory N-ways (reference MemTable::load)."""
    if partitions:
        df = df.repartition(partitions)
    df = df.cache()
    df.count()
    return df


def write_parquet(
    df: DataFrame,
    path: str,
    compression: str = "zstd",
    partition_by: list[str] | None = None,
) -> None:
    """Parquet sink. ``partition_by`` lays the table out hive-style
    (``col=value/`` directories) — at 100 TB this is what turns a filter on
    the partition column into directory pruning (zero data files touched)
    instead of a full scan; see the PartitionFilters plan test."""
    writer = df.write.mode("overwrite").option("compression", compression)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_clustered(
    df: DataFrame,
    path: str,
    cluster_by: list[str],
    partitions: int | None = None,
    compression: str = "zstd",
) -> None:
    """Parquet sink with the data CLUSTERED on ``cluster_by``: range-
    partition across files, sort within each, so every file and row group
    covers a narrow key interval and parquet min/max statistics prune
    selective filters down to O(1) files instead of a full scan — the
    data-skipping layout for a dominant access dimension (hive
    ``partition_by`` handles the low-cardinality dimensions; this handles
    the high-cardinality one where a directory per value is impossible).

    At 100 TB: one range exchange at write time (sampled range bounds, no
    global sort) buys every future selective read. Readers need nothing
    special — pushdown against row-group stats is automatic."""
    n = partitions or df.sparkSession.sparkContext.defaultParallelism
    out = df.repartitionByRange(n, *cluster_by).sortWithinPartitions(*cluster_by)
    out.write.mode("overwrite").option("compression", compression).parquet(path)


Z_BITS = 8  # 256 bins per dimension; z key spans 16 bits


def _zvalue(a, b, bits: int = Z_BITS):
    """Interleave the low ``bits`` of two bin indices (Morton/Z curve) —
    a pure JVM expression, no UDF."""
    from pyspark.sql import functions as F

    z = F.lit(0).cast("long")
    for i in range(bits):
        z = (
            z
            + F.shiftleft(F.shiftright(a, i).bitwiseAND(F.lit(1)), 2 * i)
            + F.shiftleft(F.shiftright(b, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return z


def write_zordered(
    df: DataFrame,
    path: str,
    cols: tuple[str, str],
    partitions: int | None = None,
    compression: str = "zstd",
    bits: int = Z_BITS,
) -> None:
    """Parquet sink clustered on a two-dimensional Z-ORDER (Morton) curve:
    each value is binned (equi-width over the observed min/max), the two bin
    indices are bit-interleaved, and the data is range-partitioned + sorted
    on the interleaved key. Every file then covers a small set of quadtree
    cells — bounded intervals in BOTH dimensions — so parquet min/max stats
    prune selective filters on EITHER column, where a 1-D clustered layout
    (:func:`write_clustered`) only prunes its single sort dimension.

    Scale shape identical to write_clustered: the min/max bounds are one
    tiny aggregate (driver-held model state, like the IVF centroids), the
    z key is a map-side expression, and the single range exchange at write
    time buys every future selective read on either dimension. Equi-width
    binning keeps the bound computation O(1); heavily skewed dimensions
    would swap in approxQuantile boundaries with the same interleave."""
    from pyspark.sql import functions as F

    ca, cb = cols
    n = partitions or df.sparkSession.sparkContext.defaultParallelism
    bounds = df.agg(
        F.min(ca).alias("a_lo"),
        F.max(ca).alias("a_hi"),
        F.min(cb).alias("b_lo"),
        F.max(cb).alias("b_hi"),
    ).collect()[0]
    nbins = 1 << bits

    def _bin(col, lo, hi):
        # None bounds (empty input, or an all-NULL dimension) degrade to a
        # single bin like a constant column — not a TypeError on None <= None
        if lo is None or hi is None or hi <= lo:
            return F.lit(0).cast("long")
        raw = F.width_bucket(F.col(col).cast("double"), F.lit(float(lo)), F.lit(float(hi)), F.lit(nbins))
        return F.greatest(F.lit(0), F.least(F.lit(nbins - 1), raw - 1)).cast("long")

    z = _zvalue(_bin(ca, bounds["a_lo"], bounds["a_hi"]), _bin(cb, bounds["b_lo"], bounds["b_hi"]), bits)
    out = (
        df.withColumn("__z", z)
        .repartitionByRange(n, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
    )
    out.write.mode("overwrite").option("compression", compression).parquet(path)


def write_csv(df: DataFrame, path: str, sep: str = ",", header: bool = True) -> None:
    df.write.mode("overwrite").option("sep", sep).option("header", str(header).lower()).csv(path)


def read_evolving_table(spark: SparkSession, path: str) -> DataFrame:
    """Read a parquet directory whose files carry DIFFERENT (compatible)
    schemas — the append-only schema-evolution shape a long-lived ingest
    directory accumulates (new columns appear in newer files). Spark's
    default read takes ONE footer's schema; ``mergeSchema`` unions all
    footers so old files surface the new columns as NULLs. Kept opt-in
    (not the default read path) because the merge reads every footer —
    O(files) driver metadata work that a 100 TB table with a stable schema
    should not pay on each query."""
    return spark.read.option("mergeSchema", "true").parquet(path)


def compact_parquet(
    spark: SparkSession,
    path: str,
    target_bytes: int = 128 * 1024 * 1024,
    compression: str = "zstd",
) -> tuple[int, int]:
    """Small-file compaction: rewrite ``path`` so each output file is about
    ``target_bytes``. Returns (files_before, files_after).

    The small-files problem is the classic lakehouse failure mode: a
    streaming sink or per-partition daily writes leave thousands of KB-scale
    files, and every later scan pays per-file open/footer/task overhead.
    Compaction = one read + round-robin repartition to
    ceil(total_bytes/target) + rewrite; a no-op when the layout is already
    coarse enough. The swap is write-to-temp, row-count-verify, then rename
    (on a real object store this is where a table format's commit protocol
    takes over; the verify-then-swap mirrors its safety property that
    readers never observe a partial rewrite)."""
    import glob as _glob
    import math
    import os
    import re
    import shutil

    backup = path.rstrip("/") + ".__compact_old__"
    # Crash recovery BEFORE any expensive work (the swap below is two
    # renames, and a previous run may have died between or after them):
    #  - backup AND path exist: the swap completed but cleanup didn't —
    #    path holds the verified compacted data, the backup is stale junk;
    #  - backup exists, path missing: died between the renames — the
    #    backup IS the table, restore it.
    if os.path.exists(backup):
        if os.path.exists(path):
            shutil.rmtree(backup)
        else:
            os.rename(backup, path)
    # Hive-partitioned layouts (key=value directories) are refused loudly:
    # a flat rewrite would fold the partition columns into the files,
    # destroying directory pruning and colliding with later partitioned
    # writes — compact each partition directory instead.
    part_dirs = [
        d
        for d in os.listdir(path)
        if os.path.isdir(os.path.join(path, d)) and re.match(r"^[^.=][^=]*=", d)
    ]
    if part_dirs:
        from ..errors import PlanningError

        raise PlanningError(
            f"compact_parquet: {path} is hive-partitioned "
            f"(e.g. {part_dirs[0]!r}); a flat rewrite would destroy the "
            "partition layout — compact each partition directory instead"
        )
    files = [
        f
        for f in _glob.glob(os.path.join(path, "**", "*"), recursive=True)
        if os.path.isfile(f) and not os.path.basename(f).startswith(("_", "."))
    ]
    total = sum(os.path.getsize(f) for f in files)
    n_out = max(1, math.ceil(total / target_bytes))
    if n_out >= len(files):
        return len(files), len(files)

    df = spark.read.parquet(path)
    expected = df.count()
    tmp = path.rstrip("/") + ".__compact_tmp__"
    df.repartition(n_out).write.mode("overwrite").option(
        "compression", compression
    ).parquet(tmp)
    actual = spark.read.parquet(tmp).count()
    if actual != expected:
        shutil.rmtree(tmp, ignore_errors=True)
        raise RuntimeError(
            f"compact_parquet: rewrite of {path} produced {actual} rows, expected "
            f"{expected}; temp output discarded, original left untouched"
        )
    os.rename(path, backup)
    os.rename(tmp, path)
    shutil.rmtree(backup)
    after = len(
        [
            f
            for f in _glob.glob(os.path.join(path, "**", "*"), recursive=True)
            if os.path.isfile(f) and not os.path.basename(f).startswith(("_", "."))
        ]
    )
    return len(files), after
