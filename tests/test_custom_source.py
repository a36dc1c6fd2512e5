"""Custom Python DataSource (reference custom-extension-codec parity).

The reference ships a custom leaf operator to workers with a user codec and
asserts distributed results equal single-node (reference
tests/custom_extension_codec.rs:38-157). Spark ships the Python DataSource
class natively; these tests pin partitioned parallel reads, differential
equality against a built-in source, and the reference test's
filter-then-sort plan output."""

from __future__ import annotations

from pyspark.sql import functions as F

from datafusion_distributed_experiment_spark.sources.custom import (
    QUERY_PARTITIONS,
    QUERY_VALUES,
    custom_source_scan,
    int64_list,
)


def test_int64_list_round_robin_partitions(spark):
    """Values are served round-robin from the declared number of input
    splits — the reference's one-static-Vec-per-partition shape."""
    df = int64_list(spark, list(range(12)), partitions=3)
    per_part = {
        r["p"]: r["n"]
        for r in df.groupBy(F.spark_partition_id().alias("p"))
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert len(per_part) == 3, per_part
    assert sorted(per_part.values()) == [4, 4, 4], per_part


def test_int64_list_differential_vs_builtin_source(spark):
    """Same relational result as the equivalent built-in in-memory source —
    the reference's distributed-vs-single-node differential, cross-source."""
    values = [5, 3, 8, 1, 9, 2]
    custom = int64_list(spark, values, partitions=2)
    builtin = spark.createDataFrame([(v,) for v in values], "numbers bigint")
    agg = lambda df: df.agg(  # noqa: E731
        F.count("*").alias("n"),
        F.sum("numbers").alias("s"),
        F.min("numbers").alias("lo"),
        F.max("numbers").alias("hi"),
    ).collect()
    assert agg(custom) == agg(builtin)
    assert custom.schema == builtin.schema


def test_custom_source_scan_matches_reference_plan_output(spark):
    """filter(numbers > 1) -> sort desc over the reference test's static
    list (custom_extension_codec.rs:107-157)."""
    rows = [r["numbers"] for r in custom_source_scan(spark, "unused").collect()]
    assert rows == sorted([v for v in QUERY_VALUES if v > 1], reverse=True)


def test_int64_list_empty_and_single_partition(spark):
    assert int64_list(spark, [], partitions=1).count() == 0
    df = int64_list(spark, [7], partitions=4)  # more splits than values
    assert [r["numbers"] for r in df.collect()] == [7]
    assert QUERY_PARTITIONS >= 2  # the declared query is genuinely parallel


def test_custom_source_filter_pushdown(spark):
    """With Python-source filter pushdown enabled, simple comparisons on
    `numbers` are absorbed into the reader (the custom-source analog of the
    reference's DataSourceExec predicate pushdown evidence,
    distributed_repartitions.rs:71) and the scan emits only matching rows;
    results are identical either way."""
    import json as _json

    from datafusion_distributed_experiment_spark.sources import custom

    # conf set/restored on the same session (runtime-settable): Spark 4.1's
    # Python data source registry is global for the exists-check but
    # session-local for lookup, so a sibling session cannot read a source
    # registered elsewhere — see custom.register's docstring.
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    try:
        df = custom.int64_list(spark, list(range(20)), partitions=4).filter(
            "numbers > 15"
        )
        assert sorted(r["numbers"] for r in df.collect()) == [16, 17, 18, 19]
    finally:
        spark.conf.set("spark.sql.python.filterPushdown.enabled", "false")

    # reader-level unit check: pushFilters absorbs supported filters, emits
    # only matching rows, and returns unsupported filters to Spark
    from pyspark.sql.datasource import EqualTo, GreaterThan

    reader = custom.Int64ListPushdownReader(
        {"values": _json.dumps([1, 5, 9]), "partitions": "1"}
    )

    class _Unsupported:  # stand-in for a filter class we don't handle
        pass

    leftover = list(reader.pushFilters([GreaterThan(("numbers",), 4), _Unsupported()]))
    assert len(leftover) == 1 and isinstance(leftover[0], _Unsupported)
    assert [v for (v,) in reader.read(custom.InputPartition(0))] == [5, 9]
    reader.pushed.append(EqualTo(("numbers",), 9))
    assert [v for (v,) in reader.read(custom.InputPartition(0))] == [9]

    # the plain session path (pushdown conf off) keeps working and agrees
    plain = custom.int64_list(spark, list(range(20)), partitions=4).filter(
        "numbers > 15"
    )
    assert sorted(r["numbers"] for r in plain.collect()) == [16, 17, 18, 19]


# ------------------------------------------------------------ streaming ----


def test_custom_stream_source_delivers_all_values_in_batches(spark):
    """The custom streaming source must deliver every configured value
    exactly once across multiple micro-batches (batch_size 7 over 20
    values -> at least 3 planned batches through the offset log)."""
    import time

    from datafusion_distributed_experiment_spark.sources.custom import int64_stream

    values = list(range(100, 120))
    q = (
        int64_stream(spark, values, batch_size=7)
        .writeStream.format("memory")
        .queryName("t_int64_stream")
        .outputMode("append")
        .trigger(processingTime="300 milliseconds")
        .start()
    )
    try:
        deadline = time.time() + 30
        while time.time() < deadline:
            got = [r.numbers for r in spark.table("t_int64_stream").collect()]
            if len(got) >= len(values):
                break
            time.sleep(0.5)
    finally:
        q.stop()
    assert sorted(got) == values
    assert len(got) == len(values)  # exactly once, no duplicates


def test_custom_stream_reader_replays_offset_ranges_identically(spark):
    """Exactly-once recovery contract: readBetweenOffsets must re-serve any
    committed range byte-identically, and chunked reads must tile the list
    without gaps or overlaps."""
    from datafusion_distributed_experiment_spark.sources.custom import (
        Int64StreamReader,
    )

    import json as _json

    reader = Int64StreamReader(
        {"values": _json.dumps(list(range(10))), "batch_size": "4"}
    )
    off = reader.initialOffset()
    seen = []
    offsets = [off]
    while True:
        rows, nxt = reader.read(off)
        rows = list(rows)
        if not rows:
            break
        seen.extend(v for (v,) in rows)
        offsets.append(nxt)
        off = nxt
    assert seen == list(range(10))
    # replay every committed (start, end) pair: identical slices
    for a, b in zip(offsets, offsets[1:]):
        replay = [v for (v,) in reader.readBetweenOffsets(a, b)]
        assert replay == list(range(a["pos"], b["pos"]))
