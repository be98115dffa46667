"""Kafka-wire-shaped source mock — the streaming-broker contract
without a broker.

Spark's Kafka connector (spark-sql-kafka-0-10) presents every topic as
one fixed wire schema: ``key`` / ``value`` binary, ``topic``,
``partition``, ``offset``, ``timestamp``, ``timestampType``. Pipelines
are written against that shape (cast value → from_json → transform),
so the mock's job is to reproduce the contract exactly from file-backed
data: swap ``read_kafka_log`` for
``spark.readStream.format("kafka")`` in production and nothing
downstream changes. The container has no Kafka package or broker; the
mock is the honest stand-in with real Spark plumbing.

Pieces:
- ``kafka_wire_frame``: batch frame → wire shape. Partition = portable
  md5 hash of the key mod N (same key → same partition, the Kafka
  producer default), offset = dense per-partition sequence ordered by
  (timestamp, tie-breakers) — deterministic, so the oracle gate can
  replay partitioning AND offset assignment in SQL.
- ``write_kafka_log``: materialize the wire frame as a parquet "broker
  log" partitioned by Kafka partition. A file per partition, rows in
  offset order — a replayable log.
- ``read_kafka_log``: ``readStream`` over the log directory (use
  ``maxFilesPerTrigger``/``availableNow`` to control replay pacing) —
  genuine micro-batch replay semantics, like consuming a topic from
  offset 0.
- ``parse_kafka_value``: the consumer-side decode — cast value to
  string, ``from_json`` with a caller schema, flatten.

Offset assignment is mock-only physics: a real broker hands out
offsets at append time; computing them needs one per-partition
row_number window (parallel across partitions). At 100 TB you would
never compute offsets — you'd read them — so the window lives only in
the mock producer, not in any consumer path.

No counterpart in /root/reference (its streaming sources are file
tails); driver-mandated streaming extension.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from drune_spark.functions.hashes import md5_u32

KAFKA_WIRE_COLUMNS = [
    "key",
    "value",
    "topic",
    "partition",
    "offset",
    "timestamp",
    "timestampType",
]


def kafka_partition_for(key_col, n_partitions: int):
    """Deterministic partition for a key: portable md5-32 hash mod N
    (DuckDB mirror: ``('0x' || substr(md5(k), 1, 8))::BIGINT % N``)."""
    return F.pmod(md5_u32(key_col.cast("string")), F.lit(n_partitions)).cast(
        "int"
    )


def kafka_wire_frame(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    topic: str,
    n_partitions: int = 4,
    tie_cols: list[str] | None = None,
) -> DataFrame:
    """Producer side: wrap every row of ``df`` as a Kafka record. The
    full row becomes the JSON ``value``; ``key_col`` becomes the
    partitioning key; ``offset`` is the dense 0-based per-partition
    sequence in (``ts_col``, ``tie_cols``) order."""
    part = kafka_partition_for(F.col(key_col), n_partitions)
    staged = df.withColumn("partition", part)
    order = [F.col(ts_col).asc()] + [
        F.col(c).asc() for c in (tie_cols or [])
    ]
    w = Window.partitionBy("partition").orderBy(*order)
    return staged.select(
        F.col(key_col).cast("string").cast("binary").alias("key"),
        F.to_json(F.struct(*[F.col(c) for c in df.columns])).cast(
            "binary"
        ).alias("value"),
        F.lit(topic).alias("topic"),
        F.col("partition"),
        (F.row_number().over(w) - 1).cast("long").alias("offset"),
        F.col(ts_col).alias("timestamp"),
        F.lit(0).alias("timestampType"),  # CreateTime
    )


def write_kafka_log(wire: DataFrame, path: str) -> None:
    """Materialize a wire frame as the mock broker log: one file per
    Kafka partition, rows in offset order (replayable from 0)."""
    (
        wire.repartition(1, "partition")
        .sortWithinPartitions("partition", "offset")
        .write.mode("overwrite")
        .partitionBy("partition")
        .parquet(path)
    )


def read_kafka_log(
    spark: SparkSession,
    path: str,
    options: dict[str, str] | None = None,
) -> DataFrame:
    """Consumer side: a streaming DataFrame with the Kafka wire schema,
    replaying the log directory. ``options`` pass through to the file
    source (e.g. ``{"maxFilesPerTrigger": "1"}`` to step partition by
    partition)."""
    batch = spark.read.parquet(path)
    reader = spark.readStream.schema(batch.schema)
    for k, v in (options or {}).items():
        reader = reader.option(k, v)
    return reader.parquet(path)


def parse_kafka_value(wire: DataFrame, schema_ddl: str) -> DataFrame:
    """Consumer decode: value binary → string → ``from_json`` with the
    caller's schema, flattened next to the wire metadata columns."""
    return wire.select(
        "topic",
        "partition",
        "offset",
        "timestamp",
        F.from_json(F.col("value").cast("string"), schema_ddl).alias("__v"),
    ).select("topic", "partition", "offset", "timestamp", "__v.*")
