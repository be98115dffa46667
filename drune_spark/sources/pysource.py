"""Python Data Source API connector (Spark 4, SPARK-44076).

The reference's source surface is format readers + dynamic path
injection (reference: src/drune/engines/spark/steps/reader.py); Spark 4
adds a first-class way to write NEW sources in pure Python — the
``pyspark.sql.datasource`` API — which is the idiomatic PySpark answer
to "my data lives behind an internal API / generator, not in files".
This module implements a deterministic synthetic-events source with it,
proving the full contract: options, schema, partition planning, and
per-partition iteration.

Determinism: row ``i`` of ``n`` is a closed-form function of ``i`` (md5
of the decimal string, as in functions/hashes.py md5_u32), so the
DuckDB oracle regenerates the identical dataset from
``generate_series`` — the gate's aggregate catches any duplicated,
dropped, or mis-partitioned row.

Scale notes: ``partitions()`` plans P strided independent splits — the
generator never materializes on the driver, and each task owns an
arithmetic progression of ids (perfect balance, no coordination). A
production source would yield ``pyarrow.RecordBatch``es instead of row
tuples to stay Arrow-vectorized end-to-end; the per-row loop here keeps
the md5 formula identical to the oracle's at gate scale.
"""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

EVENT_TYPES = ("view", "click", "cart", "purchase")


class SynthEventsReader(DataSourceReader):
    def __init__(self, options: dict):
        self.n = int(options.get("n", 10_000))
        self.parts = int(options.get("partitions", 8))

    def partitions(self):
        return [InputPartition(i) for i in range(self.parts)]

    def read(self, partition: InputPartition):
        import hashlib

        for i in range(partition.value, self.n, self.parts):
            h = int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16)
            yield (i, i % 97, EVENT_TYPES[h % 4], h % 100_000)


class SynthEventsSource(DataSource):
    """``spark.read.format("drune_synth_events").option("n", ...)`` —
    deterministic event stream with schema
    (event_id, user_id, event_type, value_milli)."""

    @classmethod
    def name(cls) -> str:
        return "drune_synth_events"

    def schema(self) -> str:
        return (
            "event_id bigint, user_id bigint, "
            "event_type string, value_milli bigint"
        )

    def reader(self, schema):
        return SynthEventsReader(self.options)


def register(spark) -> None:
    spark.dataSource.register(SynthEventsSource)
