"""Controlled steady-state triage for bench-swing queries (VERDICT r8
#2/#3): run each named query N passes in ONE fresh exclusive session —
noop sink, clearCache between passes (bench parity) — and print the
full series. First passes absorb codegen JIT / first-parquet-read; the
tail of the series is the steady number PERF.md should record.

    python3 tools/triage_steady.py nsw_search dedup_survivors [...]
    SPARK_GRAFT_TRIAGE_PASSES=4 python3 tools/triage_steady.py ...

NEVER run concurrently with bench.py or another Spark session (the
32 shared cores inflate timings 5-10x).
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    names = [a for a in sys.argv[1:] if not a.startswith("-")]
    if not names:
        print("usage: triage_steady.py QUERY [QUERY ...]", file=sys.stderr)
        sys.exit(2)
    passes = int(os.environ.get("SPARK_GRAFT_TRIAGE_PASSES", "4"))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    import __spark_entry__ as entrymod
    from drune_spark.session import get_spark

    qs = entrymod.queries()
    unknown = [n for n in names if n not in qs]
    if unknown:
        print(f"unknown queries: {unknown}", file=sys.stderr)
        sys.exit(2)

    spark = get_spark("drune_spark_triage")
    # Anchor: tpch_q3 ≈ 0.6-1.1s when the box is healthy — timings are
    # only comparable against a same-run anchor (CLAUDE.md). Min-of-2
    # with the first pass discarded as warmup: the cold first-in-JVM
    # pass absorbs exactly the codegen-JIT/first-read transient this
    # tool exists to factor out and would misread as box load.
    anchors = []
    for _ in range(2):
        t0 = time.monotonic()
        qs["tpch_q3"](spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        anchors.append(time.monotonic() - t0)
        spark.catalog.clearCache()
    print(
        f"anchor tpch_q3: {min(anchors):.2f}s "
        f"(cold first pass {anchors[0]:.2f}s)"
    )

    for name in names:
        series = []
        for i in range(passes):
            t0 = time.monotonic()
            qs[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            series.append(time.monotonic() - t0)
            spark.catalog.clearCache()
        fmt = " -> ".join(f"{s:.2f}" for s in series)
        steady = min(series[1:] or series)
        print(f"{name}: {fmt}  (steady ~{steady:.2f}s)")

    spark.stop()


if __name__ == "__main__":
    main()
