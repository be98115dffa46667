"""Step runner + writer tests: join folding, SQL chains, pivot,
stop_at/resume, merge upsert, SCD2 idempotency, safe-write rollback.
SCD2 expectations follow the reference's semantics
(reference: engines/spark/steps/writer.py:37-101)."""

import os

import pytest
from pyspark.sql import functions as F

from drune_spark.config.models import SCDConfig, StepConfig, TargetSpec
from drune_spark.operators.registry import StepRunner
import drune_spark.operators.steps  # noqa: F401 — register step types
from drune_spark.plans.schema_apply import add_data_hash, add_hash_key
from drune_spark.sinks.writers import (
    merge_upsert,
    rollback,
    scd2_merge,
    write_target,
)


@pytest.fixture()
def sales_inputs(spark):
    customers = spark.createDataFrame(
        [(1, "ann"), (2, "bob")], ["cust_id", "name"]
    )
    sales = spark.createDataFrame(
        [(10, 1, 5.0), (11, 1, 7.0), (12, 2, 3.0)],
        ["sale_id", "cust_id_fk", "amount"],
    )
    return {"customers": customers, "sales": sales}


class TestSteps:
    def test_join_fold_and_aggregate(self, spark, sales_inputs):
        runner = StepRunner(spark)
        out = runner.run([
            StepConfig(name="j", type="join", params={
                "sources": ["sales", "customers"],
                "on": ["cust_id_fk = cust_id"],
                "broadcast": ["customers"],
            }),
            StepConfig(name="a", type="aggregate", params={
                "group_by": ["name"],
                "aggs": {"total": "SUM(amount)", "n": "COUNT(*)"},
            }),
        ], sales_inputs, None)
        rows = {r.name: (r.total, r.n) for r in out.collect()}
        assert rows == {"ann": (12.0, 2), "bob": (3.0, 1)}

    def test_sql_chain_views(self, spark, sales_inputs):
        runner = StepRunner(spark)
        out = runner.run([
            StepConfig(name="g", type="sql", params={"statements": [
                {"name": "big_sales", "sql":
                    "SELECT * FROM sales WHERE amount > 4"},
                {"name": "final", "sql":
                    "SELECT COUNT(*) AS n FROM big_sales"},
            ]}),
        ], sales_inputs, None)
        assert out.collect()[0].n == 2

    def test_pivot_explicit_values(self, spark):
        df = spark.createDataFrame(
            [("a", "x", 1.0), ("a", "y", 2.0), ("b", "x", 3.0)],
            ["k", "p", "v"],
        )
        runner = StepRunner(spark)
        out = runner.run([
            StepConfig(name="pv", type="pivot", params={
                "index": ["k"], "columns": "p", "values": "v",
                "aggfunc": "sum", "pivot_values": ["x", "y"],
            }),
        ], {"t": df}, df)
        rows = {r.k: (r.x, r.y) for r in out.collect()}
        assert rows == {"a": (1.0, 2.0), "b": (3.0, None)}

    def test_stop_at_and_resume(self, spark, sales_inputs):
        runner = StepRunner(spark)
        steps = [
            StepConfig(name="s1", type="filter",
                       params={"where": "amount > 4", "source": "sales"}),
            StepConfig(name="s2", type="filter", params={"where": "amount > 6"}),
        ]
        mid = runner.run(steps, sales_inputs, None, stop_at="s1")
        assert mid.count() == 2
        final = runner.run(steps, sales_inputs, mid)  # resumes at s2
        assert final.count() == 1
        runner.reset()
        assert runner._position == 0

    def test_join_composite_key_single_pair(self, spark):
        """A flat list for one pair is a COMPOSITE key, not per-pair
        conditions (regression: second key column silently ignored)."""
        left = spark.createDataFrame(
            [(1, "a", 10), (1, "b", 20)], ["k1", "k2", "v"]
        )
        right = spark.createDataFrame(
            [(1, "a", "X"), (1, "b", "Y")], ["k1", "k2", "name"]
        )
        runner = StepRunner(spark)
        out = runner.run([
            StepConfig(name="j", type="join", params={
                "sources": ["l", "r"], "on": ["k1", "k2"],
            }),
        ], {"l": left, "r": right}, None)
        rows = {(r.v, r.name) for r in out.collect()}
        assert rows == {(10, "X"), (20, "Y")}  # not the 4-row over-match

    def test_union_step(self, spark):
        a = spark.createDataFrame([(1, "x")], ["k", "v"])
        b = spark.createDataFrame([("y", 2)], ["v", "k"])        # reordered cols
        c = spark.createDataFrame([(3,)], ["k"])                  # missing v
        runner = StepRunner(spark)
        out = runner.run([
            StepConfig(name="u", type="union", params={
                "sources": ["a", "b", "c"], "allow_missing_columns": True,
            }),
        ], {"a": a, "b": b, "c": c}, None)
        rows = {(r.k, r.v) for r in out.collect()}
        assert rows == {(1, "x"), (2, "y"), (3, None)}

    def test_drop_duplicates_keep_by(self, spark):
        df = spark.createDataFrame(
            [(1, "old", 1), (1, "new", 2), (2, "only", 1)],
            ["k", "v", "version"],
        )
        runner = StepRunner(spark)
        out = runner.run([
            StepConfig(name="dd", type="drop_duplicates", params={
                "subset": ["k"], "keep_by": "version DESC",
            }),
        ], {"t": df}, df)
        assert {r.v for r in out.collect()} == {"new", "only"}


def _file_target(tmp_path, name="t", **kw):
    return TargetSpec(name=name, type="file", format="parquet",
                      path=os.path.join(str(tmp_path), name + ".parquet"), **kw)


class TestWriters:
    def test_overwrite_and_rollback(self, spark, tmp_path):
        tgt = _file_target(tmp_path)
        write_target(spark, spark.range(3), tgt)
        write_target(spark, spark.range(5), tgt)
        assert spark.read.parquet(tgt.path).count() == 5
        rollback(tgt.path)
        assert spark.read.parquet(tgt.path).count() == 3

    def test_safe_overwrite_crash_consistency(self, spark, tmp_path,
                                              monkeypatch):
        """W9 fault injection (VERDICT r3 #4 — Delta-less container):
        kill _safe_overwrite at EVERY internal filesystem mutation and
        prove the target is always recoverable to a complete version —
        either the old data still reads, or rollback() restores it.
        Never a partial/missing state."""
        from drune_spark.sinks import writers as W

        tgt = _file_target(tmp_path, name="cc")
        old = {0, 1, 2}
        real_rename, real_delete = W._fs_rename, W._fs_delete

        def run_with_crash_at(nth):
            """Re-seed v1, then crash the v2 overwrite at mutation #nth."""
            import shutil
            for suffix in ("", ".__prev__", ".__new__", ".__undone__"):
                shutil.rmtree(tgt.path + suffix, ignore_errors=True)
            write_target(spark, spark.range(3), tgt)
            calls = {"n": 0}

            def bomb(fn):
                def wrapped(*a, **kw):
                    calls["n"] += 1
                    if calls["n"] == nth:
                        raise W.WriteError("injected crash")
                    return fn(*a, **kw)
                return wrapped

            monkeypatch.setattr(W, "_fs_rename", bomb(real_rename))
            monkeypatch.setattr(W, "_fs_delete", bomb(real_delete))
            try:
                write_target(spark, spark.range(5), tgt)
                crashed = False
            except W.WriteError:
                crashed = True
            finally:
                monkeypatch.setattr(W, "_fs_rename", real_rename)
                monkeypatch.setattr(W, "_fs_delete", real_delete)
            return crashed

        # v2 overwrite of an existing target performs 3 mutations:
        # delete(.__prev__ if any) is skipped on first overwrite, then
        # rename(path->prev), rename(tmp->path). Crash at each, plus
        # one run past the end (no crash) as the control.
        for nth in (1, 2, 3):
            crashed = run_with_crash_at(nth)
            if not crashed:  # fewer mutations than nth -> clean run
                assert {r.id for r in spark.read.parquet(tgt.path).collect()} \
                    == set(range(5))
                continue
            if W._fs_exists(spark, tgt.path):
                got = {r.id for r in spark.read.parquet(tgt.path).collect()}
                assert got in (old, set(range(5))), got
            else:
                # mid-swap crash: old version parked at .__prev__
                rollback(tgt.path)
                got = {r.id for r in spark.read.parquet(tgt.path).collect()}
                assert got == old, got

    def test_safe_overwrite_ignores_stale_scratch(self, spark, tmp_path):
        """A leftover .__new__ dir from a previous crash must not
        poison the next overwrite."""
        import os as _os

        tgt = _file_target(tmp_path, name="st")
        write_target(spark, spark.range(3), tgt)
        stale = tgt.path + ".__new__"
        _os.makedirs(stale, exist_ok=True)
        with open(_os.path.join(stale, "garbage"), "w") as fh:
            fh.write("not parquet")
        write_target(spark, spark.range(5), tgt)
        assert spark.read.parquet(tgt.path).count() == 5

    def test_append(self, spark, tmp_path):
        tgt = _file_target(tmp_path, mode="append")
        write_target(spark, spark.range(3), tgt)
        write_target(spark, spark.range(2), tgt)
        assert spark.read.parquet(tgt.path).count() == 5

    def test_partitioned_dynamic_overwrite(self, spark, tmp_path):
        from drune_spark.config.models import SchemaSpec
        tgt = _file_target(tmp_path, mode="overwrite_partition")
        tgt.schema_ = SchemaSpec(partition_by=["part"])
        df1 = spark.createDataFrame([("a", 1), ("b", 2)], ["part", "v"])
        write_target(spark, df1, tgt)
        # Overwrite only partition 'a'; 'b' must survive.
        df2 = spark.createDataFrame([("a", 10)], ["part", "v"])
        write_target(spark, df2, tgt)
        rows = {(r.part, r.v) for r in spark.read.parquet(tgt.path).collect()}
        assert rows == {("a", 10), ("b", 2)}

    def _keyed(self, spark, rows):
        df = spark.createDataFrame(rows, ["pk", "val"])
        return add_hash_key(df, ["pk"])

    def test_merge_upsert(self, spark, tmp_path):
        tgt = _file_target(tmp_path)
        base = self._keyed(spark, [(1, "a"), (2, "b")]) \
            .withColumn("created_at", F.current_timestamp())
        write_target(spark, base, tgt)
        incoming = self._keyed(spark, [(2, "B"), (3, "c")]) \
            .withColumn("created_at", F.current_timestamp())
        merge_upsert(spark, incoming, tgt)
        rows = {r.pk: r.val for r in spark.read.parquet(tgt.path).collect()}
        assert rows == {1: "a", 2: "B", 3: "c"}

    def _scd_frame(self, spark, rows):
        df = spark.createDataFrame(rows, ["pk", "val"])
        return add_data_hash(add_hash_key(df, ["pk"]), ["val"])

    def test_merge_on_table_target_non_delta(self, spark):
        """Regression: non-Delta TABLE merge must not overwrite the table
        its own plan reads (temp-table swap path)."""
        from drune_spark.config.models import TargetSpec as TS
        spark.sql("DROP TABLE IF EXISTS m_tbl")
        spark.sql("DROP TABLE IF EXISTS m_tbl__new__")
        tgt = TS(name="m", type="table", table_name="m_tbl", format="parquet")
        base = self._keyed(spark, [(1, "a"), (2, "b")])
        write_target(spark, base, tgt)
        incoming = self._keyed(spark, [(2, "B"), (3, "c")])
        merge_upsert(spark, incoming, tgt)   # would previously throw
        rows = {r.pk: r.val for r in spark.read.table("m_tbl").collect()}
        assert rows == {1: "a", 2: "B", 3: "c"}
        merge_upsert(spark, incoming, tgt)   # repeatable
        assert spark.read.table("m_tbl").count() == 3
        spark.sql("DROP TABLE IF EXISTS m_tbl")

    def test_scd2_new_changed_unchanged_and_idempotent(self, spark, tmp_path):
        tgt = _file_target(tmp_path, scd=SCDConfig(type=2))
        scd2_merge(spark, self._scd_frame(spark, [(1, "a"), (2, "b")]), tgt)
        # batch 2: 1 unchanged, 2 changed, 3 new
        batch2 = self._scd_frame(spark, [(1, "a"), (2, "B"), (3, "c")])
        scd2_merge(spark, batch2, tgt)
        state = spark.read.parquet(tgt.path)
        current = {(r.pk, r.val) for r in
                   state.filter("is_current").collect()}
        assert current == {(1, "a"), (2, "B"), (3, "c")}
        expired = state.filter("NOT is_current").collect()
        assert len(expired) == 1 and expired[0].pk == 2
        assert expired[0].end_date is not None
        # Materialize before the next overwrite: the DataFrame's file
        # listing goes stale once the target directory is swapped.
        n_before = state.count()
        # idempotency: same batch again is a no-op
        scd2_merge(spark, batch2, tgt)
        state2 = spark.read.parquet(tgt.path)
        assert state2.count() == n_before
        assert state2.filter("is_current").count() == 3


    def test_scd2_snapshot_time_travel(self, spark, tmp_path):
        import datetime as dt
        import time
        from drune_spark.sinks.writers import scd2_snapshot
        tgt = _file_target(tmp_path, scd=SCDConfig(type=2))

        def now():
            time.sleep(0.05)
            t = dt.datetime.now(dt.timezone.utc).replace(tzinfo=None)
            time.sleep(0.05)
            return t

        t0 = now()
        scd2_merge(spark, self._scd_frame(spark, [(1, "a"), (2, "b")]), tgt)
        t1 = now()
        scd2_merge(spark,
                   self._scd_frame(spark, [(1, "a"), (2, "B"), (3, "c")]),
                   tgt)
        t2 = now()
        # before creation: nothing existed
        assert scd2_snapshot(spark, tgt.path, t0).count() == 0
        # between batches: batch-1 state, including the later-expired v
        s1 = {(r.pk, r.val)
              for r in scd2_snapshot(spark, tgt.path, t1).collect()}
        assert s1 == {(1, "a"), (2, "b")}
        # now: current state
        s2 = {(r.pk, r.val)
              for r in scd2_snapshot(spark, tgt.path, t2).collect()}
        assert s2 == {(1, "a"), (2, "B"), (3, "c")}


class TestDeltaFastPaths:
    """Delta-only behavior, auto-enabled when delta-spark is installed
    (drune_spark.session.HAS_DELTA drives both the session extensions
    and these markers). In containers without Delta these skip — the
    parquet fallbacks above cover the same semantics."""

    pytestmark = pytest.mark.skipif(
        not __import__("drune_spark.session", fromlist=["HAS_DELTA"]).HAS_DELTA,
        reason="delta-spark not installed",
    )

    def _delta_target(self, tmp_path, name="d", **kw):
        return TargetSpec(name=name, type="file", format="delta",
                          path=os.path.join(str(tmp_path), name), **kw)

    def test_delta_table_merge(self, spark):
        from drune_spark.plans.schema_apply import add_hash_key
        spark.sql("DROP TABLE IF EXISTS delta_m_tbl")
        tgt = TargetSpec(name="dm", type="table", table_name="delta_m_tbl",
                         format="delta")
        base = add_hash_key(
            spark.createDataFrame([(1, "a"), (2, "b")], ["pk", "val"]), ["pk"])
        write_target(spark, base, tgt)
        incoming = add_hash_key(
            spark.createDataFrame([(2, "B"), (3, "c")], ["pk", "val"]), ["pk"])
        merge_upsert(spark, incoming, tgt)
        rows = {r.pk: r.val for r in spark.read.table("delta_m_tbl").collect()}
        assert rows == {1: "a", 2: "B", 3: "c"}
        spark.sql("DROP TABLE IF EXISTS delta_m_tbl")

    def test_delta_replace_where(self, spark, tmp_path):
        from drune_spark.config.models import SchemaSpec
        tgt = self._delta_target(tmp_path, mode="overwrite_partition",
                                 overwrite_condition="part = 'a'")
        tgt.schema_ = SchemaSpec(partition_by=["part"])
        df1 = spark.createDataFrame([("a", 1), ("b", 2)], ["part", "v"])
        write_target(spark, df1, tgt.model_copy(update={"mode": "overwrite"}))
        df2 = spark.createDataFrame([("a", 10)], ["part", "v"])
        write_target(spark, df2, tgt)
        rows = {(r.part, r.v)
                for r in spark.read.format("delta").load(tgt.path).collect()}
        assert rows == {("a", 10), ("b", 2)}

    def test_delta_time_travel_restore(self, spark, tmp_path):
        path = os.path.join(str(tmp_path), "tt")
        spark.range(3).write.format("delta").save(path)
        spark.range(5).write.format("delta").mode("overwrite").save(path)
        v0 = spark.read.format("delta").option("versionAsOf", 0).load(path)
        assert v0.count() == 3
        spark.sql(f"RESTORE TABLE delta.`{path}` TO VERSION AS OF 0")
        assert spark.read.format("delta").load(path).count() == 3
