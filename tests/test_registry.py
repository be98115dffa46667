"""Registry hygiene (VERDICT r3 #7): with 227 hand-registered entries,
the queries()/oracle_sql()/COVERAGE.md triangle must not silently drift.

These tests are pure-Python (no SparkSession) so they run in <1s and
fail loudly on: a duplicate dict key silently shadowing an entry, an
entry without its oracle twin (or a twin for a ghost entry), a bench
query that fell out of the registry, or a stale committed ledger."""

from __future__ import annotations

import ast
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))

import __spark_entry__ as entrymod  # noqa: E402

# Ops whose results genuinely can't be stated in ANSI SQL would be
# listed here and get a rows-only driver check. Kept EMPTY on purpose:
# every current entry has a DuckDB oracle, and adding a name here must
# be a reviewed decision, not a convenience.
ROWS_ONLY_ALLOWLIST: frozenset[str] = frozenset()


class TestRegistryHygiene:
    def test_every_entry_has_oracle_twin(self):
        qs, os_ = entrymod.queries(), entrymod.oracle_sql()
        missing = [n for n in qs if n not in os_ and n not in ROWS_ONLY_ALLOWLIST]
        assert missing == [], f"entries without oracle twin: {missing}"

    def test_no_orphan_oracles(self):
        qs, os_ = entrymod.queries(), entrymod.oracle_sql()
        orphans = [n for n in os_ if n not in qs]
        assert orphans == [], f"oracles for nonexistent entries: {orphans}"

    def test_no_duplicate_literal_keys(self):
        """dict literals swallow duplicate keys silently — parse the
        source and check the literal itself."""
        src = open(os.path.join(REPO, "__spark_entry__.py")).read()
        tree = ast.parse(src)
        for fn in ast.walk(tree):
            if isinstance(fn, ast.FunctionDef) and fn.name == "queries":
                dicts = [
                    n for n in ast.walk(fn) if isinstance(n, ast.Dict)
                ]
                assert dicts, "queries() no longer returns a dict literal"
                keys = [
                    k.value
                    for d in dicts
                    for k in d.keys
                    if isinstance(k, ast.Constant)
                ]
                dupes = sorted({k for k in keys if keys.count(k) > 1})
                assert dupes == [], f"duplicate registry keys: {dupes}"
                assert len(keys) == len(entrymod.queries())
                return
        raise AssertionError("queries() not found")

    def test_oracle_literal_keys_not_shadowed(self):
        """An oracle_sql() dict-literal key that is later reassigned via
        d["key"] = ... is dead text that silently drifts (ADVICE r9:
        pack_sequences). Flag literal keys that are also subscript-assigned
        inside oracle_sql()."""
        src = open(os.path.join(REPO, "__spark_entry__.py")).read()
        tree = ast.parse(src)
        for fn in ast.walk(tree):
            if isinstance(fn, ast.FunctionDef) and fn.name == "oracle_sql":
                literal_keys = {
                    k.value
                    for n in ast.walk(fn)
                    if isinstance(n, ast.Dict)
                    for k in n.keys
                    if isinstance(k, ast.Constant)
                }
                assigned_keys = set()
                for n in ast.walk(fn):
                    if (
                        isinstance(n, ast.Assign)
                        and len(n.targets) == 1
                        and isinstance(n.targets[0], ast.Subscript)
                        and isinstance(n.targets[0].slice, ast.Constant)
                    ):
                        assigned_keys.add(n.targets[0].slice.value)
                shadowed = sorted(literal_keys & assigned_keys)
                assert shadowed == [], (
                    f"oracle_sql literal keys shadowed by later "
                    f"assignment: {shadowed}"
                )
                return
        raise AssertionError("oracle_sql() not found")

    def test_entry_values_are_callables_with_standard_signature(self):
        import inspect

        for name, fn in entrymod.queries().items():
            assert callable(fn), name
            params = list(inspect.signature(fn).parameters)
            assert len(params) == 2, (name, params)

    def test_bench_queries_subset_of_registry(self):
        import bench

        qs = entrymod.queries()
        missing = [n for n in bench.BENCH_QUERIES if n not in qs]
        assert missing == [], f"bench names not in registry: {missing}"
        assert len(set(bench.BENCH_QUERIES)) == len(bench.BENCH_QUERIES)

    def test_coverage_ledger_is_current(self):
        """COVERAGE.md's generated ledger must match the live registry —
        regenerate with `python3 tools/registry_sync.py` after any
        registry change."""
        import registry_sync

        committed = open(os.path.join(REPO, "COVERAGE.md")).read()
        expected = registry_sync.generate()
        assert registry_sync.BEGIN in committed, "ledger section missing"
        live = committed.split(registry_sync.BEGIN, 1)[1].split(
            registry_sync.END, 1
        )[0]
        assert (
            registry_sync.BEGIN + live + registry_sync.END == expected
        ), "COVERAGE.md ledger is stale — run python3 tools/registry_sync.py"

    def test_rotation_never_verified_first(self):
        """Driver-FAILED entries sit above never-driver-verified ones,
        which sit above verified-pass ones — a mis-rotation silently
        wastes the driver's ~50-entry correctness window or leaves a
        fixed entry's official record saying FAIL (VERDICT r4 #7,
        r5 #1)."""
        import registry_sync

        names = list(entrymod.queries())
        seen = registry_sync.driver_rows()
        registry_sync.check_rotation(names, seen)  # must not raise

    def test_rotation_checker_bites(self):
        """A seeded mis-rotation (verified-pass entry ahead of a
        never-verified one) must be rejected."""
        import pytest
        import registry_sync

        names = list(entrymod.queries())
        seen = registry_sync.driver_rows()
        never = [n for n in names if n not in seen]
        passed = [n for n in names if n in seen and seen[n][1]]
        if not never or not passed:
            pytest.skip("needs both verified-pass and never-verified entries")
        bad = [passed[0]] + [n for n in names if n != passed[0]]
        with pytest.raises(SystemExit, match="rotation violation"):
            registry_sync.check_rotation(bad, seen)

    def test_rotation_checker_bites_on_stale_fail(self):
        """A driver-FAILED entry parked below the never-verified block
        must be rejected — that exact mis-rotation kept 4 fixed entries
        officially FAILed for 3+ rounds (VERDICT r5 #1)."""
        import pytest
        import registry_sync

        names = list(entrymod.queries())
        seen = registry_sync.driver_rows()
        never = [n for n in names if n not in seen]
        failed = [n for n in names if n in seen and not seen[n][1]]
        if not never or not failed:
            pytest.skip("needs both driver-FAILED and never-verified entries")
        bad = [n for n in names if n != failed[0]]
        bad.insert(bad.index(never[-1]) + 1, failed[0])
        with pytest.raises(SystemExit, match="rotation violation"):
            registry_sync.check_rotation(bad, seen)

    def test_rotation_checker_bites_on_starved_backlog(self):
        """A never-verified entry jumped by a LATER-introduced
        never-verified entry must be rejected — the 19 r6 gates waited
        two full rounds behind later additions under the old
        preserved-order rule (VERDICT r7 #7)."""
        import pytest
        import registry_sync

        names = list(entrymod.queries())
        seen = registry_sync.driver_rows()
        intro = registry_sync.intro_rounds()
        never = [n for n in names if n not in seen]
        if len(never) < 2:
            pytest.skip("needs >=2 never-verified entries")
        by_intro = sorted(never, key=lambda n: intro.get(n, 99))
        oldest, newest = by_intro[0], by_intro[-1]
        if intro.get(oldest, 99) == intro.get(newest, 99):
            pytest.skip("all never-verified entries share one intro round")
        # Simulate starvation: move the newest-introduced entry above
        # the longest-waiting one.
        bad = [n for n in names if n != newest]
        bad.insert(bad.index(oldest), newest)
        with pytest.raises(SystemExit, match="starved"):
            registry_sync.check_rotation(bad, seen)

    def test_intro_rounds_covers_registry(self):
        """Every registry entry has a recorded round-of-introduction —
        rotate_registry auto-registers new gates at the current round so
        they queue behind the older never-verified backlog."""
        import registry_sync

        intro = registry_sync.intro_rounds()
        missing = [n for n in entrymod.queries() if n not in intro]
        assert not missing, (
            f"entries missing from tools/intro_rounds.json: {missing} — "
            "run python3 tools/rotate_registry.py"
        )

    def test_seeded_mismatch_is_detected(self):
        """The ledger comparison actually bites: a perturbed registry
        must NOT equal the committed section."""
        import registry_sync

        committed = open(os.path.join(REPO, "COVERAGE.md")).read()
        live = committed.split(registry_sync.BEGIN, 1)[1].split(
            registry_sync.END, 1
        )[0]
        perturbed = live.replace("`image_decode`", "`image_dec0de`", 1)
        assert perturbed != live


class TestStepTypeResolution:
    """Guard for the r6 near-miss class: a truncated/overwritten step
    module silently dropped 11 StepRegistry registrations and the only
    symptom was plan_audit's failed count. Every step type referenced
    by any gate or example pipeline must resolve at import time."""

    @staticmethod
    def _referenced_types() -> set[str]:
        import re

        src = open(os.path.join(REPO, "__spark_entry__.py")).read()
        refs = set(
            re.findall(
                r"StepConfig\((?:[^()]|\([^()]*\))*?type=\"([a-z_0-9]+)\"",
                src,
                re.S,
            )
        )
        # example-project YAML pipelines (steps.yml 'type:' entries)
        ex_root = os.path.join(REPO, "examples")
        for dirpath, _dirs, files in os.walk(ex_root):
            for fn in files:
                if fn != "steps.yml":
                    continue
                for line in open(os.path.join(dirpath, fn)):
                    m = re.match(r"\s*type:\s*([a-z_0-9]+)\s*$", line)
                    if m:
                        refs.add(m.group(1))
        return refs

    def test_referenced_step_types_resolve(self):
        import drune_spark.operators.steps  # noqa: F401
        import drune_spark.operators.llm_steps  # noqa: F401
        from drune_spark.operators.registry import StepRegistry

        refs = self._referenced_types()
        # regex-rot guard: the registry gates + example project reference
        # well over a dozen distinct step types today.
        assert len(refs) >= 12, f"suspiciously few refs found: {sorted(refs)}"
        missing = sorted(refs - set(StepRegistry.known()))
        assert not missing, (
            f"gate/example pipelines reference unregistered step types "
            f"{missing} — a step module was probably truncated "
            f"(known: {StepRegistry.known()})"
        )

    def test_resolution_check_bites(self):
        """Simulated truncation: an unknown type must raise, and the
        scanner must notice a reference to it."""
        import pytest
        from drune_spark.operators.registry import StepRegistry

        with pytest.raises(KeyError, match="unknown step type"):
            StepRegistry.get("step_type_that_got_truncated_away")
        refs = self._referenced_types() | {"step_type_that_got_truncated_away"}
        assert refs - set(StepRegistry.known())
