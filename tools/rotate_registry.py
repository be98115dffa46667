"""Rewrite the queries() dict in __spark_entry__.py into canonical
rotation order (VERDICT r5 #1): driver-FAILED entries first (their
official record says broken even though they pass locally — most
urgent to re-test), then the never-driver-verified backlog (current
relative order preserved), then verified-pass entries stalest-first
(by last driver round, stable by current position). Run after each
round's CORRECTNESS_r*.json lands, then `python3 tools/registry_sync.py`:

    python3 tools/rotate_registry.py
"""

from __future__ import annotations

import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import registry_sync  # noqa: E402


def main() -> None:
    import __spark_entry__ as entrymod

    names = list(entrymod.queries())
    seen = registry_sync.driver_rows()
    pos = {n: i for i, n in enumerate(names)}

    failed = [n for n in names if registry_sync.rotation_class(n, seen) == 0]
    never = [n for n in names if registry_sync.rotation_class(n, seen) == 1]
    passed = [n for n in names if registry_sync.rotation_class(n, seen) == 2]
    failed.sort(key=lambda n: (seen[n][0], pos[n]))
    passed.sort(key=lambda n: (seen[n][0], pos[n]))
    # Never-verified: waited-longest (earliest intro round) first, so no
    # entry is starved by later additions (VERDICT r7 #7). New entries
    # are auto-registered at the current round by intro_rounds(names).
    intro = registry_sync.intro_rounds(names)
    never.sort(key=lambda n: (intro[n], pos[n]))

    sections = [
        (f"stale driver-FAILs — fixed locally, re-test first ({len(failed)})", failed),
        (f"never-driver-verified backlog, waited-longest first ({len(never)})", never),
        (f"driver-verified pass, stalest round first ({len(passed)})", passed),
    ]
    body_lines = []
    for title, block in sections:
        if not block:
            continue
        body_lines.append(f"        # -- {title} " + "-" * max(4, 60 - len(title)))
        body_lines.extend(f'        "{n}": q_{n},' for n in block)
    new_body = "\n".join(body_lines)

    src = open(os.path.join(REPO, "__spark_entry__.py")).read()
    pat = re.compile(
        r"(def queries\(\).*?return \{\n)(.*?)(\n    \}\n)", re.S
    )
    m = pat.search(src)
    assert m, "queries() dict literal not found"
    old_entries = re.findall(r'"([a-zA-Z0-9_]+)": (q_\w+),', m.group(2))
    assert sorted(n for n, _ in old_entries) == sorted(names)
    # The rewrite regenerates every value as q_<key>; refuse to run if any
    # key is bound to a differently-named function (it would be silently
    # rebound to a possibly-missing symbol).
    nonconforming = [(k, fn) for k, fn in old_entries if fn != f"q_{k}"]
    assert not nonconforming, f"non-q_<key> bindings would be lost: {nonconforming}"
    src = src[: m.start(2)] + new_body + src[m.end(2):]
    open(os.path.join(REPO, "__spark_entry__.py"), "w").write(src)
    print(
        f"rotated {len(names)} entries: {len(failed)} FAILED, "
        f"{len(never)} never-verified, {len(passed)} verified-pass; "
        f"window head: {(failed + never)[:6]}..."
    )


if __name__ == "__main__":
    main()
