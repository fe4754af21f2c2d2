"""Cross-round value-regression oracle over bench drain checksums
(VERDICT r04 #5).

bench.py drains every headline query through ``drain_checksum`` (sum of
xxhash64 over all columns) and records the checksum per query.  For a
query whose DEFINITION did not change between rounds, the checksum over
the same input must be identical — a moved checksum is silent semantic
drift that per-round sf0.01 oracle runs would only catch at their own
scale.  This comparator diffs two BENCH_r{N}.json files and exits
non-zero on any mismatch (queries present in only one file, or files
predating checksum support, are reported but not fatal).

Usage: python scripts/compare_bench_checksums.py BENCH_r04.json BENCH_r05.json
"""

from __future__ import annotations

import json
import sys


def load(path: str) -> dict:
    with open(path) as f:
        d = json.load(f)
    # driver-recorded BENCH files wrap the parsed line under "parsed"
    if "parsed" in d and isinstance(d["parsed"], dict):
        d = d["parsed"]
    return d


def main() -> None:
    old_p, new_p = sys.argv[1], sys.argv[2]
    old, new = load(old_p), load(new_p)
    old_ck = old.get("checksums") or {}
    new_ck = new.get("checksums") or {}
    if not old_ck:
        print(f"NOTE: {old_p} has no checksums (predates support) — nothing to compare")
        return
    mismatches, only_old, only_new = [], [], []
    for q, c in old_ck.items():
        if q not in new_ck:
            only_old.append(q)
        elif new_ck[q] != c:
            mismatches.append((q, c, new_ck[q]))
    only_new = [q for q in new_ck if q not in old_ck]
    for q in only_old:
        print(f"NOTE: {q} only in {old_p} (removed/renamed query)")
    for q in only_new:
        print(f"NOTE: {q} only in {new_p} (new query)")
    for q, a, b in mismatches:
        print(f"CHECKSUM MOVED: {q}: {a} -> {b} — if this query's definition "
              f"did not change, this is a value regression")
    same = len(old_ck) - len(only_old) - len(mismatches)
    print(f"{same} identical, {len(mismatches)} moved, "
          f"{len(only_old)}+{len(only_new)} unmatched")
    if mismatches:
        sys.exit(1)


if __name__ == "__main__":
    main()
