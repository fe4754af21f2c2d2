"""Round-over-round bench comparator for the repo's >20 % rule
(VERDICT r05 #2): consumes the gated-median BENCH records bench.py now
emits and compares CONTROL-NORMALIZED medians (sec × GEMM tasks/s —
box-speed-adjusted cost), falling back to raw seconds for files that
predate the methodology.  Also diffs drain checksums (value drift) via
the same logic as compare_bench_checksums.py.

Exit 1 if any query present in both files is >20 % slower
control-normalized, or any shared-query checksum moved.

Usage: python scripts/compare_bench.py BENCH_r05.json BENCH_r06.json
"""

from __future__ import annotations

import json
import sys

RULE = 0.20


def load(path: str) -> dict:
    with open(path) as f:
        d = json.load(f)
    if "parsed" in d and isinstance(d["parsed"], dict):
        d = d["parsed"]
    return d


def main() -> None:
    old_p, new_p = sys.argv[1], sys.argv[2]
    old, new = load(old_p), load(new_p)

    old_q = old.get("queries_ctl_normalized") or old.get("queries") or {}
    new_q = new.get("queries_ctl_normalized") or new.get("queries") or {}
    basis = ("ctl_normalized"
             if "queries_ctl_normalized" in old and "queries_ctl_normalized" in new
             else "raw (one side predates gated-median methodology)")

    slow, rows = [], []
    for q in sorted(set(old_q) & set(new_q)):
        delta = new_q[q] / old_q[q] - 1.0
        rows.append(f"  {q:28s} {old_q[q]:8.3f} -> {new_q[q]:8.3f}  {delta:+.1%}")
        if delta > RULE:
            slow.append((q, delta))
    print(f"basis: {basis}")
    print("\n".join(rows))
    for q in sorted(set(new_q) - set(old_q)):
        print(f"  {q:28s} NEW {new_q[q]:.3f}")

    ck_mismatch = []
    old_ck, new_ck = old.get("checksums") or {}, new.get("checksums") or {}
    for q in sorted(set(old_ck) & set(new_ck)):
        if old_ck[q] != new_ck[q]:
            ck_mismatch.append(q)
    unstable = new.get("checksums_unstable") or []

    ok = not slow and not ck_mismatch and not unstable
    print(json.dumps({
        "rule_violations": [{"query": q, "delta": round(d, 3)} for q, d in slow],
        "checksum_mismatches": ck_mismatch,
        "checksums_unstable_within_round": unstable,
        "pass": ok,
    }))
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
