#!/usr/bin/env python3
"""Mechanical bench-delta extraction: every per-query ratio >= threshold
between two bench JSONs, so the bench-notes canary table is complete by
construction instead of by eyeball.

Handles truncated files (the driver's BENCH_rN.json keeps only a tail
fragment): per-query pairs are recovered by regex over whatever text is
present, so a query missing from a truncated file is reported as
'unknown-in-old', never silently treated as new.

Usage: python3 tools/bench_deltas.py OLD.json NEW.json [threshold]
"""
import re
import sys


def pairs(path):
    text = open(path, errors="replace").read()
    # driver BENCH_rN.json wraps the bench line in {"tail": "..."} with
    # escaped quotes; unwrap so the same regex sees plain "name":sec
    try:
        import json
        d = json.loads(text)
        if isinstance(d, dict) and isinstance(d.get("tail"), str):
            text = d["tail"]
    except ValueError:
        pass
    return dict(
        (m.group(1), float(m.group(2)))
        for m in re.finditer(r'"([a-z0-9_]+)":\s*([0-9]+\.[0-9]+)', text)
        if m.group(1) not in ("value", "sf"))


def main(old_path, new_path, threshold):
    old, new = pairs(old_path), pairs(new_path)
    rows = []
    for q, t in sorted(new.items()):
        if q in old:
            if old[q] > 0 and t / old[q] >= threshold:
                rows.append((t / old[q], q, old[q], t))
        else:
            rows.append((None, q, None, t))
    print(f"| Query | old s | new s | ratio |")
    print(f"|---|---|---|---|")
    for r, q, o, t in sorted(rows, key=lambda x: -(x[0] or 0)):
        if r is None:
            print(f"| `{q}` | (absent/truncated in old) | {t:.2f} | new |")
        else:
            print(f"| `{q}` | {o:.2f} | {t:.2f} | {r:.2f}x |")
    n_flagged = sum(1 for r, *_ in rows if r is not None)
    print(f"\n{n_flagged} queries >= {threshold}x; "
          f"{len(rows) - n_flagged} absent in old file; "
          f"{len(new)} measured total.")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2],
         float(sys.argv[3]) if len(sys.argv) > 3 else 1.3)
