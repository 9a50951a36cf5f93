#!/usr/bin/env python3
"""Programmatic bench-flag enumeration (round-13 verdict "next round #5").

Diffs a round-close bench_detail.json against the PREVIOUS round's
column in BENCH_HISTORY.md (its main table's last numeric column) and
prints EVERY query whose new warm median exceeds the runbook threshold
(default 1.3x) — plus each flagged query's per-query load, rep count and
warm spread from bench_detail.json, the adjudication inputs. The round-13
close note hand-picked 5 of 11 flags; this makes the enumeration
mechanical so only the adjudication stays human.

Usage: bench_flags.py [bench_detail.json] [BENCH_HISTORY.md] [threshold]
Exit code is always 0 (flags are inputs to adjudication, not failures).
"""
import json
import re
import sys


def history_last_column(path):
    """query -> last numeric value in the MAIN table (the first table in
    the file; frozen note tables further down must not be touched --
    BENCH_HISTORY's round-13 repair note)."""
    out = {}
    in_main = False
    with open(path, encoding="utf-8") as f:
        for line in f:
            if line.startswith("| query |"):
                if out:  # a later table: main one already harvested
                    break
                in_main = True
                continue
            if not in_main:
                continue
            if not line.startswith("|"):
                if out:
                    break
                continue
            cells = [c.strip() for c in line.strip().strip("|").split("|")]
            if not cells or cells[0].startswith("---") or not cells[0]:
                continue
            name = cells[0]
            vals = [c for c in cells[1:] if re.fullmatch(r"[0-9.]+", c)]
            if vals:
                out[name] = float(vals[-1])
    return out


def main():
    detail_path = sys.argv[1] if len(sys.argv) > 1 else "bench_detail.json"
    hist_path = sys.argv[2] if len(sys.argv) > 2 else "BENCH_HISTORY.md"
    threshold = float(sys.argv[3]) if len(sys.argv) > 3 else 1.3
    detail = json.load(open(detail_path, encoding="utf-8"))
    queries = detail["queries"]
    prev = history_last_column(hist_path)

    flags, missing = [], []
    for name, d in sorted(queries.items()):
        warm = d.get("warm", -1)
        if name not in prev:
            missing.append(name)
            continue
        if warm < 0 or prev[name] <= 0:
            continue
        ratio = warm / prev[name]
        if ratio > threshold:
            spread = (d.get("wmax", 0) / max(d.get("wmin", 0), 1e-9))
            flags.append((ratio, name, prev[name], warm, d.get("load", -1),
                          d.get("reps", 0), spread))

    print(f"# bench flags >{threshold}x vs previous column "
          f"({len(flags)} of {len(queries)} queries; "
          f"{len(missing)} new/unhistoried)")
    print("| query | prev | now | ratio | load | reps | wmax/wmin |")
    print("|---|---|---|---|---|---|---|")
    for ratio, name, p, w, load, reps, spread in sorted(flags, reverse=True):
        print(f"| {name} | {p:.2f} | {w:.2f} | {ratio:.2f}x | "
              f"{load:.2f} | {reps} | {spread:.2f}x |")
    if missing:
        print(f"\nnew queries (no previous column): {', '.join(sorted(missing))}")


if __name__ == "__main__":
    main()
