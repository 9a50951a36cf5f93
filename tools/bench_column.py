#!/usr/bin/env python3
"""Append a round-close column to BENCH_HISTORY.md's MAIN table.

The manual edit has now produced the same defect twice (r16 shipped a
merged `r15 (close)  r16 (close)` header cell, which made bench_flags
silently diff the wrong column; the r17 close nearly repeated it), so
the append is mechanical from here on:

    python3 tools/bench_column.py bench_detail.json BENCH_HISTORY.md "r18 (close)"

- reads each query's warm median from bench_detail.json;
- appends one cell to the header, the separator, and every data row of
  the FIRST table only (frozen note tables further down are untouched);
- queries not yet in the table get a new row with em-dash prior cells;
- failed queries (warm < 0) get an em-dash cell;
- refuses an existing column name (re-running is a no-op error, never a
  duplicate column);
- asserts afterwards that the header, separator, and every data row
  have identical cell counts — the class of defect this tool exists to
  prevent fails loudly here.

Writes in place. Exit 0 on success, non-zero with a message otherwise.
"""
import json
import sys


def main():
    if len(sys.argv) != 4:
        sys.exit("usage: bench_column.py <bench_detail.json> "
                 "<BENCH_HISTORY.md> <column name>")
    detail_path, hist_path, col = sys.argv[1], sys.argv[2], sys.argv[3]
    detail = json.load(open(detail_path, encoding="utf-8"))
    warm = {k: v.get("warm", -1) for k, v in detail["queries"].items()}

    lines = open(hist_path, encoding="utf-8").read().split("\n")
    out, in_main, done_main, seen = [], False, False, set()
    ncols = None

    def cell(name):
        v = warm.get(name)
        return f" {v:.2f} |" if v is not None and v >= 0 else " — |"

    for ln in lines:
        if not done_main and ln.startswith("| query |"):
            if col in ln:
                sys.exit(f"column '{col}' already present in the header "
                         "— refusing to append a duplicate")
            if not ln.endswith("|"):
                sys.exit("malformed header (does not end with '|') — "
                         "repair the table first")
            ncols = ln.count("|") - 1  # columns before the append
            out.append(ln + f" {col} |")
            in_main = True
            continue
        if in_main:
            if ln.startswith("|---"):
                out.append(ln + "---|")
                continue
            if ln.startswith("|"):
                if not ln.endswith("|"):
                    sys.exit(f"malformed row (does not end with '|'): {ln}")
                name = ln.strip("|").split("|")[0].strip()
                seen.add(name)
                out.append(ln + cell(name))
                continue
            # main table just ended: add rows for queries new this round
            for name in sorted(set(warm) - seen):
                out.append("| " + name + " |" + " — |" * (ncols - 1)
                           + cell(name))
            in_main, done_main = False, True
        out.append(ln)

    # table ends at EOF (file has no trailing non-table line): flush the
    # same table-end handling the loop would have run — without this the
    # rows were appended but the tool exited "no main table found"
    # (r17 ADVICE)
    if in_main:
        for name in sorted(set(warm) - seen):
            out.append("| " + name + " |" + " — |" * (ncols - 1)
                       + cell(name))
        in_main, done_main = False, True

    if not done_main:
        sys.exit("no main table found (no '| query |' header)")

    # the invariant this tool exists for: uniform cell counts in the
    # MAIN table (the first '| query |' table; frozen note tables
    # further down keep whatever shape they historically have)
    width = None
    for ln in out:
        if width is None and ln.startswith("| query |"):
            width = ln.count("|")
            continue
        if width is not None:
            if not ln.startswith("|"):
                break  # main table ended
            if ln.count("|") != width:
                sys.exit(f"cell-count mismatch after append ({ln.count('|')}"
                         f" vs {width}): {ln[:80]}")

    open(hist_path, "w", encoding="utf-8").write("\n".join(out))
    n_new = len(set(warm) - seen)
    print(f"appended column '{col}': {len(warm)} queries "
          f"({n_new} new rows)")


if __name__ == "__main__":
    main()
