#!/usr/bin/env python3
"""Programmatic bench-flag enumeration (round-13 verdict "next round #5").

Diffs a round-close bench_detail.json against the PREVIOUS round's
column in BENCH_HISTORY.md (its main table's last numeric column) and
prints EVERY query whose new warm median exceeds the runbook threshold
(default 1.3x) — plus each flagged query's per-query load, rep count and
warm spread from bench_detail.json, the adjudication inputs. The round-13
close note hand-picked 5 of 11 flags; this makes the enumeration
mechanical so only the adjudication stays human.

Since r17 the detail file carries graft.Bench's interleaved q1_agg
control; each flag is auto-annotated `ambient` when its ratio is at or
below the control's own history ratio (run contention, not a
regression), and the whole artifact is declared self-invalidating when
the control itself exceeds the threshold. Only `ADJUDICATE` rows need
a human idle re-time.

Usage: bench_flags.py [bench_detail.json] [BENCH_HISTORY.md] [threshold]
                      [column]
`column` names the history column to diff against (substring match on
the header, e.g. "r14"); without it the LAST header column is used.
Either way the tool PRINTS which column it compared against — running
it after the new round's column was appended would otherwise silently
diff the bench against itself (the r14 ADVICE finding), and a row
whose newest cell is blank would silently compare against an older
round.
Exit code is always 0 (flags are inputs to adjudication, not failures).
"""
import json
import re
import sys


def history_column(path, column=None):
    """(column_header, {query: value}) from the MAIN table (the first
    table in the file; frozen note tables further down must not be
    touched -- BENCH_HISTORY's round-13 repair note). `column` selects
    a header by substring; default is the last header column. Rows
    whose cell in that column is blank/non-numeric are reported as
    absent rather than silently falling back to an older round.
    """
    out = {}
    in_main = False
    col_idx = None
    col_name = None
    with open(path, encoding="utf-8") as f:
        for line in f:
            if line.startswith("| query |"):
                if col_idx is not None:  # a later table: main harvested
                    break
                headers = [c.strip() for c in
                           line.strip().strip("|").split("|")][1:]
                if column is None:
                    col_idx, col_name = len(headers) - 1, headers[-1]
                else:
                    hits = [(i, h) for i, h in enumerate(headers)
                            if column in h]
                    if not hits:
                        sys.exit(f"no history column matching '{column}' "
                                 f"(headers: {headers})")
                    col_idx, col_name = hits[-1]
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
            vals = cells[1:]
            if col_idx < len(vals) and re.fullmatch(r"[0-9.]+",
                                                    vals[col_idx]):
                out[name] = float(vals[col_idx])
    return col_name, out


def main():
    detail_path = sys.argv[1] if len(sys.argv) > 1 else "bench_detail.json"
    hist_path = sys.argv[2] if len(sys.argv) > 2 else "BENCH_HISTORY.md"
    threshold = float(sys.argv[3]) if len(sys.argv) > 3 else 1.3
    column = sys.argv[4] if len(sys.argv) > 4 else None
    detail = json.load(open(detail_path, encoding="utf-8"))
    queries = detail["queries"]
    col_name, prev = history_column(hist_path, column)

    # Ambient ratio from the run's interleaved control (graft.Bench
    # stamps `control` since r17): the control's median over the run
    # divided by its own history cell. A flag whose ratio is at or
    # below the ambient ratio re-times AT the run's own slowdown — the
    # r15/r16 adjudications found every such flag to be run contention,
    # so they are auto-annotated `ambient` (humans adjudicate only what
    # exceeds the control). Control past the threshold = the artifact
    # is self-invalidating.
    ctl = detail.get("control")
    ambient = None
    if (ctl and ctl.get("median", -1) > 0
            and prev.get(ctl.get("name"), 0) > 0):
        ambient = ctl["median"] / prev[ctl["name"]]

    flags, missing, n_ambient = [], [], 0
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
            is_ambient = ambient is not None and ratio <= ambient
            n_ambient += is_ambient
            flags.append((ratio, name, prev[name], warm, d.get("load", -1),
                          d.get("reps", 0), spread, is_ambient))

    print(f"# bench flags >{threshold}x vs history column '{col_name}' "
          f"({len(flags)} of {len(queries)} queries; "
          f"{len(missing)} new/unhistoried)")
    if ambient is not None:
        print(f"# control {ctl['name']}: median {ctl['median']:.2f} vs "
              f"history {prev[ctl['name']]:.2f} -> ambient ratio "
              f"{ambient:.2f}x (samples min {ctl.get('min', -1):.2f}, "
              f"n={len(ctl.get('samples', []))}); "
              f"{n_ambient} flags at-or-below ambient auto-annotated")
        if ambient > threshold:
            print(f"# RUN SELF-INVALIDATING: the control itself ran "
                  f"{ambient:.2f}x its history cell (> {threshold}x "
                  f"threshold) — this artifact measures the box, not the "
                  f"code; adjudicate only flags ABOVE the ambient ratio")
    elif ctl:
        print(f"# control {ctl.get('name')} present but not in history "
              f"column '{col_name}' — no ambient annotation")
    else:
        print("# no control block in detail (pre-r17 artifact) — no "
              "ambient annotation")
    print("| query | prev | now | ratio | load | reps | wmax/wmin | "
          "verdict |")
    print("|---|---|---|---|---|---|---|---|")
    for (ratio, name, p, w, load, reps, spread,
         is_ambient) in sorted(flags, reverse=True):
        verdict = "ambient" if is_ambient else "ADJUDICATE"
        print(f"| {name} | {p:.2f} | {w:.2f} | {ratio:.2f}x | "
              f"{load:.2f} | {reps} | {spread:.2f}x | {verdict} |")
    if missing:
        print(f"\nqueries with no numeric '{col_name}' cell: "
              f"{', '.join(sorted(missing))}")


if __name__ == "__main__":
    main()
