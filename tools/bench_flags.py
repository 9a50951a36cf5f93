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
control. Since r18 the adjudication is POSITION-LOCAL (round-17 verdict
"next round #1": the global control median closed a contended run at
0.91x while per-query loads spiked to 6.6, leaving 26 rows for a human
to idle re-time — the burst that inflated them was visible in control
sample #10 at 2.612 s, but a single global ratio averaged it away).
Each query knows its RUN POSITION (stamped `pos` since r18; derived
from the detail file's insertion order for older artifacts, which is
the run order) and each control sample its own position (`positions`
since r18; derived from the `every` cadence otherwise). A flag is
auto-annotated `ambient` when its history ratio is at or below the
LOCAL ambient ratio — the max of the two control samples bracketing
its run position (a contention burst between samples is seen by at
least one of its brackets; max, not nearest, so a query halfway
between a clean and a burst sample is judged against the burst it may
have straddled). The 15-query cadence still cannot see a burst that
rose and fell entirely between two clean samples, so a SECOND
positional signal closes that gap: when the run is BURSTY (some
control sample itself crossed the flag threshold — ambient provably
exceeded the regression bar somewhere in the run), a flag whose own
stamped 1-min load exceeds the idle bar (0.8; the close ritual
requires load < 0.3 before a close run, so a proper close is never
touched by this rule) is annotated `ambient(load)` — it ran during
measured machine activity inside a run where ambient is known to have
crossed the bar. Only `ADJUDICATE` rows need a human idle re-time.
The artifact is declared self-invalidating when the control's MEDIAN
exceeds the threshold — in that case ambient-annotated rows are also
unverified (a genuine regression smaller than the run's contention
ratio hides below it) and the whole artifact needs an idle re-run,
not just the ADJUDICATE rows.

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


def control_positions(ctl, n_queries):
    """Run positions of the control samples. r18+ artifacts stamp them
    (`positions`, aligned with `samples`); for older artifacts they are
    reconstructed from graft.Bench's fixed cadence: one sample before
    query 0, one before every `every`-th query, one after the last.
    Reconstruction is exact for any artifact that Bench produced —
    the cadence has been deterministic since the control landed in r17.
    """
    if "positions" in ctl:
        return list(ctl["positions"])
    every = ctl.get("every", 15)
    pos = [0] + [i for i in range(every, n_queries, every)] + [n_queries]
    # A failed sample (swallowed by Bench) would shift alignment; the
    # caller compares lengths and falls back to global-only.
    return pos


def local_ambient(qpos, samples, positions, prev_cell):
    """Max ratio of the two control samples bracketing run position
    `qpos` (or the single nearest when qpos is outside the sampled
    range). Returns None when no sample is usable."""
    before = [(p, s) for p, s in zip(positions, samples)
              if p <= qpos and s > 0]
    after = [(p, s) for p, s in zip(positions, samples)
             if p > qpos and s > 0]
    picks = []
    if before:
        picks.append(max(before)[1])
    if after:
        picks.append(min(after)[1])
    if not picks or prev_cell <= 0:
        return None
    return max(picks) / prev_cell


def main():
    detail_path = sys.argv[1] if len(sys.argv) > 1 else "bench_detail.json"
    hist_path = sys.argv[2] if len(sys.argv) > 2 else "BENCH_HISTORY.md"
    threshold = float(sys.argv[3]) if len(sys.argv) > 3 else 1.3
    column = sys.argv[4] if len(sys.argv) > 4 else None
    detail = json.load(open(detail_path, encoding="utf-8"))
    queries = detail["queries"]
    col_name, prev = history_column(hist_path, column)

    # Global ambient ratio (r17 behavior, kept for the header line and
    # self-invalidation call): the control's median over the run divided
    # by its own history cell. Per-flag verdicts use the POSITION-LOCAL
    # ratio below.
    ctl = detail.get("control")
    ambient = None
    ctl_samples, ctl_pos = [], []
    if (ctl and ctl.get("median", -1) > 0
            and prev.get(ctl.get("name"), 0) > 0):
        ambient = ctl["median"] / prev[ctl["name"]]
        ctl_samples = [s for s in ctl.get("samples", [])]
        ctl_pos = control_positions(ctl, len(queries))
        if len(ctl_pos) != len(ctl_samples):
            # a swallowed sample broke alignment — positions unusable
            ctl_samples, ctl_pos = [], []

    # run position per query: explicit `pos` (r18+) else insertion
    # order, which is the run order (Bench writes results in sequence
    # and json.load preserves object order)
    order = {name: i for i, name in enumerate(queries)}

    # Bursty run: some control sample itself crossed the flag threshold
    # — ambient provably exceeded the regression bar at least once
    # during the run. In that state the load-stamp rule (header doc)
    # may close flags the sparse control cadence cannot bracket.
    LOAD_IDLE_BAR = 0.8
    bursty = False
    if ctl_samples and prev.get(ctl.get("name"), 0) > 0:
        cell = prev[ctl["name"]]
        bursty = any(s / cell > threshold for s in ctl_samples if s > 0)

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
            qpos = d.get("pos", order[name])
            qload = d.get("load", -1)
            loc = None
            if ctl_samples:
                loc = local_ambient(qpos, ctl_samples, ctl_pos,
                                    prev[ctl["name"]])
            if loc is None:
                loc = ambient  # no positional data: global fallback
            verdict = "ADJUDICATE"
            if loc is not None and ratio <= loc:
                verdict = "ambient"
            elif bursty and qload > LOAD_IDLE_BAR:
                verdict = "ambient(load)"
            n_ambient += verdict != "ADJUDICATE"
            flags.append((ratio, name, prev[name], warm, qload,
                          d.get("reps", 0), spread, loc, verdict))

    print(f"# bench flags >{threshold}x vs history column '{col_name}' "
          f"({len(flags)} of {len(queries)} queries; "
          f"{len(missing)} new/unhistoried)")
    if ambient is not None:
        mode = ("position-local (bracketing control samples)"
                if ctl_samples else "GLOBAL ONLY (sample positions "
                "unavailable)")
        print(f"# control {ctl['name']}: median {ctl['median']:.2f} vs "
              f"history {prev[ctl['name']]:.2f} -> global ambient ratio "
              f"{ambient:.2f}x (samples min {ctl.get('min', -1):.2f}, "
              f"n={len(ctl.get('samples', []))}); adjudication {mode}; "
              f"bursty={'yes' if bursty else 'no'}; "
              f"{n_ambient} flags auto-annotated ambient "
              f"(local-control or load rule)")
        if ambient > threshold:
            print(f"# RUN SELF-INVALIDATING: the control itself ran "
                  f"{ambient:.2f}x its history cell (> {threshold}x "
                  f"threshold) — this artifact measures the box, not the "
                  f"code. NOTE: in this state `ambient` rows are ALSO "
                  f"unverified (a real regression smaller than the run's "
                  f"contention ratio hides below it); re-run the whole "
                  f"bench at idle rather than re-timing only ADJUDICATE "
                  f"rows")
    elif ctl:
        print(f"# control {ctl.get('name')} present but not in history "
              f"column '{col_name}' — no ambient annotation")
    else:
        print("# no control block in detail (pre-r17 artifact) — no "
              "ambient annotation")
    print("| query | prev | now | ratio | load | reps | wmax/wmin | "
          "local_amb | verdict |")
    print("|---|---|---|---|---|---|---|---|---|")
    for (ratio, name, p, w, load, reps, spread, loc,
         verdict) in sorted(flags, reverse=True):
        loc_s = f"{loc:.2f}x" if loc is not None else "—"
        print(f"| {name} | {p:.2f} | {w:.2f} | {ratio:.2f}x | "
              f"{load:.2f} | {reps} | {spread:.2f}x | {loc_s} | "
              f"{verdict} |")
    if missing:
        print(f"\nqueries with no numeric '{col_name}' cell: "
              f"{', '.join(sorted(missing))}")


if __name__ == "__main__":
    main()
