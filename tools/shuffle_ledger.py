#!/usr/bin/env python3
"""Render SHUFFLE_LEDGER.md from a ScalingProbe sweep.

Usage:
    sbt -batch "runMain graft.tools.ScalingProbe all /root/testdata/sf0.01 1" \
        2>&1 | tee /tmp/ledger.log
    python3 tools/shuffle_ledger.py /tmp/ledger.log [...more logs] > SHUFFLE_LEDGER.md

Reads every `{"probe":"scaling",...}` line (later files override earlier
ones for the same query, so an incremental re-probe of a few queries can
be appended as a second log), and emits the committed ledger table sorted
by descending shuffle-write bytes. The table is the full-registry
extension of PipelineSpec's top-10 byte ceilings: the pins FAIL on
regression, the ledger makes every query's exchange width reviewable.
"""
import json
import sys

rows = {}
for path in sys.argv[1:]:
    with open(path) as f:
        for line in f:
            line = line.strip()
            # sbt prefixes forked-run stdout with nothing, but be lenient
            i = line.find('{"probe":"scaling"')
            if i < 0:
                continue
            r = json.loads(line[i:])
            rows[r["q"]] = r

if not rows:
    sys.exit("no scaling-probe lines found")

sfs = {r["sf"] for r in rows.values()}
if len(sfs) != 1:
    sys.exit(f"expected one sf dir, got {sfs} — pass a single-sf sweep")
sf = sfs.pop()

ordered = sorted(rows.values(), key=lambda r: (-r["shuffleMB"], r["q"]))
total = sum(r["shuffleMB"] for r in ordered)
zero = sum(1 for r in ordered if r["shuffleMB"] < 0.005)

print(f"""# Shuffle-write ledger (full bench registry, {sf.rsplit('/', 1)[-1]})

The currency of a 100 TB run is bytes crossing exchanges — wall-time
noise masks a widened shuffle, bytes don't. This ledger records total
shuffle-WRITE bytes (`tools.ShuffleMeter`, task-metrics listener) and
warm wall time for every bench-registry query at {sf.rsplit('/', 1)[-1]},
single warm rep (bytes are rep-stable: same plan, same data; wall times
here are load-sensitive — BENCH_HISTORY.md is the timing ledger).

Regression teeth live in PipelineSpec: the heaviest queries are pinned
at ≤2× these bytes, and a new exchange in a pinned query fails the
suite. This file extends visibility to the whole registry so a review
can ask "why does THIS query shuffle at all?" line by line.

Regenerate:
```bash
sbt -batch "runMain graft.tools.ScalingProbe all {sf} 1" 2>&1 | tee /tmp/ledger.log
python3 tools/shuffle_ledger.py /tmp/ledger.log > SHUFFLE_LEDGER.md
```

Queries: {len(ordered)} · total shuffle write: {total:.1f} MB ·
zero-shuffle (<5 KB): {zero}

| query | shuffle write (MB) | warm sec |
|---|---:|---:|""")
for r in ordered:
    print(f"| {r['q']} | {r['shuffleMB']:.2f} | {r['sec']:.3f} |")
