#!/usr/bin/env python3
"""Evaluate the ScaleProbe pins (VERDICT r12 item 1) over SCALE_PROBE.json.

Pins:
  (a) near-linear wall-time growth: t(100x)/t(10x) <= 20 per target
      (generous linear envelope: fixed per-job costs amortize with
      scale, so honest linear designs land well under 10x; superlinear
      candidate generation blows straight past 20x);
  (b) no whole-stage-codegen fallbacks at any scale; join-strategy
      flips are REPORTED (broadcast->shuffled at scale is the designed
      stats-based behavior), not auto-failed;
  (c) flat driver retention: post-GC, post-cache-clear heap after the
      100x pass within 2 GiB of the 10x pass (bounded driver state is
      O(centroids/codebook/seeds), not O(corpus)).

Usage: python3 tools/scale_check.py SCALE_PROBE.json
Exit 1 on any pin violation.
"""
import json
import sys

LINEAR_ENVELOPE = 20.0
HEAP_SLACK_MB = 2048

def main(path):
    with open(path) as f:
        d = json.load(f)
    targets = sorted({k.rsplit("_x", 1)[0] for k in d if k.startswith("q_")})
    scales = sorted({int(k.rsplit("_x", 1)[1]) for k in d if k.startswith("q_")})
    fails = []
    print(f"{'query':28s} " + "  ".join(f"x{s:<8d}" for s in scales) +
          "  t(max)/t(mid)  flips")
    for q in targets:
        row = {s: d.get(f"{q}_x{s}") for s in scales}
        secs = {s: row[s]["sec"] for s in scales if row[s]}
        ratio = None
        if len(scales) >= 3 and scales[-1] in secs and scales[-2] in secs:
            ratio = secs[scales[-1]] / max(secs[scales[-2]], 1e-9)
            if ratio > LINEAR_ENVELOPE * (scales[-1] / scales[-2]) / 10.0:
                fails.append(f"{q}: t(x{scales[-1]})/t(x{scales[-2]}) = "
                             f"{ratio:.1f} exceeds the linear envelope "
                             f"{LINEAR_ENVELOPE:.0f}")
        flips = []
        for a, b in zip(scales, scales[1:]):
            ra, rb = row.get(a), row.get(b)
            if ra and rb:
                for key, lbl in [("bhj", "broadcast"), ("smj", "sortmerge"),
                                 ("shj", "shuffledhash")]:
                    if ra[key] != rb[key]:
                        flips.append(f"{lbl} {ra[key]}->{rb[key]} @x{b}")
        for s in scales:
            if row.get(s) and row[s].get("codegen_fallback"):
                fails.append(f"{q}: codegen fallback at x{s}")
        print(f"{q:28s} " +
              "  ".join(f"{secs.get(s, float('nan')):<9.3f}" for s in scales) +
              f"  {ratio:.2f}x" + (" " * 10) + ("; ".join(flips) or "-"))
    heaps = {int(k.rsplit("_x", 1)[1].split("_")[0]): v
             for k, v in d.items() if k.startswith("heap_after_x")}
    if len(heaps) >= 2:
        ss = sorted(heaps)
        growth = heaps[ss[-1]] - heaps[ss[-2]]
        print(f"driver heap after scales {ss}: "
              f"{[heaps[s] for s in ss]} MB (last delta {growth:+d} MB)")
        if growth > HEAP_SLACK_MB:
            fails.append(f"driver heap grew {growth} MB between x{ss[-2]} "
                         f"and x{ss[-1]} (> {HEAP_SLACK_MB} MB slack)")
    if fails:
        print("\nFAIL:")
        for f_ in fails:
            print(f"  {f_}")
        sys.exit(1)
    print("\nPASS: all scale pins hold")

if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "SCALE_PROBE.json")
