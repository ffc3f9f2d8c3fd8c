#!/usr/bin/env python3
"""Evaluate the ScaleProbe pins (VERDICT r12 item 1) over SCALE_PROBE.json.

The artifact is multi-wave since r14: {"wave1": {...}, "wave2": {...},
"wave3": {...}, "skew": {...}} — one flat result dict per probe wave, so
every family SCALE.md tabulates is committed and re-checkable (VERDICT
r13 item 2). A legacy flat file (top-level q_* keys) is accepted as a
single wave.

Pins, evaluated per wave:
  (a) near-linear wall-time growth: t(max)/t(mid) within the linear
      envelope scaled by the step between the two largest scales
      (20x for a 10x step; fixed per-job costs amortize with scale, so
      honest linear designs land well under it; superlinear candidate
      generation blows straight past);
  (b) no whole-stage-codegen fallbacks at any scale; join-strategy
      flips are REPORTED (broadcast->shuffled at scale is the designed
      stats-based behavior), not auto-failed;
  (c) flat driver retention: post-GC, post-cache-clear heap after the
      largest pass within 2 GiB of the previous pass (bounded driver
      state is O(centroids/codebook/seeds), not O(corpus)).

Usage: python3 tools/scale_check.py SCALE_PROBE.json [wave ...]
Exit 1 on any pin violation in any (selected) wave.
"""
import json
import sys

LINEAR_ENVELOPE = 20.0  # per 10x scale step
HEAP_SLACK_MB = 2048

def qsec(row):
    """Pin on the MIN of the recorded band (r16): adversarial waves carry
    min-of-2 cold runs under sec_runs; "sec" is already their min, but
    reading the band directly keeps the pin honest if that ever drifts."""
    return min(row.get("sec_runs") or [row["sec"]])

def check_wave(name, d):
    targets = sorted({k.rsplit("_x", 1)[0] for k in d if k.startswith("q_")})
    scales = sorted({int(k.rsplit("_x", 1)[1]) for k in d if k.startswith("q_")})
    fails = []
    print(f"== {name} ==")
    print(f"{'query':28s} " + "  ".join(f"x{s:<8d}" for s in scales) +
          "  t(max)/t(mid)  flips")
    for q in targets:
        row = {s: d.get(f"{q}_x{s}") for s in scales}
        secs = {s: qsec(row[s]) for s in scales if row[s]}
        ratio = None
        if len(scales) >= 3 and scales[-1] in secs and scales[-2] in secs:
            ratio = secs[scales[-1]] / max(secs[scales[-2]], 1e-9)
            if ratio > LINEAR_ENVELOPE * (scales[-1] / scales[-2]) / 10.0:
                fails.append(f"{q}: t(x{scales[-1]})/t(x{scales[-2]}) = "
                             f"{ratio:.1f} exceeds the linear envelope "
                             f"{LINEAR_ENVELOPE * (scales[-1] / scales[-2]) / 10.0:.0f}")
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
        rtxt = f"{ratio:.2f}x" if ratio is not None else "-"
        print(f"{q:28s} " +
              "  ".join(f"{secs.get(s, float('nan')):<9.3f}" for s in scales) +
              f"  {rtxt}" + (" " * 10) + ("; ".join(flips) or "-"))
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
    print()
    return fails

def main(path, only):
    with open(path) as f:
        d = json.load(f)
    if any(k.startswith("q_") or k.startswith("heap_") for k in d):
        waves = {"wave1": d}  # legacy flat artifact
    else:
        waves = d
    fails = []
    for name in sorted(waves):
        if only and name not in only:
            continue
        fails += [f"[{name}] {x}" for x in check_wave(name, waves[name])]
    if fails:
        print("FAIL:")
        for f_ in fails:
            print(f"  {f_}")
        sys.exit(1)
    print("PASS: all scale pins hold in all waves")

if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "SCALE_PROBE.json",
         set(sys.argv[2:]))
