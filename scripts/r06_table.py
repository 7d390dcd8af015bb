"""Emit the round-6 before/after markdown table from the bench artifacts."""
import json
import sys

r5 = json.load(open("BENCH_r05.json"))["parsed"]["queries"]
arts = [json.load(open(p)) for p in sys.argv[1:]]
names = list(r5)
print("| query | r5 official | r6 best-of-runs | ratio | per-run |")
print("|---|---|---|---|---|")
tot5 = tot6 = 0.0
for n in names:
    vals = [a["queries"][n] for a in arts]
    best = min(vals)
    tot5 += r5[n]
    tot6 += best
    runs = " / ".join(f"{v:.2f}" for v in vals)
    print(f"| {n} | {r5[n]:.3f} | {best:.3f} | {best / r5[n]:.2f}x | {runs} |")
print(f"| **sum of per-query best** | **{tot5:.2f}** | **{tot6:.2f}** | "
      f"**{tot6 / tot5:.2f}x** | |")
for a in arts:
    print(f"run total {a['value']}  calm_waits {a['calm_waits']} "
          f"faults {a['fault_us_per_page']}")
