"""Parse a cli/train dispatch trace (RR_TRACE_DISPATCH_STEP) with xprof
hlo_stats and print per-category device self-time, to attribute the
cached-E2E vs benchmark-anchor gap (VERDICT r4 item 3).

Usage: python benchmarks/analyze_train_trace.py /tmp/rr_train_trace [steps]
"""

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from benchmarks.profile_denoise import find_xspaces, summarize_hlo, tool_table


def main():
    logdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/rr_train_trace"
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    xspaces = find_xspaces(logdir)
    if not xspaces:
        print("no xplane.pb under", logdir)
        return 1
    print("trace:", xspaces[-1])
    rows = tool_table([xspaces[-1]], "hlo_stats")
    full, total = summarize_hlo(rows, len(rows))
    by_cat = {}
    for r in full:
        c = by_cat.setdefault(r["category"], [0.0, 0])
        c[0] += r["time_us"]
        c[1] += 1
    print(f"\ndevice self-time {total/1e6:.2f} s over {steps} steps = "
          f"{total/1e3/steps:.1f} ms/step")
    print(f"{'category':<30} {'ms/step':>9} {'share':>6} {'#ops':>6}")
    for cat, (us, n) in sorted(by_cat.items(), key=lambda kv: -kv[1][0]):
        print(f"{str(cat)[:30]:<30} {us/1e3/steps:>9.2f} {us/total*100:>5.1f}% "
              f"{n:>6}")
    print("\ntop 25 ops:")
    print(f"{'share':>6} {'us/step':>9} {'category':<22} {'bound':>8}  name")
    for r in full[:25]:
        print(f"{r['time_us']/total*100:>5.1f}% {r['time_us']/1e3/steps*1e3:>9.1f} "
              f"{str(r['category'])[:22]:<22} {str(r['bound_by'] or ''):>8}  "
              f"{str(r['name'])[:60]}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
