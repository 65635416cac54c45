"""Per-op profile of the exact denoise step (VERDICT r2 item 3).

Captures a real `jax.profiler` trace of the 512² CFG denoise scan at bs=1
and bs=8 on the chip, parses the xplane with xprof (tensorboard profile
plugin backend), and emits a top-op table: self time, share, and the
achieved-vs-roofline picture needed to reconcile the PROFILE.md ceiling
claim with the measured batch-scaling curve.

Reference analogue: the reference's only profiling is
torch.utils.benchmark latency rows (MirrorFusion/benchmarks/utils.py);
the op-level view here is the TPU-native replacement.

Usage: python benchmarks/profile_denoise.py [--batch 1] [--steps 10]
           [--logdir /tmp/rr_trace] [--tool hlo_stats] [--top 25]
"""

from __future__ import annotations

import argparse
import csv
import glob
import io
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from reflecting_reality_tpu.core.jit_cache import enable_default_compilation_cache

enable_default_compilation_cache()

import jax
import jax.numpy as jnp


def build_denoise(batch, steps, dtype=jnp.bfloat16):
    from benchmark_mirrorfusion import build_models, denoise_inputs, make_denoise

    unet, uparams, brushnet, bparams = build_models(dtype)
    denoise = make_denoise(unet, brushnet, steps, batch, 64, dtype)  # jitted
    inputs = denoise_inputs(batch, 64, dtype)
    return denoise, (uparams, bparams) + inputs


def capture(logdir, fn, args):
    out = fn(*args)  # compile outside the trace
    jax.block_until_ready(out)
    with jax.profiler.trace(logdir):
        out = fn(*args)
        jax.block_until_ready(out)
    return out


def find_xspaces(logdir):
    return sorted(glob.glob(os.path.join(logdir, "**", "*.xplane.pb"),
                            recursive=True))


def tool_table(xspaces, tool):
    """Returns list-of-dicts rows for an xprof tool ('hlo_stats' etc.)."""
    from xprof.convert import raw_to_tool_data

    data, _ = raw_to_tool_data.xspace_to_tool_data(xspaces, tool, {})
    if isinstance(data, bytes):
        data = data.decode("utf-8", errors="replace")
    # hlo_stats / framework_op_stats arrive as gviz CSV or JSON; handle both
    try:
        parsed = json.loads(data)
        return parsed
    except (json.JSONDecodeError, TypeError):
        rows = list(csv.DictReader(io.StringIO(data)))
        return rows


def summarize_hlo(rows, top):
    """Rank by self time; group fusions by a readable op label."""
    def fget(r, *names):
        for n in names:
            for k in r:
                if k.lower().replace(" ", "_") == n:
                    return r[k]
        return None

    table = []
    for r in rows:
        t = fget(r, "total_self_time_(us)", "self_time_(us)", "self_time")
        if t is None:
            continue
        try:
            t = float(t)
        except ValueError:
            continue
        table.append({
            "time_us": t,
            "category": fget(r, "hlo_category", "category") or "?",
            "name": (fget(r, "hlo_op_expression", "hlo_op_name", "op_name")
                     or "?"),
            "flops_rate": fget(r, "measured_gflops/sec", "gflops/sec"),
            "bw": fget(r, "measured_memory_bw_(gb/sec)", "memory_bw_(gb/sec)"),
            "occurrences": fget(r, "#occurrences", "occurrences"),
        })
    table.sort(key=lambda r: -r["time_us"])
    total = sum(r["time_us"] for r in table) or 1.0
    return table[:top], total


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--steps", type=int, default=10)
    p.add_argument("--logdir", default=None)
    p.add_argument("--tool", default="hlo_stats")
    p.add_argument("--top", type=int, default=25)
    p.add_argument("--list_tools", action="store_true")
    p.add_argument("--csv_out", default=None,
                   help="dump the FULL ranked table as csv")
    args = p.parse_args(argv)

    logdir = args.logdir or f"/tmp/rr_trace_bs{args.batch}"
    fn, inputs = build_denoise(args.batch, args.steps)
    capture(logdir, fn, inputs)
    xspaces = find_xspaces(logdir)
    if not xspaces:
        print("ERROR: no xplane.pb produced — device tracing unsupported "
              "on this backend?", file=sys.stderr)
        return 1
    print(f"trace: {xspaces[-1]}")

    if args.list_tools:
        from xprof.convert import raw_to_tool_data

        print(raw_to_tool_data.xspace_to_tool_names(xspaces))
        return 0

    rows = tool_table([xspaces[-1]], args.tool)
    if args.tool != "hlo_stats":
        print(json.dumps(rows)[:4000])
        return 0
    top, total = summarize_hlo(rows, args.top)
    nsteps = args.steps
    print(f"\ntotal device self-time {total/1e3:.2f} ms over {nsteps} steps "
          f"(bs={args.batch}) = {total/1e3/nsteps:.2f} ms/step")
    print(f"{'share':>6} {'us/step':>9} {'category':<22} "
          f"{'GF/s':>8} {'GB/s':>7}  name")
    for r in top:
        print(f"{r['time_us']/total*100:>5.1f}% {r['time_us']/nsteps:>9.1f} "
              f"{r['category'][:22]:<22} "
              f"{str(r['flops_rate'] or ''):>8} {str(r['bw'] or ''):>7}  "
              f"{r['name'][:90]}")
    if args.csv_out:
        full, _ = summarize_hlo(rows, len(rows))
        with open(args.csv_out, "w", newline="") as f:
            w = csv.DictWriter(f, fieldnames=list(full[0].keys()))
            w.writeheader()
            w.writerows(full)
        print(f"full table -> {args.csv_out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
