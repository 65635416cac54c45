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
    """EXACTLY the bench.py headline program (flash attention backend,
    BrushNet CFG dedup, precomputed temb tables, bf16 weights) — a trace of
    any other variant would attribute time to ops the headline never runs
    (the first capture of this tool profiled einsum attention by accident:
    1 GiB fp32 logits per layer, +9 ms/step)."""
    import bench

    bench.set_attention_backend("flash")
    unet, uparams, brushnet, bparams = bench.build(dtype)
    denoise = bench.make_denoise(unet, brushnet, steps, batch, dtype)  # jitted
    latents = jax.random.normal(jax.random.PRNGKey(2), (batch, 64, 64, 4), jnp.float32)
    cond = jax.random.normal(jax.random.PRNGKey(3), (batch, 64, 64, 6), jnp.float32)
    embeds = jax.random.normal(jax.random.PRNGKey(4), (2 * batch, 77, 768), jnp.float32)
    return denoise, (uparams, bparams, latents, cond, embeds)


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
    # hlo_stats / framework_op_stats arrive as gviz JSON ({cols, rows}) or
    # CSV depending on xprof vintage; normalize both to list-of-dicts
    try:
        parsed = json.loads(data)
    except (json.JSONDecodeError, TypeError):
        return list(csv.DictReader(io.StringIO(data)))
    if isinstance(parsed, dict) and "cols" in parsed and "rows" in parsed:
        labels = [c.get("label") or c.get("id") for c in parsed["cols"]]
        return [
            {lab: (cell or {}).get("v") for lab, cell in zip(labels, r["c"])}
            for r in parsed["rows"]
        ]
    return parsed


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
            "category": fget(r, "hlo_op_category", "hlo_category",
                             "category") or "?",
            "name": (fget(r, "hlo_op_name", "op_name") or "?"),
            "expression": fget(r, "hlo_op_text", "hlo_op_expression") or "",
            "flops_rate": fget(r, "model_gflop/s", "normalized_gflop/s",
                               "measured_gflops/sec", "gflops/sec"),
            "bw": fget(r, "measured_memory_bw_(gib/s)",
                       "measured_memory_bw_(gb/sec)", "memory_bw_(gb/sec)"),
            "hbm_bw": fget(r, "hbm_bw_(gib/s)"),
            "intensity": fget(r, "operational_intensity_(flops/byte)"),
            "bound_by": fget(r, "bound_by"),
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
    p.add_argument("--parse_only", action="store_true",
                   help="skip capture; parse an existing --logdir trace")
    args = p.parse_args(argv)

    logdir = args.logdir or f"/tmp/rr_trace_bs{args.batch}"
    if not args.parse_only:
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
    print(f"{'share':>6} {'us/step':>9} {'category':<18} {'GF/s':>8} "
          f"{'GiB/s':>7} {'F/B':>6} {'bound':>7}  name")
    for r in top:
        print(f"{r['time_us']/total*100:>5.1f}% {r['time_us']/nsteps:>9.1f} "
              f"{str(r['category'])[:18]:<18} "
              f"{str(r['flops_rate'] or ''):>8} {str(r['bw'] or ''):>7} "
              f"{str(r['intensity'] or ''):>6} {str(r['bound_by'] or ''):>7}  "
              f"{str(r['name'])[:60]}")
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
