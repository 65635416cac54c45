"""Latest-wins view over the append-only benchmark notebook (results.csv).

results.csv is a lab log: every sweep appends rows, so a benchmark name can
appear many times with mixed vintages.  This tool resolves "current" as the
LAST row per benchmark name and prints (or writes) the deduplicated table,
so README/PROFILE numbers have a single source of truth.

Usage:
    python -m benchmarks.current            # print current table
    python -m benchmarks.current --write    # refresh benchmarks/CURRENT.md
"""

from __future__ import annotations

import argparse
import csv
import os
import re
import sys

HERE = os.path.dirname(os.path.abspath(__file__))


def _impossible_utilization(row: dict) -> bool:
    """True when the row's notes claim MFU or HFU above 100% — a physically
    impossible number that indicates broken flops accounting (the r2 bs=8
    row once published MFU=102.7%); such rows are never republished."""
    m = re.findall(r"(?:MFU|HFU)=([0-9.]+)%", row.get("notes", ""))
    return any(float(v) > 100.0 for v in m)


def current_rows(csv_path: str | None = None) -> list[dict]:
    path = csv_path or os.path.join(HERE, "results.csv")
    latest: dict[str, dict] = {}
    with open(path) as f:
        for row in csv.DictReader(f):
            if _impossible_utilization(row):
                print(f"refusing to publish {row['benchmark']!r}: "
                      f"MFU/HFU > 100% in notes (broken accounting); "
                      f"re-measure and append a corrected row",
                      file=sys.stderr)
                # a bad row also must not shadow an older good one
                continue
            latest[row["benchmark"]] = row  # append order == time order
    return list(latest.values())


def to_markdown(rows: list[dict]) -> str:
    head = ["benchmark", "resolution", "batch", "dtype",
            "steps_per_sec", "images_per_sec", "notes"]
    lines = [
        "# Current benchmark numbers (latest row per benchmark in results.csv)",
        "",
        "Regenerate with `python -m benchmarks.current --write` after a sweep.",
        "",
        "| " + " | ".join(head) + " |",
        "|" + "|".join("---" for _ in head) + "|",
    ]
    for r in rows:
        lines.append("| " + " | ".join(r.get(c, "") for c in head) + " |")
    return "\n".join(lines) + "\n"


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--csv", default=None)
    p.add_argument("--write", action="store_true",
                   help="write benchmarks/CURRENT.md instead of stdout")
    args = p.parse_args(argv)
    md = to_markdown(current_rows(args.csv))
    if args.write:
        out = os.path.join(HERE, "CURRENT.md")
        with open(out, "w") as f:
            f.write(md)
        print(f"wrote {out}")
    else:
        print(md, end="")


if __name__ == "__main__":
    main()
