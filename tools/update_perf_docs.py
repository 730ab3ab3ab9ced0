#!/usr/bin/env python
"""Regenerate README.md's bench-measured perf rows from a bench.py JSON.

Round-4 lesson: README throughput claims and the official BENCH_r{N}.json
artifact drifted (one contaminated timed window under-recorded a mode by
4.4x). This script makes the README rows a FUNCTION of the artifact: run
bench.py, then

  python tools/update_perf_docs.py BENCH_JSON [--readme README.md] [--check]

BENCH_JSON is either the driver artifact ({"parsed": {...}}) or bench.py's
raw output line. Only the rows bench.py measures are rewritten; rows from
other benchmarks (kernel-family comparisons, quality scores) are left
alone. --check exits 1 if the README is out of date without writing.
"""

import argparse
import json
import re
import sys


def fmt_k(v):
    return f"{v / 1000:.1f}k"


def build_rows(b):
    """README row label -> regenerated value cell, all from the bench JSON."""
    base = b["value"]
    vd = b["train_rays_per_sec_viewdirs"]
    vde = b["train_rays_per_sec_viewdirs_exact"]
    split = b["train_rays_per_sec_block_split"]
    mfu = b.get("mfu", {})

    def pct_overhead(x):
        return f"{round(100 * (1 - x / base)):.0f}%"

    rows = {
        "training throughput (default f32 numerics)":
            f"{fmt_k(base)} rays/s ({b['steps_per_sec']} steps/s, "
            f"{b['mfu_vs_bf16_peak'] * 100:.1f}% MFU vs bf16 peak)",
        "training throughput (`compute_dtype = bfloat16`)":
            f"{fmt_k(b['train_rays_per_sec_bf16'])} rays/s",
        "training with `use_viewdirs` (approx FD dirs)":
            f"{fmt_k(vd)} rays/s ({pct_overhead(vd)} overhead)",
        "training with `use_viewdirs` (exact jvp dirs)":
            f"{fmt_k(vde)} rays/s ({pct_overhead(vde)} overhead)",
        "training with test-latent optimization":
            f"{split / 1024:.1f} steps/s = {fmt_k(split)} rays/s "
            f"(−{round(100 * (1 - split / base)):.0f}% throughput, "
            f"exactly one extra backward"
            + (f", {mfu['block_split'] * 100:.1f}% MFU at its 5x-forward "
               f"cost" if "block_split" in mfu else "")
            + "; reference reports ~30%)",
        "rendering throughput":
            f"{fmt_k(b['render_rays_per_sec'])} rays/s",
    }
    return rows


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("bench_json")
    ap.add_argument("--readme", default="README.md")
    ap.add_argument("--check", action="store_true")
    args = ap.parse_args(argv)

    with open(args.bench_json) as f:
        b = json.load(f)
    if "parsed" in b:  # driver artifact wrapper
        b = b["parsed"]
    rows = build_rows(b)

    with open(args.readme) as f:
        text = f.read()
    changed = []
    for label, value in rows.items():
        # table row: | <label> | <value> | <ref cell> |
        pat = re.compile(r"^(\| " + re.escape(label) + r" \| )([^|]*?)( \|)",
                         re.M)
        m = pat.search(text)
        if not m:
            print(f"WARNING: row not found in {args.readme}: {label!r}",
                  file=sys.stderr)
            continue
        if m.group(2) != value:
            changed.append((label, m.group(2), value))
            text = pat.sub(lambda mm: mm.group(1) + value + mm.group(3),
                           text, count=1)

    if not changed:
        print(f"{args.readme}: perf rows already match {args.bench_json}")
        return 0
    for label, old, new in changed:
        print(f"{label}:\n  - {old}\n  + {new}")
    if args.check:
        print(f"{args.readme} is OUT OF DATE vs {args.bench_json}")
        return 1
    with open(args.readme, "w") as f:
        f.write(text)
    print(f"rewrote {len(changed)} rows in {args.readme}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
