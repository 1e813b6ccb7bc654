"""Parse a jax.profiler xplane trace into a per-op device-time table.

Host-side only (no TPU). Aggregates TPU-plane event durations by HLO op
name, groups pallas kernels / fusions / convolutions, and prints the top
ops and a category rollup.

Usage:
  PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python \
      python scripts/parse_trace.py /tmp/unet_trace [--top 40]
"""
from __future__ import annotations

import argparse
import collections
import glob
import os
import re
import sys


def load_xspace(logdir: str):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = sorted(glob.glob(os.path.join(logdir, "plugins/profile/*/*.xplane.pb")))
    if not paths:
        sys.exit(f"no xplane.pb under {logdir}")
    xs = xplane_pb2.XSpace()
    with open(paths[-1], "rb") as f:
        xs.ParseFromString(f.read())
    return xs, paths[-1]


def categorize(name: str) -> str:
    n = name.lower()
    if "stw" in n or "swdpa" in n:
        return "pallas:?"
    if re.search(r"custom-call", n) or "pallas" in n or "mosaic" in n:
        return "pallas/custom"
    if "conv" in n:
        return "conv"
    if "fusion" in n:
        return "fusion"
    if "copy" in n or "transpose" in n or "bitcast" in n:
        return "copy/layout"
    if "dot" in n or "einsum" in n:
        return "dot"
    if "all-reduce" in n or "collective" in n:
        return "collective"
    return "other"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("logdir")
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--iters", type=int, default=3,
                    help="traced iterations; times are divided by this")
    ap.add_argument("--line", default="XLA Ops",
                    help="substring of the timeline line to analyze "
                         "(default: the synchronous XLA op line)")
    args = ap.parse_args()

    xs, path = load_xspace(args.logdir)
    print("parsed", path)

    per_op = collections.Counter()
    per_op_count = collections.Counter()
    for plane in xs.planes:
        if "TPU" not in plane.name and "/device" not in plane.name.lower():
            continue
        ev_names = plane.event_metadata
        for line in plane.lines:
            lname = line.name.lower()
            # XLA op lines carry per-op events; skip step/annotation lines
            if "step" in lname:
                continue
            for ev in line.events:
                md = ev_names.get(ev.metadata_id)
                name = md.name if md else str(ev.metadata_id)
                per_op[(plane.name, line.name, name)] += ev.duration_ps
                per_op_count[(plane.name, line.name, name)] += 1

    # choose the busiest (plane, line) group: that's the XLA op timeline
    by_line = collections.Counter()
    for (pl, ln, name), ps in per_op.items():
        by_line[(pl, ln)] += ps
    print("\nlines by total time:")
    for (pl, ln), ps in by_line.most_common(8):
        print(f"  {pl} :: {ln}   {ps/1e9/args.iters:9.3f} ms/iter")

    if not by_line:
        sys.exit("no device events found")
    matches = [k for k in by_line if args.line.lower() == k[1].lower()] or \
              [k for k in by_line if args.line.lower() in k[1].lower()]
    busiest = matches[0] if matches else max(by_line, key=by_line.get)
    pl_name, ln_name = busiest

    rows = [(name, ps, per_op_count[(pl, ln, name)])
            for (pl, ln, name), ps in per_op.items()
            if (pl, ln) == busiest]
    rows.sort(key=lambda r: -r[1])

    cats = collections.Counter()
    for name, ps, _ in rows:
        cats[categorize(name)] += ps

    print(f"\ntop {args.top} ops on [{pl_name} :: {ln_name}] (ms/iter):")
    for name, ps, cnt in rows[: args.top]:
        print(f"  {ps/1e9/args.iters:9.3f} ms  x{cnt:4d}  {name[:110]}")

    print("\ncategory rollup (ms/iter):")
    for cat, ps in cats.most_common():
        print(f"  {cat:14s} {ps/1e9/args.iters:9.3f}")
    total = sum(cats.values())
    print(f"  {'TOTAL':14s} {total/1e9/args.iters:9.3f}")


if __name__ == "__main__":
    main()
