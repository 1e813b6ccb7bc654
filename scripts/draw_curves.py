"""Loss/metric curve plotting from metrics.jsonl (mirrors the reference's
scripts/{DM,AE}/draw_curve*.py jpg outputs, driven by structured logs)."""
from __future__ import annotations

import argparse
import json
import os


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--log", required=True, help="metrics.jsonl path")
    p.add_argument("--out", default=None, help="output jpg (default: alongside log)")
    p.add_argument("--keys", nargs="*", default=None, help="metric keys to plot")
    args = p.parse_args()

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    records = [json.loads(l) for l in open(args.log) if l.strip()]
    if not records:
        print("no records")
        return
    keys = args.keys or [k for k in records[0] if k not in ("step", "time")]
    steps = [r["step"] for r in records]

    fig, axes = plt.subplots(len(keys), 1, figsize=(8, 2.5 * len(keys)), squeeze=False)
    for ax, key in zip(axes[:, 0], keys):
        ys = [r.get(key) for r in records]
        ax.plot(steps, ys)
        ax.set_ylabel(key)
        ax.grid(alpha=0.3)
    axes[-1, 0].set_xlabel("step")
    out = args.out or os.path.splitext(args.log)[0] + "_curves.jpg"
    fig.tight_layout()
    fig.savefig(out, dpi=120)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
