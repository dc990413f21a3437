"""Summarize a jax.profiler trace: per-op self-time on the TPU track.

Usage:
  python tools/trace_summary.py <logdir-or-trace.json.gz> [--by-shape] [-n 30]

Aggregates the XLA-Ops track of a Perfetto trace written by
`jax.profiler.trace` (e.g. via `tools/profile_serve.py` or
`ullava_tpu.utils.profiling.trace`). Self-time subtracts nested children,
so container ops (while/closed_call wrappers) don't double count;
`--by-shape` keys on the full HLO instruction text, which is how the
round-2/3 SAM-encode copy elimination targets were found.
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os
import re
import sys


def find_trace(path: str) -> str:
    if os.path.isfile(path):
        return path
    hits = sorted(glob.glob(os.path.join(path, "**", "*.trace.json.gz"), recursive=True))
    if not hits:
        raise SystemExit(f"no *.trace.json.gz under {path}")
    return hits[-1]


def load_ops(fp: str):
    with gzip.open(fp, "rt") as f:
        data = json.load(f)
    evs = data["traceEvents"]
    threads = {}
    for e in evs:
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            threads[(e["pid"], e.get("tid"))] = e["args"].get("name", "")
    return [
        e for e in evs
        if e.get("ph") == "X" and e.get("dur")
        and threads.get((e.get("pid"), e.get("tid"))) == "XLA Ops"
    ]


def self_times(ops, key_fn):
    """Interval-stack self-time: parent duration minus nested children."""
    ops = sorted(ops, key=lambda e: (e["ts"], -e["dur"]))
    stack, out, counts = [], collections.Counter(), collections.Counter()
    for e in ops:
        ts, dur = e["ts"], e["dur"]
        while stack and ts >= stack[-1][1]:
            stack.pop()
        key = key_fn(e)
        if stack:
            out[stack[-1][2]] -= dur
        out[key] += dur
        counts[key] += 1
        stack.append((ts, ts + dur, key))
    return out, counts


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("path")
    ap.add_argument("--by-shape", action="store_true",
                    help="key on the HLO instruction text (args.long_name)")
    ap.add_argument("-n", type=int, default=30)
    args = ap.parse_args()

    fp = find_trace(args.path)
    ops = load_ops(fp)
    if not ops:
        raise SystemExit("no XLA Ops events found (is this a device trace?)")

    if args.by_shape:
        key_fn = lambda e: (
            re.sub(r"[\d.]+$", "", e["name"])
            + ": "
            + e.get("args", {}).get("long_name", e.get("args", {}).get("shape", ""))[:110]
        )
    else:
        key_fn = lambda e: re.sub(r"[\d.]+$", "", e["name"])

    times, counts = self_times(ops, key_fn)
    total = sum(times.values())
    print(f"trace: {fp}")
    print(f"total device self-time: {total / 1000:.1f} ms")
    for key, dur in times.most_common(args.n):
        print(f"{dur / 1000:9.2f} ms x{counts[key]:5d}  {key}")


if __name__ == "__main__":
    main()
