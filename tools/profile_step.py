"""Capture and attribute an xprof trace of the bench train step.

Usage (on the TPU host):

    python tools/profile_step.py [--scale cifar100|imagenet] [--batch N]
    python tools/profile_step.py --trace /tmp/prof   # re-analyse existing trace

Runs ``bench.py`` with BENCH_PROFILE to capture a jax.profiler trace, then
parses it with xprof and prints (a) step time attributed to pipeline
subsystems (frozen backbone / VQ / graph build / GNN matcher / optimizer) and
(b) the top HLO ops with their bound-by classification. This is the loop that
drove the round-2 kernel work (see PERFORMANCE.md optimisation log): profile,
find the top fusion, decide dense-op vs Pallas, re-measure.

Backend quirk (see memory notes): the xprof "time" metric normalises to zero
on this backend — use rawTime / total_self_time_percent, as done here.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import subprocess
import sys
from collections import defaultdict

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

GROUPS = (
    # (label, predicate over the HLO op's jax op_name path)
    ("frozen backbone fwd", lambda n: "ingredient_backbone/backbone" in n or "backbone/backbone" in n),
    ("VQ / capture", lambda n: "ingredient_backbone" in n),
    ("GNN matcher", lambda n: "matcher" in n or "gnn" in n.lower()),
    ("graph build / atlas", lambda n: "schema_net" in n or "instance" in n or "slot" in n),
    ("optimizer/projection", lambda n: bool(re.search(r"train_step\)/(add|mul|div|sub|sqrt|integer_pow)", n))),
)


def capture(trace_dir: str, scale: str, batch: int | None, steps: int) -> None:
    env = dict(os.environ, BENCH_PROFILE=trace_dir, BENCH_SCALE=scale, BENCH_STEPS=str(steps))
    if batch:
        env["BENCH_BATCH"] = str(batch)
    print(f"profiling bench (scale={scale}) into {trace_dir} ...", file=sys.stderr)
    subprocess.run([sys.executable, os.path.join(REPO, "bench.py")], env=env, check=True)


def analyse(trace_dir: str, top: int = 20) -> None:
    from xprof.convert.raw_to_tool_data import xspace_to_tool_data

    pbs = glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"), recursive=True)
    if not pbs:
        sys.exit(f"no xplane.pb under {trace_dir}")
    # a trace dir accumulates one session subdir per capture; mixing sessions
    # makes xprof return None — analyse only the newest capture
    pbs = [max(pbs, key=os.path.getmtime)]
    data, _ = xspace_to_tool_data(pbs, "hlo_stats", {})
    d = json.loads(data)
    cols = [c["id"] for c in d["cols"]]
    ix = {k: cols.index(k) for k in (
        "hlo_op_name", "tf_op_name", "total_self_time_percent", "bound_by", "occurrences",
    )}
    rows = [[c.get("v") for c in r["c"]] for r in d["rows"]]

    groups: dict = defaultdict(float)
    bound: dict = defaultdict(lambda: defaultdict(float))
    for v in rows:
        name = str(v[ix["tf_op_name"]])
        pct = v[ix["total_self_time_percent"]] or 0
        for label, pred in GROUPS:
            if pred(name):
                break
        else:
            label = "other"
        groups[label] += pct
        bound[label][v[ix["bound_by"]]] += pct

    print("== step time by subsystem ==")
    for g, p in sorted(groups.items(), key=lambda kv: -kv[1]):
        bb = ", ".join(f"{k}:{vv:.1f}" for k, vv in sorted(bound[g].items(), key=lambda kv: -kv[1]))
        print(f"{p:5.1f}%  {g:<24} [{bb}]")

    print(f"\n== top {top} HLO ops ==")
    rows.sort(key=lambda v: -(v[ix["total_self_time_percent"]] or 0))
    for v in rows[:top]:
        print(
            f"{v[ix['total_self_time_percent']]:5.2f}% x{v[ix['occurrences']]:<4}"
            f" {str(v[ix['bound_by']]):<9} {str(v[ix['hlo_op_name']])[:30]:<30}"
            f" {str(v[ix['tf_op_name']])[:160]}"
        )


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--trace", default=None, help="existing trace dir (skip capture)")
    ap.add_argument("--scale", default="cifar100", choices=("cifar100", "imagenet"))
    ap.add_argument("--batch", type=int, default=None)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--top", type=int, default=20)
    args = ap.parse_args()

    trace_dir = args.trace or "/tmp/schemanet_prof"
    if args.trace is None:
        capture(trace_dir, args.scale, args.batch, args.steps)
    analyse(trace_dir, args.top)


if __name__ == "__main__":
    main()
