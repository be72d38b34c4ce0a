"""Summarise a chip-campaign log into a compact table.

The round's measurement campaign (`/tmp/chip_campaign.sh`) appends
`--- [X] title ---` markers and per-step outputs (bench JSON lines,
profiler tables, PASS/FAIL lines) to a log. This prints one row per
step: the marker plus the step's JSON metrics or last PASS/FAIL lines.

Usage: python tools/campaign_report.py [/tmp/chip_campaign.log]
"""

import json
import sys


def main(path="/tmp/chip_campaign.log"):
    try:
        lines = open(path).read().splitlines()
    except FileNotFoundError:
        print(f"no campaign log at {path}")
        return 1
    section = None
    rows = []
    for ln in lines:
        if ln.startswith("--- ") or ln.startswith("=== "):
            section = ln.strip("-= ").strip()
            rows.append((section, []))
            continue
        if not rows:
            continue
        s = ln.strip()
        if s.startswith("{"):
            try:
                d = json.loads(s)
            except json.JSONDecodeError:
                continue
            keep = {
                k: d[k]
                for k in (
                    "value", "step_ms", "batch_size", "tflops_per_sec",
                    "mfu_vs_v5e_peak", "results", "metric",
                )
                if k in d
            }
            rows[-1][1].append(json.dumps(keep))
        elif s.startswith(("PASS", "FAIL")) or "img/s" in s or "ms/step" in s:
            rows[-1][1].append(s)
    for title, data in rows:
        print(f"\n## {title}")
        for d in data:
            print(f"  {d}")
    return 0


if __name__ == "__main__":
    sys.exit(main(*sys.argv[1:]))
