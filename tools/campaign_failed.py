"""Print the campaign step ids whose log section has no success marker.

A step's section is the lines between its ``--- [X] ...`` header and the next
header. Success markers per step kind mirror tools/campaign_retry.sh. Retry
sections (``[X] retry OK``) count as success for X.

Usage: python tools/campaign_failed.py [/tmp/chip_campaign.log]
"""

import re
import sys

MARKERS = {
    "A": '"metric"', "B": '"metric"', "D": '"metric"', "E": '"metric"',
    "H": '"metric"', "I": '"metric"', "J": '"metric"', "K": '"metric"',
    "L": '"metric"', "S": '"metric"', "T": '"metric"',
    "C": "img/s", "O": "img/s", "Q": "img/s", "R": "img/s",
    "N": "p50", "U": "p50",
    "M": re.compile(r"PASS|FAIL"),
    "F": re.compile(r"tflops|bound|TOTAL"),
    "G": re.compile(r"tflops|bound|TOTAL"),
    "P": re.compile(r"top-?1|PASS|FAIL|acc", re.I),
}


def main(path="/tmp/chip_campaign.log"):
    sections = {}
    sid = None
    for ln in open(path):
        m = re.match(r"--- \[(\w+)\]", ln)
        if m:
            sid = m.group(1)
            sections.setdefault(sid, []).append(ln)
        elif sid:
            sections[sid].append(ln)
    failed = []
    for sid, want in MARKERS.items():
        body = "".join(sections.get(sid, []))
        if not body:
            failed.append(sid)  # never ran
            continue
        ok = want.search(body) if hasattr(want, "search") else (want in body)
        if not ok:
            failed.append(sid)
    print(" ".join(failed))


if __name__ == "__main__":
    main(*sys.argv[1:])
