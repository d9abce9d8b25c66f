"""Summarize the round-2g measurement queue's logs (/tmp/r2g_*.log).

Prints one comparison table: fused (HEAD default) vs nofuse
(TPU_SAGE_FUSE_LAST=0, the round-2e behavior) per config, plus the
chunking A/B and the reference rows to beat. Run after
scripts/measure_r2g.sh completes (the tunnel watcher chains it).

    python scripts/analyze_r2g.py [--dir /tmp]
"""

import argparse
import glob
import json
import os
import re
import sys

# round-2e measured rows (RESULTS.md) — the numbers the fusion must beat
BASELINE = {
    "headline": 45.5e6,       # mean int8 (bench_mean_chunk1)
    "agg_gcn": 38.6e6,
    "agg_mean_pool": 27.1e6,
    "agg_max_pool": 24.8e6,
    "agg_attention": 23.8e6,
    "agg_lstm": 19.8e6,
    "csr": 23.9e6,
    "headline_bf16": 37.5e6,
}


def last_json(path):
    """Last parseable JSON object line in a log (bench prints one line)."""
    out = None
    try:
        with open(path) as f:
            for line in f:
                line = line.strip()
                if line.startswith("{"):
                    try:
                        out = json.loads(line)
                    except json.JSONDecodeError:
                        pass
    except OSError:
        return None
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", default="/tmp")
    args = ap.parse_args()

    rows = {}
    for path in sorted(glob.glob(os.path.join(args.dir, "r2g_*.log"))):
        name = re.sub(r"^r2g_|\.log$", "", os.path.basename(path))
        rows[name] = last_json(path)

    if not rows:
        print("no r2g_*.log files found — has measure_r2g.sh run?")
        return 1

    print(f"{'config':24} {'edges/s':>12} {'ms/step':>8} {'vs 2e':>8} {'verdict'}")
    for name in sorted(rows):
        r = rows[name]
        if not r or "value" not in r:
            print(f"{name:24} {'(no result)':>12}")
            continue
        v = r["value"]
        base_key = name.replace("_nofuse", "").replace("_nochunk", "")
        base = BASELINE.get(base_key)
        rel = f"{v / base:7.2%}" if base else "       -"
        verdict = ""
        if name.endswith("_nofuse"):
            fused = rows.get(name.replace("_nofuse", ""))
            if fused and "value" in fused:
                d = fused["value"] / v - 1
                verdict = f"fusion {'WINS' if d > 0 else 'REGRESSES'} {d:+.1%}"
        print(f"{name:24} {v:12,.0f} {r.get('ms_per_step', ''):>8} {rel:>8} {verdict}")

    probe = rows.get("probe")
    if probe is None:
        for path in glob.glob(os.path.join(args.dir, "r2g_probe.log")):
            with open(path) as f:
                t = f.read()
            print("\npallas probe:", "PASS" if "True" in t else
                  ("FAIL/HANG" if t.strip() else "no output"))
    return 0


if __name__ == "__main__":
    sys.exit(main())
