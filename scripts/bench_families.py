"""Measure every bench config family on the chip -> BENCH_FAMILIES_r05.json.

The driver's end-of-round ``python bench.py`` runs under a timeout that one
family's ~10-min uncacheable remote compile nearly exhausts (measured r5;
the axon tunnel ignores the local persistent compile cache), so bench.py's
default budget captures the flagship row only and marks the rest skipped.
This script is how the full table gets measured: one fresh process per
family (a transient remote-compile failure then costs one row, not the
table), each row appended to the artifact as soon as it lands.

Also measures the CPB A/B leg: the rel_pos family through the r4-style
bias pipeline (one-hot 'dot' expand, no fusion barrier) vs the r5 default
('factored' expand + optimization_barrier) in the SAME session — the
same-chip-same-day delta behind the ROADMAP claim. (The third r5 change,
the kernel-side lane broadcast replacing jnp.repeat, is not env-gated and
is active in both legs.)

Usage: python scripts/bench_families.py [--out BENCH_FAMILIES_r05.json]
                                        [--families a,b,c]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

DEFAULT_FAMILIES = [
    "flagship_1step",
    "cpb_rel_pos",
    "finetune_2step",
    "finetune_4step",
    "finetune_8step",
    "depth24",
    "rel_loss",
]


def run_family(name: str, extra_env: dict) -> dict:
    env = dict(
        os.environ,
        BENCH_FAMILIES=name,
        BENCH_BUDGET_S="3600",
        **extra_env,
    )
    t0 = time.time()
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True, text=True, cwd=REPO, env=env, timeout=3900,
    )
    row = None
    for line in reversed(proc.stdout.strip().splitlines()):
        line = line.strip()
        if line.startswith("{"):
            fams = json.loads(line).get("families", [])
            row = fams[0] if fams else None
            break
    if row is None:
        row = {
            "family": name,
            "error": f"no JSON (rc={proc.returncode}): {proc.stderr[-300:]}",
        }
    row["wall_s"] = round(time.time() - t0, 1)
    return row


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(REPO, "BENCH_FAMILIES_r05.json"))
    ap.add_argument("--families", default=",".join(DEFAULT_FAMILIES))
    ap.add_argument("--skip-ab", action="store_true")
    ap.add_argument(
        "--force", action="store_true",
        help="re-measure families already present in --out (default: skip them)",
    )
    args = ap.parse_args()

    out = {
        "what": (
            "per-family train-step throughput, one chip, measured in-round "
            "by scripts/bench_families.py (one fresh process per family; "
            "same measurement path as bench.py). The driver's BENCH_rNN.json "
            "carries the driver-verified flagship row; this artifact carries "
            "the full table the driver's timeout cannot (each family's "
            "remote compile is ~10 min on the dev tunnel, uncacheable)."
        ),
        "rows": [],
    }
    # merge with an existing artifact: a campaign interrupted (or run per
    # family across sessions) keeps every row already measured
    if os.path.exists(args.out):
        try:
            with open(args.out) as f:
                out["rows"] = json.load(f).get("rows", [])
        except (OSError, ValueError):
            pass
    done = {r.get("family") for r in out["rows"] if "error" not in r}

    def flush():
        with open(args.out, "w") as f:
            json.dump(out, f, indent=1)

    for fam in args.families.split(","):
        if fam in done and not args.force:
            print(f"skip {fam}: already measured in {args.out}", flush=True)
            continue
        row = run_family(fam, {})
        out["rows"] = [r for r in out["rows"] if r.get("family") != fam]
        out["rows"].append(row)
        flush()
        print(json.dumps(row), flush=True)

    if not args.skip_ab and ("cpb_rel_pos_r4_style_ab" not in done or args.force):
        row = run_family(
            "cpb_rel_pos",
            {"SWIN_CPB_EXPAND": "dot", "SWIN_CPB_BARRIER": "0"},
        )
        row["family"] = "cpb_rel_pos_r4_style_ab"
        out["rows"] = [
            r for r in out["rows"] if r.get("family") != "cpb_rel_pos_r4_style_ab"
        ]
        row["note"] = (
            "A/B leg: one-hot 'dot' expand + no fusion barrier (the r4 "
            "pipeline); same session as the cpb_rel_pos row above"
        )
        out["rows"].append(row)
        flush()
        print(json.dumps(row), flush=True)

    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
