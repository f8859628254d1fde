#!/usr/bin/env python
"""Run the full-size TPU timing sweep (VERDICT r1 item 9).

Runs ``soccdpt_tpu.cli.eval_timing`` once per model type in a fresh
subprocess (so a single OOM/compile-timeout cannot kill the sweep) and
appends one JSON line per type to TIMING_v5e.jsonl. Already-recorded
types are skipped unless --redo is given.
"""
from __future__ import annotations

import argparse
import json
import pathlib
import subprocess
import sys

REPO = pathlib.Path(__file__).resolve().parent.parent
OUT = REPO / "TIMING_v5e.jsonl"

ALL_TYPES = [
    "dpt_swin2_tiny_256",
    "dpt_swin2_base_384",
    "dpt_swin2_large_384",
    "dpt_swin_large_384",
    "dpt_beit_base_384",
    "dpt_beit_large_384",
    "dpt_beit_large_512",
    "dpt_next_vit_large_384",
    "dpt_levit_224",
    "dpt_large_384",
    "dpt_hybrid_384",
]


def recorded() -> set[str]:
    done = set()
    if OUT.exists():
        for line in OUT.read_text().splitlines():
            try:
                row = json.loads(line)
            except json.JSONDecodeError:
                continue
            if "hz" in row:
                done.add(row.get("model_type"))
    return done


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--timeout", type=int, default=1500)
    ap.add_argument("--redo", action="store_true")
    ap.add_argument("--types", nargs="*", default=ALL_TYPES)
    args = ap.parse_args()

    done = set() if args.redo else recorded()
    for mt in args.types:
        if mt in done:
            print(f"skip {mt} (recorded)", flush=True)
            continue
        print(f"timing {mt} ...", flush=True)
        try:
            proc = subprocess.run(
                [sys.executable, "-m", "soccdpt_tpu.cli.eval_timing",
                 "-t", mt, "--json"],
                cwd=REPO, capture_output=True, text=True,
                timeout=args.timeout,
            )
        except subprocess.TimeoutExpired:
            row = {"model_type": mt, "error": f"timeout>{args.timeout}s"}
        else:
            row = None
            for line in proc.stdout.splitlines():
                try:
                    cand = json.loads(line)
                except json.JSONDecodeError:
                    continue
                if cand.get("model_type") == mt:
                    row = cand
            if row is None:
                tail = (proc.stderr or proc.stdout).strip().splitlines()[-3:]
                row = {"model_type": mt, "error": "failed",
                       "rc": proc.returncode, "tail": tail}
        with OUT.open("a") as f:
            f.write(json.dumps(row) + "\n")
        print(json.dumps(row), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
