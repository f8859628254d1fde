#!/usr/bin/env python
"""Build a SELF-CONSISTENT occupancy fixture: GT disparity = the frozen
base model's own predicted inverse depth.

Thin CLI over ``soccdpt_tpu.data.synthetic.make_selfconsistent_bdd_fixture``
(see its docstring for the why). Round-5 measurement: occupancy training
on this fixture moves flagship val IoU to 3.0x the predict-all baseline
where the procedural fixtures stay pinned at the floor
(TRAIN_BENCH.jsonl tags occ_iou_train / occ_iou_train_selfconsistent).

Usage:
  python scripts/selfconsistent_occ_fixture.py --out /tmp/bdd_fixture_sc
  python -m soccdpt_tpu.cli.train_occupancy -t dpt_swin2_tiny_256 \
      -b /tmp/bdd_fixture_sc --grid 64 64 16 --pos_weight auto \
      --iou_every 100 --bench_jsonl TRAIN_BENCH.jsonl ...
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/bdd_fixture_sc")
    ap.add_argument("--model_type", default="dpt_swin2_tiny_256")
    ap.add_argument("--version", type=int, default=3)
    ap.add_argument("--frames_per_seq", type=int, default=8)
    ap.add_argument(
        "--width", type=int, default=1024,
        help="fixture camera width; at 128x96 the GT voxelizer's "
        ">=10-points-per-cell threshold leaves only ~3 occupied cells "
        "per frame — the 1024x768 default yields a dense (~0.8%%), "
        "learnable GT sheet",
    )
    ap.add_argument("--height", type=int, default=768)
    args = ap.parse_args()

    from soccdpt_tpu.data.synthetic import make_selfconsistent_bdd_fixture

    make_selfconsistent_bdd_fixture(
        args.out,
        model_type=args.model_type,
        version=args.version,
        frames_per_seq=args.frames_per_seq,
        width=args.width,
        height=args.height,
    )
    print(f"self-consistent fixture at {args.out}")


if __name__ == "__main__":
    main()
