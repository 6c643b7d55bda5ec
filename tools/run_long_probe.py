#!/usr/bin/env python
"""Run the long textured accuracy protocol (eval/long_probe.py) standalone.

Usage:
  python tools/run_long_probe.py [family ...] [--duration 60] [--seed 8]
         [--override key=value ...] [--width W]

Families default to all four (mono stereo fisheye vislam). Prints one JSON
line per family. Runs on the ambient backend (TPU under the driver; set
JAX_PLATFORMS=cpu for local smoke runs — use --width to shrink)."""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("families", nargs="*",
                    default=["mono", "stereo", "fisheye", "vislam"])
    ap.add_argument("--duration", type=float, default=60.0)
    ap.add_argument("--seed", type=int, default=8)
    ap.add_argument("--frame-rate", type=float, default=10.0)
    ap.add_argument("--width", type=int, default=None)
    ap.add_argument("--override", action="append", default=[],
                    help="group.name=value parameter override")
    args = ap.parse_args()

    from hybvio_tpu.eval.long_probe import run_long_probe

    overrides = {}
    for kv in args.override:
        k, _, v = kv.partition("=")
        overrides[k] = v

    for family in args.families:
        t0 = time.perf_counter()
        r = run_long_probe(family, duration=args.duration, seed=args.seed,
                           frame_rate=args.frame_rate, width=args.width,
                           overrides=overrides or None)
        r["family"] = family
        r["total_wall_s"] = round(time.perf_counter() - t0, 1)
        print(json.dumps(r))
        sys.stdout.flush()


if __name__ == "__main__":
    main()
