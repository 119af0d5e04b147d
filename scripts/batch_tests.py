#!/usr/bin/env python
"""Method-comparison matrix: run every exploration method across seeds
(parity: batch_tests.sh — train -> fingerprint -> identify across seeds).

  python scripts/batch_tests.py --steps 200 --seeds 0 1 2 --small
"""

import argparse
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--methods", nargs="+",
                    default=["entklerg", "unifklerg", "uniform", "randomWalk"])
    ap.add_argument("--seeds", nargs="+", type=int, default=[0])
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--out", default="runs")
    ap.add_argument("--small", action="store_true")
    args = ap.parse_args()

    for seed in args.seeds:
        for method in args.methods:
            cmd = [sys.executable, os.path.join(HERE, "run_experiment.py"),
                   "--method", method, "--seed", str(seed),
                   "--steps", str(args.steps), "--out", args.out]
            if args.small:
                cmd.append("--small")
            print("==>", " ".join(cmd), flush=True)
            subprocess.run(cmd, check=True)


if __name__ == "__main__":
    main()
