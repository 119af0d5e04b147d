#!/usr/bin/env python
"""Capture fingerprints at manually specified locations (parity:
scripts/build_manual_fingerprints — the manual-location variant of the
fingerprint capture pipeline).

  python scripts/build_manual_fingerprints.py \
      --ckpt runs/synth/entklerg_0000/checkpoints/step_0001000 \
      --config runs/synth/entklerg_0000/config.yaml \
      --centers='-0.4,-0.4,0;0.4,0.5,0' --out fingerprints/
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--centers", required=True,
                    help="semicolon-separated robot-coord centers, e.g. "
                         "'-0.4,-0.4,0;0.4,0.5,0' (single argument so "
                         "negative coordinates survive argparse)")
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--mode", default="sphere", choices=["sphere", "cone", "cylinder"])
    ap.add_argument("--out", default="fingerprints")
    args = ap.parse_args()

    from ealv_tpu.utils.config import ExperimentConfig
    from ealv_tpu.runtime import Experiment
    from ealv_tpu.runtime.checkpoint import load_checkpoint
    from ealv_tpu.fingerprint.capture import capture_fingerprint

    cfg = ExperimentConfig.from_yaml(args.config)
    exp = Experiment(cfg)
    es = exp.init(seed=0)
    es = load_checkpoint(args.ckpt, es)

    os.makedirs(args.out, exist_ok=True)
    for i, c in enumerate(args.centers.split(";")):
        center = np.asarray([float(v) for v in c.split(",")], np.float32)
        fp = capture_fingerprint(exp.model, es.params, cfg, center,
                                 num_steps=args.steps, mode=args.mode, seed=i)
        path = os.path.join(args.out, f"manual_{i}_{args.mode}.npz")
        np.savez_compressed(path, **fp)
        print(f"fingerprint {i}: {fp['x'].shape[0]} samples -> {path}")


if __name__ == "__main__":
    main()
