#!/usr/bin/env python
"""Drive to each fingerprint's belief maximum and photograph it (parity:
scripts/capture_fingerprint_belief — verify localization by going there).

  python scripts/capture_fingerprint_belief.py --beliefs beliefs.npz --out caps/
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--beliefs", required=True,
                    help="npz with per-fingerprint prior grids (saved beliefs)")
    ap.add_argument("--out", default="belief_caps")
    ap.add_argument("--z", type=float, default=0.3)
    args = ap.parse_args()

    from ealv_tpu.utils.config import ExperimentConfig, TRAY_LIM
    from ealv_tpu.utils.states import ws_conversion
    from ealv_tpu.sim import TrayScene, SyntheticEnv
    from ealv_tpu.viz import EvalPlotter

    data = np.load(args.beliefs, allow_pickle=True)
    grids = data["grids"]  # (K, G, d)
    priors = data["priors"]  # (K, G)

    cfg = ExperimentConfig()
    env = SyntheticEnv(tray_lim=tuple(TRAY_LIM[s] for s in "xyzrpw"),
                       img_hw=cfg.image_dim[:2])
    scene = TrayScene.default()
    os.makedirs(args.out, exist_ok=True)

    for k in range(grids.shape[0]):
        peak = grids[k][int(np.argmax(priors[k]))]
        # belief is in robot coords over the explr states; map xy(+w) to tray
        rs = np.zeros(len(cfg.states), np.float32)
        rs[: len(peak)] = peak[: len(rs)]
        tray = np.asarray(ws_conversion(jnp.asarray(rs), jnp.asarray(cfg.robot_lim),
                                        jnp.asarray(cfg.tray_lim)))
        pose6 = np.array([tray[0], tray[1], args.z, 3.14, 0.0,
                          tray[2] if len(tray) > 2 else 0.0], np.float32)
        s = env.init(jnp.asarray(pose6), scene)
        # pose-controller approach (check_goal_pos parity)
        for _ in range(30):
            s = env.step_pose(s, jnp.asarray(pose6))
        pose, vel, force, img = env.observe(s)
        np.savez_compressed(os.path.join(args.out, f"belief_cap_{k}.npz"),
                            pose=np.asarray(pose), image=np.asarray(img))
        print(f"fingerprint {k}: belief peak (robot) {np.round(peak[:2],3)} -> "
              f"tray pose {np.round(pose6[:2],3)}, image captured")


if __name__ == "__main__":
    main()
