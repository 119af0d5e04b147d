#!/usr/bin/env python
"""Collect a grid/circular-sweep evaluation set from the synthetic scene
(parity: scripts/sensor_test_set + build_test_set.launch — capture a
deterministic sweep of (pose, image, force) tuples "for debugging").

  python scripts/collect_test_set.py --pattern grid --n 25 --out test_set.npz
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pattern", choices=["grid", "circle"], default="grid")
    ap.add_argument("--n", type=int, default=25)
    ap.add_argument("--out", default="test_set.npz")
    ap.add_argument("--z", type=float, default=0.35)
    ap.add_argument("--img", type=int, default=180)
    args = ap.parse_args()

    from ealv_tpu.utils.trajectories import grid_traj, circular_traj
    from ealv_tpu.utils.config import TRAY_LIM
    from ealv_tpu.sim import TrayScene, SyntheticEnv

    xc = sum(TRAY_LIM["x"]) / 2
    yc = sum(TRAY_LIM["y"]) / 2
    if args.pattern == "grid":
        xy = grid_traj(grid_size=TRAY_LIM["x"][1] - TRAY_LIM["x"][0],
                       num_points=args.n, center=(xc, yc))
    else:
        xy = circular_traj(radius=(TRAY_LIM["x"][1] - TRAY_LIM["x"][0]) / 3,
                           num_points=args.n, center=(xc, yc), start=0)

    env = SyntheticEnv(tray_lim=tuple(TRAY_LIM[s] for s in "xyzrpw"),
                       img_hw=(args.img, args.img))
    scene = TrayScene.default()
    poses, images, forces = [], [], []
    for x, y in xy:
        s = env.init(jnp.asarray([x, y, args.z, 3.14, 0.0, 0.0]), scene)
        pose, vel, force, img = env.observe(s)
        poses.append(np.asarray(pose))
        images.append(np.asarray(img))
        forces.append(np.asarray(force))
    np.savez_compressed(args.out, poses=np.stack(poses),
                        images=np.stack(images), forces=np.stack(forces))
    print(f"wrote {len(poses)} samples to {args.out}")


if __name__ == "__main__":
    main()
