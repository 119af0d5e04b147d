#!/usr/bin/env python
"""Capture an overhead photo of the workspace (parity: scripts/capture_ws —
drive above the tray center and photograph the scene).

  python scripts/capture_ws.py --out workspace.png
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="workspace.png")
    ap.add_argument("--img", type=int, default=360)
    ap.add_argument("--z", type=float, default=0.5)
    args = ap.parse_args()

    from ealv_tpu.utils.config import TRAY_LIM
    from ealv_tpu.sim import TrayScene
    from ealv_tpu.sim.renderer import render_camera

    xc = sum(TRAY_LIM["x"]) / 2
    yc = sum(TRAY_LIM["y"]) / 2
    img = render_camera(TrayScene.default(),
                        jnp.asarray([xc, yc, args.z, 0.0, 0.0, 0.0]),
                        brightness=1.0, img_hw=(args.img, args.img), fov=1.4)
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    plt.imsave(args.out, np.clip(np.asarray(img), 0, 1))
    print(f"workspace photo ({args.img}x{args.img}, z={args.z}) -> {args.out}")


if __name__ == "__main__":
    main()
