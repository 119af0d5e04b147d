#!/usr/bin/env python
"""Replay a finished run offline: reload its checkpoint + metrics and
re-render dashboards and model-eval panels (parity: the debug_plotter
process, plotting/debug_plotter.py:19 — replays saved artifacts through the
model without touching the robot).

  python scripts/replay_run.py --run runs/synth/entklerg_0000 [--test-set ts.npz]
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
    ap.add_argument("--run", required=True, help="run directory")
    ap.add_argument("--test-set", default=None,
                    help="optional collect_test_set npz for model eval")
    ap.add_argument("--out", default=None, help="output dir (default: run dir)")
    args = ap.parse_args()

    from ealv_tpu.utils.config import ExperimentConfig
    from ealv_tpu.runtime import Experiment
    from ealv_tpu.runtime.checkpoint import load_checkpoint, latest_checkpoint
    from ealv_tpu.viz import TrainingPlotter, ExplorationPlotter

    out = args.out or args.run
    cfg = ExperimentConfig.from_yaml(os.path.join(args.run, "config.yaml"))
    exp = Experiment(cfg)
    es = exp.init(seed=cfg.seed)
    ck = latest_checkpoint(os.path.join(args.run, "checkpoints"))
    if ck is None:
        print("no checkpoint found", file=sys.stderr)
        sys.exit(1)
    es = load_checkpoint(ck, es)
    print(f"loaded {ck} (step {int(es.explr_step)})")

    # training curves from the saved series
    mpath = os.path.join(args.run, "metrics.npz")
    if os.path.exists(mpath):
        series = dict(np.load(mpath))
        TrainingPlotter(out).render(series, name="replay_training.png")
        print("rendered replay_training.png")

    # live view + model reconstruction at the checkpointed state
    pose, vel, force, img = exp.env.observe(es.env)
    import jax.numpy as jnp
    x_last, y_last, f_last = es.buf.get_last()
    o = exp.model.apply(es.params, x_last[None], y_last[None], train=False)
    ExplorationPlotter(out, robot_lim=cfg.robot_lim[:2]).render(
        image=np.asarray(y_last), img_pred=np.asarray(o["img_pred"][0]),
        z_mu=np.asarray(o["z_mu"][0]), z_var=np.exp(np.asarray(o["z_logvar"][0])),
        step=int(es.explr_step), name="replay_view.png",
    )
    print("rendered replay_view.png")

    if args.test_set:
        from ealv_tpu.runtime.evaluate import eval_report
        m = eval_report(exp.model, es.params, args.test_set, out)
        print(f"test-set eval: MSE {m['mean_mse']:.4f}, "
              f"active units {m['active_units']}")


if __name__ == "__main__":
    main()
