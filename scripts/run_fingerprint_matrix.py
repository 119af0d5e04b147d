#!/usr/bin/env python
"""Fingerprint method-matrix study: train, capture fingerprints at the true
object centers, then evaluate EVERY (dist_method x error_mode) combination
from one exploration stream (parity: test_fingerprint_main.py:77-169 +
scripts/fingerprint_mp:216-240 — one worker per combo fed from a shared
ring; here one FingerprintMatrixRuntime).

  python scripts/run_fingerprint_matrix.py --learn-steps 600 --id-steps 300
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))

import numpy as np
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--learn-steps", type=int, default=600)
    ap.add_argument("--id-steps", type=int, default=300)
    ap.add_argument("--capture-steps", type=int, default=50)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--states", default="xyw")
    ap.add_argument("--out", default=None,
                    help="directory for per-combo belief artifacts")
    ap.add_argument("--small", action="store_true")
    ap.add_argument("--objects", type=int, default=0, metavar="K",
                    help="use a K-object scene (default: the standard "
                         "2-object tray; the reference runs several object "
                         "models per identification run, fingerprint_mp:"
                         "216-240)")
    ap.add_argument("--backend", default="free", choices=["free", "arm"],
                    help="simulator backend for the learning phase: 'arm' "
                         "= the 7-DOF kinematic arm where drift and "
                         "joint-limit saturation occur naturally")
    ap.add_argument("--host-loop", action="store_true",
                    help="drive the learning phase through a RobotBridge "
                         "with the full robustness layer (stuck escape, "
                         "pause/recover heartbeat) — the deployment shape; "
                         "recovery events are reported")
    ap.add_argument("--seek-mode", default="fixed",
                    choices=["fixed", "uncertain"],
                    help="'fixed' adopts one fingerprint's belief as the "
                         "exploration target (reference parity, "
                         "test_fingerprint_main.py:262-268); 'uncertain' "
                         "re-targets the least-localized object every step "
                         "(argmax belief entropy, in-device)")
    ap.add_argument("--cluster-every", type=int, default=0,
                    help="run the online clustering monitor every N "
                         "learning steps (host-loop phase only)")
    ap.add_argument("--target-sharpness", type=float, default=20.0,
                    help="belief-target sharpening exponent (test_runtime."
                         "_make_target_pdf). 1.0 = the reference's raw "
                         "low-contrast belief, which is measured to leave "
                         "exploration target-blind; 20.0 (default) steers "
                         "to the belief peak")
    args = ap.parse_args()

    from ealv_tpu.utils.config import ExperimentConfig
    from ealv_tpu.runtime import Experiment
    from ealv_tpu.utils.states import ws_conversion
    from ealv_tpu.fingerprint.capture import capture_fingerprint
    from ealv_tpu.fingerprint.identify import FingerprintSet
    from ealv_tpu.fingerprint.test_runtime import FingerprintMatrixRuntime

    overrides = dict(states=args.states)
    if args.small:
        overrides.update(
            image_dim=(48, 48, 3), cnn_kernels=(3, 3), cnn_strides=(2, 2),
            cnn_channels=(10, 10), hidden_dim=(256, 128), z_dim=12,
            num_target_samples=512, num_traj_samples=512,
            traj_buffer_capacity=1024, buffer_capacity=1024, batch_size=32,
            num_learning_opt=10,
        )
    cfg = ExperimentConfig(**overrides, sim_backend=args.backend)
    scene0 = None
    if args.objects > 0:
        from ealv_tpu.sim.renderer import TrayScene
        scene0 = TrayScene.make(args.objects, seed=args.seed)
        print(f"{args.objects}-object scene: "
              f"{np.round(np.asarray(scene0.obj_xy), 3).tolist()}", flush=True)
    exp = Experiment(cfg, train_calls_per_tick=1, train_every=3, scene=scene0)
    es = exp.init(seed=args.seed)
    t0 = time.perf_counter()
    if args.host_loop:
        # deployment shape: the robustness layer between planner and plant
        # (drift / joint-limit failures on the arm backend surface here)
        from ealv_tpu.hw.bridge import SyntheticBridge
        from ealv_tpu.runtime import HostLoopRunner
        bridge = SyntheticBridge(exp.env, es.env)
        runner = HostLoopRunner(exp, bridge)
        monitor = None
        if args.cluster_every > 0:
            from ealv_tpu.fingerprint.monitor import ClusteringMonitor
            from ealv_tpu.control import setup_barrier
            pos_states = "".join(s for s in cfg.states if s == s.lower())
            barrier, _ = setup_barrier(
                pos_states, jnp.asarray(cfg.robot_lim),
                jnp.asarray(cfg.robot_ctrl_lim)[: len(pos_states)],
                list(range(len(pos_states))),
            )
            monitor = ClusteringMonitor(
                model=exp.model, robot_lim=cfg.robot_lim, num_pts=600,
                cluster_kwargs=dict(use_optimize_samples=True,
                                    barrier=barrier, bandwidth=0.3),
            )
        block = 50
        infos = None
        t_steady = None  # set after block 1, which pays the jit compiles
        done = 0
        while done < args.learn_steps or done == 0:
            n = min(block, max(args.learn_steps - done, 1))
            es = runner.run(es, n)
            done += n
            if t_steady is None:
                t_steady = time.perf_counter()
            if monitor and int(es.explr_step) % max(args.cluster_every, 1) < block:
                n = int(es.buf.size)
                res, stable = monitor.update(
                    es.params, es.buf.x[max(0, n - 6):n],
                    es.buf.y[max(0, n - 6):n],
                    jax.random.fold_in(jax.random.PRNGKey(42), n),
                    int(es.explr_step))
                print(f"clusters @ {int(es.explr_step)}: "
                      f"{np.round(np.asarray(res.means[:, :2]), 2).tolist()} "
                      f"stable={stable}", flush=True)
        wall = time.perf_counter() - t0
        steady = ""
        n_steady = int(es.explr_step) - block
        if n_steady > 0 and t_steady is not None:
            w = time.perf_counter() - t_steady
            steady = (f"; steady-state {n_steady/w:.2f} Hz after the "
                      f"first {block}-step block pays the jit compiles")
        print(f"{int(es.explr_step)} host-loop learning steps on "
              f"'{args.backend}' backend in {wall:.0f}s "
              f"({int(es.explr_step)/wall:.2f} Hz incl. compile{steady}); "
              f"recovery events: {runner.events or 'none'}", flush=True)
        final_loss = float("nan")
    else:
        run = jax.jit(lambda s: exp.run_chunk(s, 50))
        for _ in range(max(1, args.learn_steps // 50)):
            es, infos = run(es)
        losses = np.asarray(infos["loss"])
        losses = losses[losses != 0]
        print(f"{int(es.explr_step)} learning steps in "
              f"{time.perf_counter()-t0:.0f}s; loss {losses[-1]:.3f}",
              flush=True)

    # true centers in robot coords over the explr states (w/z = 0)
    scene = es.env.scene
    tl = np.asarray(cfg.tray_lim)
    rl = np.asarray(cfg.robot_lim)
    truth = []
    for xy in np.asarray(scene.obj_xy):
        full = np.zeros(cfg.s_dim, np.float32)
        full[0], full[1] = xy
        truth.append(np.asarray(ws_conversion(
            jnp.asarray(full), jnp.asarray(tl), jnp.asarray(rl))))
    truth = np.stack(truth)
    print(f"true centers (robot): {np.round(truth, 3).tolist()}", flush=True)

    fps_dicts = []
    for i, ctr in enumerate(truth):
        fp = capture_fingerprint(exp.model, es.params, cfg,
                                 ctr.astype(np.float32), scene=scene,
                                 num_steps=args.capture_steps, seed=i)
        fps_dicts.append(fp)
        print(f"fingerprint {i}: {fp['x'].shape[0]} poses", flush=True)
    fps = FingerprintSet.from_lists(fps_dicts)

    # threshold calibration at this K (min cross-fingerprint separation
    # shrinks as objects are added; identify.py:79-112)
    from ealv_tpu.fingerprint.identify import calibrate_thresholds
    for m in ("L2", "KL", "BC"):
        th, cl = calibrate_thresholds(fps, m)
        print(f"calibrated {m}: thresh {float(th):.4f} clip {float(cl):.4f}",
              flush=True)

    rt = FingerprintMatrixRuntime(
        cfg, exp.model, es.params, fps,
        combos=(("L2", False), ("KL", False), ("BC", False), ("L2", True)),
        seek_combo=0, seek_fingerprint=0, seek_mode=args.seek_mode,
        update_tdist_step=max(10, args.id_steps // 6), scene=scene,
        target_sharpness=args.target_sharpness,
    )
    t0 = time.perf_counter()
    rt.run(n_steps=args.id_steps, seed=args.seed + 7)
    print(f"{args.id_steps}-step matrix identification in "
          f"{time.perf_counter()-t0:.0f}s", flush=True)
    if args.seek_mode == "uncertain":
        sk = np.asarray(rt.seek_history)
        cut = max(10, args.id_steps // 6)  # adoption step
        post = sk[cut:] if args.id_steps > cut else sk  # short runs: all
        share = [float((post == k).mean()) for k in range(len(fps_dicts))]
        print(f"seek-target share per object (post-adoption): "
              f"{np.round(share, 2).tolist()}", flush=True)

    table = rt.results_table(truth=truth)
    print("\n| method | per-object error | mean error |")
    print("|---|---|---|")
    for key, row in table.items():
        errs = ", ".join(f"{e:.3f}" for e in row["error"])
        print(f"| {key} | {errs} | {row['mean_error']:.3f} |")
    if args.out:
        paths = rt.save(args.out)
        for k, p in paths.items():
            print(f"beliefs[{k}] -> {p}")


if __name__ == "__main__":
    main()
