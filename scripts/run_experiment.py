#!/usr/bin/env python
"""Run one online-learning experiment (the `roslaunch run.launch` / `scripts/
sensor_main` entry point, TPU edition).

Examples:
  python scripts/run_experiment.py --method entklerg --steps 300 --seed 0
  python scripts/run_experiment.py --method randomWalk --steps 200
  python scripts/run_experiment.py --config my_config.yaml --out runs/

Writes to the run dir ({out}/{sensor}/{method}_{seed:04d}/, parity with
load_config.py:177-182): config.yaml, log.txt, metrics.npz, checkpoints/,
and dashboard figures.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--method", default="entklerg",
                    choices=["entklerg", "unifklerg", "uniform", "randomWalk"])
    ap.add_argument("--states", default="xyw")
    ap.add_argument("--backend", default=None,
                    choices=["free", "arm", "arm-dynamic",
                             "arm-dynamic-soft"],
                    help="simulator backend: 'free' (free-flying EE), "
                         "'arm' (7-DOF modified-DH kinematic arm with "
                         "Jacobian-pinv velocity control, drift, and "
                         "joint-limit failure modes), 'arm-dynamic' "
                         "(+penalty contact mechanics), 'arm-dynamic-soft' "
                         "(compliant/soft objects, loadSoftBody variant)")
    ap.add_argument("--steps", type=int, default=1000)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default="runs")
    ap.add_argument("--config", default=None, help="yaml config to load")
    ap.add_argument("--chunk", type=int, default=25, help="steps per fused scan")
    ap.add_argument("--small", action="store_true",
                    help="small model/images for quick runs")
    ap.add_argument("--train-calls", type=int, default=1)
    ap.add_argument("--train-every", type=int, default=1,
                    help="run a trainer call only every k-th control step")
    ap.add_argument("--save-rate", type=int, default=200)
    ap.add_argument("--resume", action="store_true",
                    help="resume from the latest checkpoint in the run dir "
                         "(full mid-exploration resume: model, optimizer, "
                         "replay ring, planner, env, schedules, RNG)")
    ap.add_argument("--cluster-every", type=int, default=0,
                    help="run the online clustering monitor every N steps "
                         "(the reference's live clusterer; uncertainty "
                         "localizes objects best DURING training). Saves a "
                         "cluster checkpoint when clusters stabilize.")
    ap.add_argument("--host-loop", action="store_true",
                    help="drive the experiment through a RobotBridge with "
                         "the full robustness layer (stuck escape, goal "
                         "seeking, pause/recover heartbeat) instead of the "
                         "fused on-device loop — the deployment shape for "
                         "real-robot bridges")
    ap.add_argument("--panel", action="store_true",
                    help="attach the stdin control panel (pause/resume/save/"
                         "mode/z/brightness commands) — host-loop mode only")
    ap.add_argument("--web-panel", type=int, default=-1, metavar="PORT",
                    help="serve the browser control panel (pause/resume/"
                         "save/mode/brightness + live dashboard) on this "
                         "port (0 = auto-pick); works in both fused and "
                         "host-loop modes")
    ap.add_argument("--dash-every", type=int, default=0,
                    help="refresh the live dashboard (dashboard.png / "
                         ".html in the run dir) every N explr steps — the "
                         "reference's streaming pyqtgraph Plotter, rendered "
                         "between fused chunks")
    ap.add_argument("--profile", action="store_true",
                    help="capture a jax.profiler trace of one steady-state "
                         "chunk into {run_dir}/profile (open with xprof/"
                         "tensorboard)")
    ap.add_argument("--post-train", dest="post_train", action="store_true",
                    default=True,
                    help="after exploration, keep training until "
                         "learning_ind >= num_steps * target_learning_rate "
                         "and save a 'postexplr' checkpoint (the "
                         "reference's post-exploration phase, "
                         "trainer_ddp.py:202-249; default on)")
    ap.add_argument("--no-post-train", dest="post_train", action="store_false")
    ap.add_argument("--entropy-slices", action="store_true",
                    help="after the run, render the get_dists entropy-slice "
                         "figures (marginal uncertainty fields per z-range "
                         "variant) into the run dir")
    args = ap.parse_args()

    from ealv_tpu.utils.config import ExperimentConfig
    from ealv_tpu.runtime import Experiment
    from ealv_tpu.runtime.metrics import MetricsLog, run_dir
    from ealv_tpu.runtime.checkpoint import save_checkpoint, load_checkpoint, latest_checkpoint
    from ealv_tpu.viz import TrainingPlotter, ExplorationPlotter

    overrides = dict(explr_method=args.method, states=args.states,
                     num_steps=args.steps, seed=args.seed)
    if args.backend:
        overrides["sim_backend"] = args.backend
    if args.small:
        overrides.update(
            image_dim=(48, 48, 3), cnn_kernels=(3, 3), cnn_strides=(2, 2),
            cnn_channels=(10, 10), hidden_dim=(256, 128), z_dim=12,
            num_target_samples=512, num_traj_samples=512,
            traj_buffer_capacity=1024, buffer_capacity=1024, batch_size=32,
            num_learning_opt=10,
        )
    if args.config:
        cfg = ExperimentConfig.from_yaml(args.config, **overrides)
    else:
        cfg = ExperimentConfig(**overrides)

    dirp = run_dir(args.out, "synth", args.method, args.seed)
    ml = MetricsLog(dirp)
    cfg.to_yaml(os.path.join(dirp, "config.yaml"))

    exp = Experiment(cfg, train_calls_per_tick=args.train_calls,
                     train_every=args.train_every)
    es = exp.init(seed=args.seed)
    if args.resume:
        ck = latest_checkpoint(os.path.join(dirp, "checkpoints"))
        if ck:
            es = load_checkpoint(ck, es)
            ml.write_to_log(f"resumed from {ck} at step {int(es.explr_step)}")
        else:
            ml.write_to_log("no checkpoint found; starting fresh")
    run = jax.jit(lambda s: exp.run_chunk(s, args.chunk))

    monitor = None
    if args.cluster_every > 0:
        from ealv_tpu.fingerprint.monitor import ClusteringMonitor
        from ealv_tpu.control import setup_barrier
        import jax.numpy as jnp
        pos_states = "".join(s for s in cfg.states if s == s.lower())

        barrier, _ = setup_barrier(
            pos_states, jnp.asarray(cfg.robot_lim),
            jnp.asarray(cfg.robot_ctrl_lim)[: len(pos_states)],
            list(range(len(pos_states))),
        )
        monitor = ClusteringMonitor(
            model=exp.model, robot_lim=cfg.robot_lim, num_pts=600,
            dir_path=os.path.join(dirp, "clusters"),
            cluster_kwargs=dict(use_optimize_samples=True, barrier=barrier,
                                bandwidth=0.3),
        )

    import time
    t0 = time.time()
    remaining = max(0, args.steps - int(es.explr_step))

    if args.host_loop:
        from ealv_tpu.hw.bridge import SyntheticBridge
        from ealv_tpu.runtime import HostLoopRunner
        from ealv_tpu.runtime.watchdog import GracefulKiller

        bridge = SyntheticBridge(exp.env, es.env)
        runner = HostLoopRunner(
            exp, bridge, metrics=ml, killer=GracefulKiller(),
            save_fn=lambda s: save_checkpoint(
                os.path.join(dirp, "checkpoints"), s, step=int(s.explr_step)),
        )
        if args.panel:
            from ealv_tpu.runtime.panel import ControlPanel
            ControlPanel(runner.hooks()).start()
        if args.web_panel >= 0:
            from ealv_tpu.runtime.webpanel import WebPanel
            wp = WebPanel(runner.hooks(), run_dir=dirp, port=args.web_panel)
            wp.start()
            ml.write_to_log(f"web panel: http://127.0.0.1:{wp.port}/")
        # drive to the start pose with goal-seek retries before exploring
        start6 = np.asarray(bridge.klerg_start_pose())
        runner.drive_to_start(start6, yaw_index=5)
        # honor --steps exactly: full blocks of --chunk, then the remainder
        # (25-step blocks used to round a 6-step request up to 25)
        block = max(1, args.chunk)
        done = 0
        while done < remaining:
            n = min(block, remaining - done)
            es = runner.run(es, n)
            done += n
            ml.progress(int(es.explr_step), int(es.learning_ind), float("nan"))
            if runner.killer.kill_now:
                break
        wall = time.time() - t0
        ml.write_to_log(
            f"host-loop done: {int(es.explr_step)} steps in {wall:.0f}s "
            f"({int(es.explr_step)/max(wall,1e-9):.2f} Hz); "
            f"events: {runner.events or 'none'}")
        ml.save()
        save_checkpoint(os.path.join(dirp, "checkpoints"), es,
                        step=int(es.explr_step))
        print(f"run dir: {dirp}")
        return

    dash = None
    if args.dash_every > 0:
        from ealv_tpu.viz import LiveDashboard
        dash = LiveDashboard(exp, dirp)

    web = None
    if args.web_panel >= 0:
        from ealv_tpu.runtime.panel import ControlHooks
        from ealv_tpu.runtime.webpanel import WebPanel
        hooks = ControlHooks()
        web = WebPanel(hooks, run_dir=dirp, port=args.web_panel)
        web.start()
        ml.write_to_log(f"web panel: http://127.0.0.1:{web.port}/")

    n_chunks = max(1, remaining // args.chunk)
    for c in range(n_chunks):
        while web is not None and web.hooks.pause_mgr.paused:
            time.sleep(0.2)  # fused loop pauses between chunks
        if web is not None and web.hooks.pause_mgr.consume_save():
            save_checkpoint(os.path.join(dirp, "checkpoints"), es,
                            step=int(es.explr_step))
            ml.write_to_log("checkpoint saved on panel request")
        if args.profile and c == 1:  # steady state: past compile + warmup
            jax.profiler.start_trace(os.path.join(dirp, "profile"))
        es, infos = run(es)
        if args.profile and c == 1:
            jax.block_until_ready(infos["loss"])
            jax.profiler.stop_trace()
            ml.write_to_log(f"profiler trace -> {dirp}/profile")
        ml.push_tick_info({k: infos[k] for k in
                           ("loss", "ergodic_cost", "beta", "gamma")})
        if dash and (c + 1) * args.chunk % args.dash_every < args.chunk:
            dash.render(es, ml.series, step=int(es.explr_step))
        losses = np.asarray(infos["loss"])
        losses = losses[losses != 0]  # skip-steps report zero metrics
        ml.progress(int(es.explr_step), int(es.learning_ind),
                    float(losses[-1]) if losses.size else float("nan"))
        if (c + 1) * args.chunk % args.save_rate < args.chunk:
            save_checkpoint(os.path.join(dirp, "checkpoints"), es,
                            step=int(es.explr_step))
        if monitor and (c + 1) * args.chunk % args.cluster_every < args.chunk:
            n = int(es.buf.size)
            res, stable = monitor.update(
                es.params, es.buf.x[max(0, n - 6):n], es.buf.y[max(0, n - 6):n],
                jax.random.fold_in(jax.random.PRNGKey(42), c),
                int(es.explr_step),
                checkpoint_fn=lambda s: save_checkpoint(
                    os.path.join(dirp, "cluster_checkpoints"), es, step=s),
            )
            ml.write_to_log(
                f"clusters @ {int(es.explr_step)}: "
                f"{np.round(res.means[:, :2], 2).tolist()} stable={stable}"
            )
    wall = time.time() - t0
    ml.write_to_log(f"done: {int(es.explr_step)} steps in {wall:.0f}s "
                    f"({int(es.explr_step)/wall:.2f} Hz)")

    if args.post_train:
        # post-exploration training: train until the learning ratio target
        # is met (trainer_ddp.py:202-249, main_async.py:117-158), then save
        # the postexplr model — the checkpoint the reference's downstream
        # stages (clustering/fingerprints) load.
        target = int(cfg.num_steps * cfg.target_learning_rate)
        deficit = target - int(es.learning_ind)
        if deficit > 0:
            pt_chunk = min(args.chunk, deficit)
            post = jax.jit(lambda s: exp.post_train_chunk(s, pt_chunk))
            t1 = time.time()
            while int(es.learning_ind) < target:
                es, pinfos = post(es)
                ml.push_tick_info({"loss": pinfos["loss"],
                                   "beta": pinfos["beta"],
                                   "gamma": pinfos["gamma"]})
                ml.progress(int(es.explr_step), int(es.learning_ind),
                            float(np.asarray(pinfos["loss"])[-1]))
            ml.write_to_log(
                f"post-exploration training: {deficit} trainer calls in "
                f"{time.time()-t1:.0f}s -> learning_ind {int(es.learning_ind)}"
                f"/{target}")
        else:
            ml.write_to_log("post-exploration training: ratio already met")
        save_checkpoint(os.path.join(dirp, "checkpoints"), es,
                        step=int(es.explr_step))
        ck = save_checkpoint(os.path.join(dirp, "checkpoints", "postexplr"), es)
        ml.write_to_log(f"postexplr checkpoint -> {ck}")

    ml.save()
    if monitor:
        monitor.save_log()
    save_checkpoint(os.path.join(dirp, "checkpoints"), es,
                    step=int(es.explr_step))

    TrainingPlotter(dirp).render({k: np.concatenate([np.atleast_1d(x) for x in v])
                                  for k, v in ml.series.items()})
    pose, vel, force, img = exp.env.observe(es.env)
    ExplorationPlotter(dirp, robot_lim=cfg.robot_lim[:2]).render(
        image=np.asarray(img), step=int(es.explr_step), name="final_view.png")

    if args.entropy_slices:
        from ealv_tpu.fingerprint import entropy_slices
        from ealv_tpu.viz import plot_entropy_slices
        slices = entropy_slices(
            exp.model, es.params, es.buf, jax.random.PRNGKey(args.seed),
            cfg.robot_lim, cfg.states,
            lim_scale=cfg.explr_robot_lim_scale if cfg.explr_robot_lim_scale > 1
            else 1.15,
        )
        for p in plot_entropy_slices(dirp, slices):
            ml.write_to_log(f"entropy slice -> {p}")
    print(f"run dir: {dirp}")


if __name__ == "__main__":
    main()
