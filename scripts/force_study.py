#!/usr/bin/env python
"""Contact-rich learn_force=True end-to-end study (PARITY.md §4 evidence).

Explore 'xyz' with the force-variant CVAE on a contact-rich scene (tall
objects reaching into the explored z band), then assess the learned force
channel two ways:
  1. in-distribution reconstruction on observed samples (the reference's
     force_eval methodology) — the headline metric;
  2. cross-decoded force at probe poses conditioned on one free-space
     observation (reported for honesty: the conditional model carries force
     mostly in the encoder's observation, so this does not transfer).

  python scripts/force_study.py --steps 1200
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
    ap.add_argument("--steps", type=int, default=1200)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--eval-samples", type=int, default=256)
    ap.add_argument("--backend", default="free",
                    choices=("free", "arm", "arm-dynamic",
                             "arm-dynamic-soft"),
                    help="plant: 'free' height-field contact (the original "
                         "study), 'arm-dynamic' = 7-DOF arm with penalty "
                         "contact MECHANICS (3-vector wrench from cylinder "
                         "penetration, franka_env.py:268-284 parity), "
                         "'arm-dynamic-soft' = compliant soft objects "
                         "(loadSoftBody variant, franka_env.py:160-162)")
    args = ap.parse_args()

    from ealv_tpu.utils.config import ExperimentConfig
    from ealv_tpu.runtime import Experiment
    from ealv_tpu.utils.states import ws_conversion
    from ealv_tpu.models.cvae import update_dist
    from ealv_tpu.sim import TrayScene

    cfg = ExperimentConfig(
        states="xyz", learn_force=True,
        traj_buffer_capacity=3000, buffer_capacity=3000,
        num_target_samples=2000, batch_size=64, num_learning_opt=25,
        sim_backend=args.backend,
    )
    # contact-rich: tall, wide objects (the default duck/pineapple heights
    # only graze the z floor, so free exploration rarely makes contact)
    scene = TrayScene.default()._replace(
        obj_radius=jnp.array([0.07, 0.06], jnp.float32),
        obj_height=jnp.array([0.38, 0.42], jnp.float32),
    )
    exp = Experiment(cfg, train_calls_per_tick=1, train_every=3, scene=scene)
    es = exp.init(seed=args.seed)
    run = jax.jit(lambda s: exp.run_chunk(s, 50))
    t0 = time.perf_counter()
    for c in range(max(1, args.steps // 50)):
        es, infos = run(es)
        if c % 4 == 3:
            n = int(es.buf.size)
            fr = float((es.buf.force[:n] > 0).mean())
            losses = np.asarray(infos["loss"])
            losses = losses[losses != 0]
            print(f"step {int(es.explr_step)}: loss "
                  f"{losses[-1] if losses.size else float('nan'):.3f} "
                  f"contact-fraction {fr:.2%}", flush=True)
    print(f"{int(es.explr_step)} steps in {time.perf_counter()-t0:.0f}s",
          flush=True)

    n = int(es.buf.size)
    forces = np.asarray(es.buf.force[:n]).ravel()
    print(f"buffer: {n} samples, contact {np.mean(forces > 0):.1%}, "
          f"max force {forces.max():.1f}")

    # 1. in-distribution force reconstruction (force_eval)
    idx = np.random.default_rng(args.seed).choice(n, args.eval_samples,
                                                  replace=False)
    xe = es.buf.x[idx]
    ye = es.buf.y[idx].astype(jnp.float32)
    fe = es.buf.force[idx]

    @jax.jit
    def recon_force(params, xe, ye, fe):
        out = exp.model.apply(params, xe, ye, force=fe, train=False)
        return out["force_pred"][:, 0]

    fp = np.asarray(recon_force(es.params, xe, ye, fe))
    ft = np.asarray(fe)[:, 0]
    press = ft > 1.0
    sep = fp[press].mean() - fp[~press].mean() if press.any() else 0.0
    print(f"\nin-distribution force recon on {args.eval_samples} samples: "
          f"corr {np.corrcoef(ft, fp)[0, 1]:.3f} | "
          f"MAE {np.abs(ft - fp).mean():.2f} | "
          f"pred contact-vs-free separation {sep:.2f} "
          f"(true {ft[press].mean() - ft[~press].mean():.2f})")

    # 2. cross-decoded probes from one free-space seed (honesty check)
    obj_xy = np.asarray(scene.obj_xy)
    probes_tray, truth = [], []
    for ox, oy in obj_xy:
        for z in (0.48, 0.40, 0.34, 0.28):
            probes_tray.append([ox, oy, z])
    for fx, fy in [(0.35, -0.12), (0.60, 0.12), (0.48, 0.0)]:
        for z in (0.48, 0.30):
            probes_tray.append([fx, fy, z])
    probes_tray = np.asarray(probes_tray, np.float32)
    for p in probes_tray:
        pose6 = jnp.asarray([p[0], p[1], p[2], np.pi, 0.0, 0.0])
        if getattr(exp.env, "dynamic_contact", False):
            w, _ = exp.env._contact_wrench(pose6, scene)
            truth.append(float(jnp.linalg.norm(w)))
        else:
            truth.append(float(exp.env._contact_force(pose6, scene)))
    truth = np.asarray(truth)
    probes_r = ws_conversion(jnp.asarray(probes_tray),
                             jnp.asarray(cfg.tray_lim),
                             jnp.asarray(cfg.robot_lim))
    free_env = exp.env.init(
        jnp.asarray([0.48, -0.10, 0.45, np.pi, 0.0, 0.0]), scene=scene)
    pose, vel, force, img = exp.env.observe(free_env)
    if force.size > 1:  # dynamic-contact wrench -> the learned ||F|| channel
        force = jnp.linalg.norm(force)[None]
    seed_x = exp._measured_robot_state(free_env)[: cfg.s_dim]

    @jax.jit
    def predict(params, probes):
        m = probes.shape[0]
        out = exp.model.apply(
            params, jnp.broadcast_to(seed_x, probes.shape),
            img[None].repeat(m, 0), force=jnp.broadcast_to(force, (m, 1)),
            x_decode=probes, train=False)
        return out["force_pred_decode"][:, 0]

    pred = np.asarray(predict(es.params, probes_r))
    print(f"cross-decode probes (free-space seed): "
          f"corr {np.corrcoef(truth, pred)[0, 1]:.3f} | "
          f"MAE {np.abs(truth - pred).mean():.2f} "
          f"(does not transfer by construction — see PARITY.md §4)")


if __name__ == "__main__":
    main()
