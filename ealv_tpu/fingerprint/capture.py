"""Fingerprint extraction + capture pipeline.

Parity targets:
  - FingerprintBuilder.find_clusters (dist_modules/fingerprint_builder.py:
    104-231): cluster the learned model's uncertainty into candidate object
    locations.
  - scripts/build_fingerprints (:183-337): for each cluster center, run a
    mini ergodic exploration around it with a sphere/cone/cylinder ExplrDist
    target, shrunken sampling limits and a 10x tighter kernel, recording
    (z_mu, z_var, x) at poses at least 1e-3 apart; the result dict
    {z_mu, z_var, x, center, center_img} is the fingerprint artifact.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..models import CVAE
from ..models.cvae import init_model_state, update_dist
from ..control.target_dists import ExplrDist
from ..utils.states import ws_conversion
from ..runtime.tester import EvalExperiment
from .clustering import find_clusters, ClusterResult


def make_capture_target(explr_states: str, robot_center, mode: str = "sphere",
                        capacity: int = 600) -> ExplrDist:
    """Shaped exploration target around a fingerprint center (parity:
    build_fingerprints:181-234).

    'sphere': one tight component at the center (xyz scale 0.01, angles
    free); 'cylinder': like sphere but z free; 'cone': 500 components
    sampling a cone from above the center (tip z=0.5, R=0.2, H=1.5).
    """
    robot_center = np.asarray(robot_center, np.float32)
    d = len(explr_states)
    dist = ExplrDist.create(capacity=capacity, dim=d)
    if mode == "cone":
        rng = np.random.default_rng(0)
        num = 500
        R_, H_ = 0.2, 1.5
        tip = np.ones(3, np.float32)
        tip[0], tip[1], tip[2] = robot_center[0], robot_center[1], 0.5
        samps = rng.uniform([0, 0, 0], [2 * np.pi, H_, R_], size=(num, 3))
        phi, h, r = samps[:, 0], samps[:, 1], np.clip(samps[:, 2], 0, R_ * samps[:, 1] / H_)
        pts = tip[:, None] - np.array([r * np.cos(phi), r * np.sin(phi), h])
        means, stds = [], []
        for pt in pts.T.astype(np.float32):
            full = robot_center.copy()
            full[:3] = pt
            vals = np.ones(d, np.float32)
            vals[:3] *= -(pt[-1] - 1) * 0.025
            vals[3:] *= np.pi
            means.append(full)
            stds.append(vals)
        dist = dist.replace(
            means=dist.means.at[: len(means)].set(jnp.asarray(means)),
            stds=dist.stds.at[: len(stds)].set(jnp.asarray(stds)),
            size=jnp.asarray(len(means), jnp.int32),
        )
        return dist
    # sphere / cylinder: one component (build_fingerprints:214-230)
    vals = np.ones(d, np.float32)
    locs = robot_center.copy()
    for i, s in enumerate(explr_states):
        if s in "xyz":
            if mode == "cylinder" and s == "z":
                vals[i] = 2.0
                locs[i] = 0.0
            else:
                vals[i] = 0.01
        else:
            vals[i] = 2.0
            locs[i] = 0.0  # angles free
    return dist.push(jnp.asarray(locs), jnp.asarray(vals))


def capture_fingerprint(
    model: CVAE,
    params,
    cfg,
    center_robot,  # (d,) cluster center in robot coords over explr states
    scene=None,
    num_steps: int = 50,
    mode: str = "sphere",
    min_pose_dist: float = 1e-3,
    seed: int = 0,
    explr_states: Optional[str] = None,
):
    """Mini ergodic exploration around one center; returns the fingerprint
    dict {z_mu, z_var, x, center, center_img} (build_fingerprints:264-337).
    """
    explr_states = explr_states or cfg.states
    target = make_capture_target(explr_states, center_robot, mode)
    pdf_fn = lambda ctx, samples: ctx.pdf(samples)
    ev_exp = EvalExperiment(cfg, pdf_fn, explr_states=explr_states, scene=scene,
                            kernel_std_scale=0.1)  # std/10 (build_fingerprints:243)

    # drive to the center first (use_pose path :163-167)
    center_tray = np.asarray(
        ws_conversion(jnp.asarray(center_robot), ev_exp.robot_lim, ev_exp.tray_lim)
    )
    tray_pose6 = np.array([(lo + hi) / 2 for lo, hi in ev_exp.env.tray_lim],
                          np.float32)
    for i, s in enumerate(explr_states):
        raw_i = "xyzrpw".find(s)
        if raw_i >= 0:
            tray_pose6[raw_i] = center_tray[i]

    ev = ev_exp.init(start_tray_pose=tray_pose6, seed=seed,
                     shrink_center=jnp.asarray(center_robot))
    ev = ev_exp.use_pose(ev, jnp.asarray(tray_pose6))

    # the whole capture exploration is ONE device program (lax.scan of
    # tick + encode) with a single host transfer at the end — the per-step
    # eager loop paid ~5 dispatches/pulls per step over the TPU tunnel
    mstate = init_model_state(model)

    def body(carry, _):
        ev, ms = carry
        ev, obs = ev_exp.tick(ev, target)
        ms, out = update_dist(model, params, ms, obs["robot_state"],
                              obs["image"])
        return (ev, ms), (out["z_mu"][0], out["z_logvar"][0],
                          obs["robot_state"])

    @jax.jit
    def capture(ev, ms, target):
        (ev, ms), (zm, zv, x) = jax.lax.scan(
            lambda c, _: body(c, _), (ev, ms), None, length=num_steps)
        return zm, zv, x

    _, obs0 = jax.jit(ev_exp.tick)(ev, target)
    center_img = np.asarray(obs0["image"])
    zm, zv, xs_all = jax.device_get(capture(ev, mstate, target))

    # record only >= min_pose_dist distinct poses (:293-298): same greedy
    # sequential filter, applied on the stacked host copy
    keep, last_pose = [], None
    for i in range(num_steps):
        if last_pose is None or np.linalg.norm(xs_all[i] - last_pose) >= min_pose_dist:
            keep.append(i)
            last_pose = xs_all[i]

    return {
        "z_mu": zm[keep],
        "z_var": zv[keep],
        "x": xs_all[keep],
        "center": np.asarray(center_robot, np.float32),
        "center_img": center_img,
    }


def build_fingerprints(
    model: CVAE,
    params,
    cfg,
    seeds_x,
    seeds_y,
    key,
    scene=None,
    num_steps: int = 50,
    mode: str = "sphere",
    num_pts: int = 1000,
    cluster_kwargs: Optional[dict] = None,
    out_dir: Optional[str] = None,
):
    """Full extraction pipeline: cluster the model's uncertainty field ->
    capture a fingerprint at every discovered center. Returns
    (list of fingerprint dicts, ClusterResult). With ``out_dir`` each
    fingerprint is persisted as {out_dir}/fp{k}_{mode}.npz (the reference's
    per-fingerprint pickles, build_fingerprints:327-337)."""
    res: ClusterResult = find_clusters(
        model, params, seeds_x, seeds_y, key,
        robot_lim=cfg.robot_lim, num_pts=num_pts,
        **(cluster_kwargs or {}),
    )
    dicts = []
    for k, center_xy in enumerate(res.means):
        center = np.zeros(len(cfg.states), np.float32)
        center[:2] = center_xy[:2]
        fp = capture_fingerprint(
            model, params, cfg, center, scene=scene,
            num_steps=num_steps, mode=mode, seed=k,
        )
        dicts.append(fp)
        if out_dir:
            from .io import save_fingerprint
            save_fingerprint(f"{out_dir}/fp{k}_{mode}", fp)
    return dicts, res
