"""The explore+learn experiment — SensorMain + main_async as one device program.

Parity targets:
  - SensorMain.step (dist_modules/sensor_main_module.py:117-249): sync
    planner to measured state -> plan -> ws-convert -> command -> fetch
    synced (pose, image, force) -> push to replay -> model reseed.
  - post_train_mp reseed (:251-267), async main loop (main_async.py:62-158),
    trainer throttling (trainer_ddp.py:117-131), pre_train_mp hyperparams
    (trainer_module.py:487-545).

TPU-first: the reference splits this across 7 processes (explorer, DDP
trainers, plotters, clustering) communicating via shared memory, pipes, and
flag files. Here ONE ExperimentState pytree holds {CVAE params, opt state,
replay ring, planner state, env state, schedules}, and ``tick`` is a pure
function: explore, sense, push, reseed, re-grade, train — jitted end to end,
scanned for whole experiments. The model the planner samples is the model
the trainer just updated, by construction (no checkpoint-file hot-swap).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..utils.config import ExperimentConfig, RAW_STATES
from ..utils.states import ws_conversion
from ..models import CVAE
from ..models.cvae import init_model_state, update_dist, ModelState
from ..data.replay import ReplayBuffer
from ..control import (
    KlergConfig,
    KlergPlanner,
    make_dynamics,
    make_policy,
    setup_barrier,
)
from ..sim.env import SyntheticEnv, EnvState
from ..sim.renderer import TrayScene
from .trainer import TrainerStatics, train_call
from .schedules import HyperState, hyperparam_update, entropy_grade_spread


class ExperimentState(NamedTuple):
    params: dict
    opt_state: tuple
    mstate: ModelState
    pstate: object  # PlannerState
    buf: ReplayBuffer
    env: EnvState
    hyper: HyperState
    key: jax.Array
    explr_step: jax.Array  # ()
    learning_ind: jax.Array  # () trainer calls so far


class Experiment:
    """Builds and runs the full online-learning experiment."""

    def __init__(self, cfg: ExperimentConfig, train_calls_per_tick: int = 3,
                 scene: Optional[TrayScene] = None, train_every: int = 1,
                 mesh=None, throttle: str = "auto"):
        self.cfg = cfg
        self.train_calls_per_tick = train_calls_per_tick
        # run trainer calls only every k-th exploration step (k > 1 =
        # high-rate control with interleaved learning; lax.cond skips the
        # trainer compute entirely on off steps)
        self.train_every = train_every
        # how the learning-ratio throttle is lowered:
        #   'cond'  — lax.cond skips the trainer compute on off steps, but
        #             the conditional boundary materializes its big operands
        #             (xprof: the cond's closed_call moves ~1.1 GB — the
        #             image ring — costing ~2.9 ms/tick on v5e even when the
        #             branch is taken)
        #   'where' — the trainer always executes and the outputs are
        #             select_n'd on the throttle predicate: no conditional
        #             boundary, no ring copy. Wins whenever the throttle
        #             almost always fires (inline train_every=1 runs).
        #   'auto'  — 'where' when every step trains (train_every == 1),
        #             'cond' when steps are skipped by construction.
        if throttle not in ("auto", "cond", "where"):
            raise ValueError(f"throttle={throttle!r}")
        self.throttle = ("where" if train_every == 1 else "cond") \
            if throttle == "auto" else throttle
        # multi-chip: with a jax.sharding.Mesh, the trainer runs
        # data-parallel over its 'data' axis (DDP semantics) and the
        # planner's uncertainty decode shards its candidate samples — the
        # whole tick stays one program, collectives ride ICI
        self.mesh = mesh
        if mesh is not None:
            n = mesh.shape["data"]
            if cfg.batch_size % n or cfg.num_target_samples % n:
                raise ValueError(
                    f"batch_size ({cfg.batch_size}) and num_target_samples "
                    f"({cfg.num_target_samples}) must divide the mesh size {n}"
                )

        states = cfg.states
        self.pose_sel = jnp.asarray(
            [RAW_STATES.rfind(s) for s in states if s != "b"], jnp.int32
        )
        self.b_pos = states.rfind("b")  # index within states, -1 if absent

        # model
        self.model = CVAE(
            img_dim=cfg.image_dim,
            z_dim=cfg.z_dim,
            s_dim=cfg.s_dim,
            hidden_dim=cfg.model_hidden(),
            cnn_kernels=cfg.cnn_kernels,
            cnn_strides=cfg.cnn_strides,
            cnn_channels=cfg.cnn_channels,
            y_logvar_dim=cfg.y_logvar_dim,
            learn_force=cfg.learn_force,
            dx=cfg.dx,
            compute_dtype=jnp.dtype(cfg.compute_dtype),
            decoder_mode=cfg.decoder_mode,
            fast_encoder_grads=cfg.fast_encoder_grads,
            lane_pad=cfg.lane_pad,
        )

        # planner over position states (double integrator appends vels)
        pos_states = "".join(s for s in states if s == s.lower())
        sim_dt = cfg.dt / 5.0  # sim speedup (sensor_utils.py:92-97)
        self.dyn = make_dynamics(pos_states, dt=cfg.dt, use_magnitude=cfg.use_magnitude)
        policy = make_policy("Roll", self.dyn, cfg.horizon)
        kcfg = KlergConfig(
            horizon=cfg.horizon,
            num_target_samples=cfg.num_target_samples,
            num_traj_samples=cfg.num_traj_samples,
            dt=cfg.dt,
            R=cfg.R,
            std=cfg.std,
            uniform_tdist="unif" in cfg.explr_method,
            vel_smoothing=0.5,  # sim smoothing (save_update :311-313)
        )

        def pdf_fn(ctx, samples):
            params, mstate = ctx
            if self.mesh is not None and not cfg.use_z_ensemble:
                from ..parallel.train import sharded_pdf
                return sharded_pdf(self.model, self.mesh, params, mstate, samples)
            return self.model.apply(
                params, mstate, samples,
                use_z_ensemble=cfg.use_z_ensemble, method=CVAE.pdf,
            )

        self.planner = KlergPlanner(
            kcfg, self.dyn, policy, pdf_fn, states,
            explr_locs=list(range(len(states))),
        )
        # baseline exploration methods (DummyRobot selection,
        # sensor_main_module.py:90-93): anything not *klerg
        self.use_baseline = "klerg" not in cfg.explr_method
        if self.use_baseline:
            from ..control.baselines import BaselineController

            self.baseline = BaselineController(
                method=cfg.explr_method,
                dt=cfg.dt,
                robot_lim=tuple(map(tuple, cfg.robot_lim)),
                robot_ctrl_lim=tuple(map(tuple, cfg.robot_ctrl_lim)),
                buffer_capacity=cfg.traj_buffer_capacity,
            )
        self.trainer = TrainerStatics(
            model=self.model,
            batch_size=cfg.batch_size,
            num_learning_opt=cfg.num_learning_opt,
            gamma_weight=cfg.gamma_weight,
            other_locs=cfg.other_locs,
            lr=cfg.model_lr,
        )

        # environment over the full 6-dof tray box
        from ..utils.config import TRAY_LIM
        tray6 = tuple(TRAY_LIM[s] for s in "xyzrpw")
        if cfg.sim_backend in ("arm", "arm-dynamic", "arm-dynamic-soft"):
            from ..sim.arm import ArmEnv
            self.env = ArmEnv(
                tray_lim=tray6, dt=sim_dt,
                img_hw=cfg.image_dim[:2],
                dynamic_contact=cfg.sim_backend.startswith("arm-dynamic"),
                soft_objects=cfg.sim_backend == "arm-dynamic-soft",
                obj_mobility=cfg.obj_mobility)
        else:
            self.env = SyntheticEnv(tray_lim=tray6, dt=sim_dt,
                                    img_hw=cfg.image_dim[:2])
        self.scene = scene

        # limit boxes as arrays
        self.tray_lim = jnp.asarray(cfg.tray_lim)
        self.robot_lim = jnp.asarray(cfg.robot_lim)
        self.tray_ctrl_lim = jnp.asarray(cfg.tray_ctrl_lim)
        self.robot_ctrl_lim = jnp.asarray(cfg.robot_ctrl_lim)
        self.tray_full_lim = jnp.concatenate([self.tray_lim, self.tray_ctrl_lim], 0)
        self.robot_full_lim = jnp.concatenate([self.robot_lim, self.robot_ctrl_lim], 0)

    # ------------------------------------------------------------------
    def init(self, seed: int = 0) -> ExperimentState:
        cfg = self.cfg
        key = jax.random.PRNGKey(seed)
        k_p, k_env, key = jax.random.split(key, 3)
        params = self.model.init(
            {"params": k_p},
            jnp.zeros((1, cfg.s_dim)),
            jnp.zeros((1, *cfg.image_dim)),
            force=jnp.zeros((1, 1)) if cfg.learn_force else None,
            train=False,
        )
        opt_state = self.trainer.make_optimizer().init(params)
        mstate = init_model_state(self.model)

        pos_states = "".join(s for s in cfg.states if s == s.lower())
        non_vel = list(range(len(pos_states)))
        barrier, _ = setup_barrier(
            pos_states, self.robot_lim, self.robot_ctrl_lim[: len(pos_states)], non_vel
        )
        # start at tray center (brightness dim, if explored, starts mid-range)
        tray_center = jnp.asarray([(lo + hi) / 2 for lo, hi in self.env.tray_lim])
        start = tray_center[self.pose_sel]
        if self.b_pos >= 0:
            from ..utils.config import TRAY_LIM as _TL
            start = jnp.insert(start, self.b_pos, sum(_TL["b"]) / 2)
        x0r = ws_conversion(start, self.tray_lim, self.robot_lim)
        if self.use_baseline:
            pstate = self.baseline.init_state(x0r, seed=seed + 1)
        else:
            pstate = self.planner.init_state(
                jnp.concatenate([x0r, jnp.zeros_like(x0r)]),
                self.robot_lim, barrier,
                buffer_capacity=cfg.traj_buffer_capacity,
                explr_lim_scale=cfg.explr_robot_lim_scale,
                seed=seed + 1,
            )
        env = self.env.init(tray_center, scene=self.scene)
        buf = ReplayBuffer.create(
            cfg.buffer_capacity, cfg.s_dim, cfg.image_dim, learn_force=True,
            img_dtype=jnp.dtype(cfg.compute_dtype),
        )
        return ExperimentState(
            params=params, opt_state=opt_state, mstate=mstate, pstate=pstate,
            buf=buf, env=env, hyper=HyperState.create(),
            key=key,
            explr_step=jnp.zeros((), jnp.int32),
            learning_ind=jnp.zeros((), jnp.int32),
        )

    # ------------------------------------------------------------------
    def _robot_state_from_obs(self, pose6, vel6, brightness):
        """(pose, vel) tray -> robot coords over the explored states,
        stacked double-integrator style (SensorMain.step :125-127,:188-189).
        Works for both the in-device env and host-side RobotBridge obs."""
        pose_e = pose6[self.pose_sel]
        vel_e = vel6[self.pose_sel]
        if self.b_pos >= 0:
            pose_e = jnp.insert(pose_e, self.b_pos, brightness)
            vel_e = jnp.insert(vel_e, self.b_pos, 0.0)
        full = jnp.concatenate([pose_e, vel_e])
        return ws_conversion(full, self.tray_full_lim, self.robot_full_lim)

    def _measured_robot_state(self, env: EnvState):
        return self._robot_state_from_obs(env.pose, env.vel, env.brightness)

    def plan_step(self, es: ExperimentState, full_state):
        """Steps 1-3 of the tick sans environment: sync the planner to the
        measured state, plan (or baseline-step), and convert the predicted
        velocity to a tray-frame 6-twist command.

        Returns (pstate, vel6 tray twist, b_cmd or None, info). Pure and
        jittable on its own — the seam the host-in-the-loop runtime
        (runtime/host_loop.py) uses to drive a RobotBridge instead of the
        fused in-device env."""
        cfg = self.cfg
        m = self.dyn.num_actions
        if self.use_baseline:
            pstate = self.baseline.save_update(es.pstate, full_state, save=True)
            pstate, full_pred, vel_pred_r = self.baseline.step(pstate)
            dyn_pred_x = full_pred
            info = {"cost": jnp.zeros(())}
        else:
            pstate = self.planner.save_update(es.pstate, full_state, save=True)
            # scene prior for the first prior_steps (sensor_main_module:118-119)
            use_prior = es.explr_step < cfg.prior_steps
            pstate, info = self.planner.plan(
                pstate, (es.params, es.mstate), use_prior=use_prior
            )
            ctrl = pstate.u[0]
            dyn_pred = self.dyn.step(pstate.dyn, ctrl)
            dyn_pred_x = dyn_pred.x
            vel_pred_r = dyn_pred.x[m:]

        # command conversion (use_vel path :142-147). vel_pred_r is (m,)
        # over the position states (runtime exploration strings are
        # lowercase, e.g. 'xyw'; vel-state exploration like 'xyXY' is a
        # planner-level feature exercised in the demo/tests).
        vel_tray = ws_conversion(vel_pred_r, self.robot_ctrl_lim, self.tray_ctrl_lim)
        vel_tray = jnp.clip(vel_tray, self.tray_ctrl_lim[:, 0], self.tray_ctrl_lim[:, 1])
        vel6 = jnp.zeros(6).at[self.pose_sel].set(
            jnp.delete(vel_tray, self.b_pos, assume_unique_indices=True)
            if self.b_pos >= 0 else vel_tray
        )
        b_cmd = None
        if self.b_pos >= 0:
            tray_pos = ws_conversion(dyn_pred_x[:m], self.robot_lim, self.tray_lim)
            b_cmd = tray_pos[self.b_pos]
        return pstate, vel6, b_cmd, info

    def tick(self, es: ExperimentState):
        """One exploration step + throttled learning. Pure; jit/scan me."""
        cfg = self.cfg

        # 1-3. sync to measured state + plan + command conversion
        full_state = self._measured_robot_state(es.env)
        pstate, vel6, b_cmd, info = self.plan_step(es, full_state)
        env = es.env
        for _ in range(cfg.data_to_ctrl_rate):
            env = self.env.step_vel(env, vel6, b_cmd)

        # 4. sense (:186-215)
        pose, vel, force, img = self.env.observe(env)
        robot_state = self._measured_robot_state(env)[: cfg.s_dim]
        es, tick_info = self.absorb_step(es, pstate, info, robot_state, img, force)
        return es._replace(env=env), tick_info

    def absorb_step(self, es: ExperimentState, pstate, info, robot_state,
                    img, force):
        """Steps 4b-7 of the tick: push the synced sample, reseed the target
        distribution, update hyperparameters, and run throttled learning.
        ``robot_state`` is the (s_dim,) measured pose in robot coords;
        ``img``/``force`` the synced sensor sample. Pure and jittable."""
        cfg = self.cfg
        key, k_train, k_hp = jax.random.split(es.key, 3)

        # a multi-axis contact wrench (ArmEnv dynamic_contact) reduces to
        # its magnitude for the learning channel — the replay ring and the
        # model's force input are one scalar per sample; the force
        # DIRECTION is consumed only by the escape path (host_loop)
        force = jnp.asarray(force, jnp.float32).ravel()
        if force.shape[0] > 1:
            force = jnp.linalg.norm(force)[None]

        # intensity mode collapses RGB to one channel (process_image_msg
        # parity, sensor_utils.py:284-297)
        if cfg.image_dim[2] == 1 and img.shape[-1] != 1:
            img = jnp.mean(img, axis=-1, keepdims=True)
        buf = es.buf.push(robot_state, img, force)

        # 5. reseed the target distribution (post_train_mp :251-267)
        mstate, _ = update_dist(self.model, es.params, es.mstate,
                                robot_state, img,
                                force if self.model.learn_force else None)

        # 6+7. hyperparameters + learning, throttled. The reference computes
        # grade/spread in pre_train_mp ONCE PER TRAINER CALL
        # (trainer_ddp.py:141-143 -> trainer_module.py:487-545), so both the
        # entropy evaluation and the trainer live inside the same lax.cond:
        # skipped steps (learning-ratio throttle, train_every interleave) pay
        # for neither. A gated where() would still pay for both.
        #
        # The replay ring is deliberately NOT a cond output: the trainer
        # only READS it, and the one thing _train wrote to it was the tiny
        # beta/gamma hyperparam ring. The cond returns (grade, spread)
        # instead — NaN on the skip branch, which update_hyperparams'
        # nan-guard (vae_buffer.py:186-208 parity) already drops — and the
        # small-ring write happens outside. Measured perf-neutral on the
        # chip (XLA already threaded the untouched ring through the cond
        # without a copy), but it keeps the cond carry minimal so no future
        # branch accidentally forces a ring materialization.
        params, opt_state = es.params, es.opt_state
        hyper = es.hyper
        learning_ind = es.learning_ind
        metrics = None
        for i in range(self.train_calls_per_tick):
            do = (
                learning_ind
                < cfg.target_learning_rate * (es.explr_step + 1 - cfg.frames_before_training)
            ) & (es.explr_step + 1 >= cfg.frames_before_training)
            if self.train_every > 1:
                do = do & (es.explr_step % self.train_every == 0)

            # the planner's target-dist call already decoded the model pdf
            # over 2000 uniform samples and computed the coverage spread
            # over the visited-state memory THIS tick (klerg._target_dist);
            # reuse them for the entropy schedule instead of a second
            # decode + spread kernel. Inputs differ from the standalone
            # form only by one observation (planner runs pre-reseed) and
            # by memory source (planner traj ring vs replay x ring — same
            # visited states); the loss-trajectory equivalence test
            # (tests/test_sim_runtime.py) bounds the effect.
            fold = (
                cfg.hyper_from_planner
                and not self.use_baseline
                and not cfg.use_z_ensemble
                and "tdist_pdf" in info
                and "tdist_spread" in info
            )

            def _train(args):
                p, o, h = args
                # pre_train_mp: spread/grade from model entropy (:487-545)
                if fold:
                    from .schedules import entropy_grade
                    spread = info["tdist_spread"]
                    grade = entropy_grade(info["tdist_pdf"], spread, cfg.xi)
                else:
                    samples_hp = jax.random.uniform(
                        jax.random.fold_in(k_hp, i),
                        (cfg.num_target_samples, cfg.s_dim),
                        minval=self.robot_lim[:, 0], maxval=self.robot_lim[:, 1],
                    )
                    pdf_vals = self.model.apply(p, mstate, samples_hp, method=CVAE.pdf)
                    all_x, x_mask = buf.get_all_x()
                    grade, spread = entropy_grade_spread(
                        pdf_vals, all_x, x_mask, samples_hp,
                        jnp.arange(cfg.s_dim), jnp.full(cfg.s_dim, cfg.std), cfg.xi,
                    )
                h = hyperparam_update(
                    h, grade, spread,
                    fixed_beta=cfg.fixed_beta, beta_manual_ramp=cfg.beta_manual_ramp,
                    fixed_gamma=cfg.fixed_gamma,
                    gamma_manual_ramp=cfg.gamma_manual_ramp,
                    other_locs=cfg.other_locs,
                    beta_start=cfg.beta_start_weight, beta_end=cfg.beta_end_weight,
                    beta_warmup_steps=cfg.beta_warmup_steps,
                    beta_warmup_epoch=cfg.beta_warmup_epoch,
                    gamma_start=cfg.gamma_start_weight,
                    gamma_end=cfg.gamma_end_weight,
                    gamma_warmup_steps=cfg.gamma_warmup_steps,
                    gamma_warmup_epoch=cfg.gamma_warmup_epoch,
                )
                h = h._replace(iter=h.iter + self.trainer.num_learning_opt)
                if self.mesh is not None:
                    from ..parallel.train import dp_train_call
                    p, o, mets = dp_train_call(
                        self.trainer, self.mesh, p, o, buf,
                        jax.random.fold_in(k_train, i), h.beta, h.gamma,
                    )
                else:
                    p, o, mets = train_call(
                        self.trainer, p, o, buf,
                        jax.random.fold_in(k_train, i), h.beta, h.gamma,
                    )
                return p, o, h, grade, spread, mets

            def _skip(args):
                p, o, h = args
                zeros = jax.tree.map(
                    lambda s: jnp.zeros(s.shape, s.dtype),
                    jax.eval_shape(_train, (p, o, h))[5],
                )
                nan = jnp.full((), jnp.nan, jnp.float32)
                return p, o, h, nan, nan, zeros

            if self.throttle == "where":
                # always execute; select outputs on the predicate. The
                # trainer compute is wasted only on skip steps, which a
                # train_every=1 deployment (almost) never takes — and it
                # avoids the cond boundary's ~2.9 ms ring materialization.
                outs = _train((params, opt_state, hyper))
                skips = _skip((params, opt_state, hyper))
                params, opt_state, hyper, grade, spread, mets = jax.tree.map(
                    lambda a, b: jnp.where(do, a, b), outs, skips
                )
            else:
                params, opt_state, hyper, grade, spread, mets = jax.lax.cond(
                    do, _train, _skip, (params, opt_state, hyper)
                )
            # NaN grade/spread (skip branch) is dropped by the nan-guard
            buf = buf.update_hyperparams(es.explr_step, grade, spread)
            learning_ind = learning_ind + do.astype(jnp.int32)
            metrics = mets

        es = ExperimentState(
            params=params, opt_state=opt_state, mstate=mstate, pstate=pstate,
            buf=buf, env=es.env, hyper=hyper, key=key,
            explr_step=es.explr_step + 1, learning_ind=learning_ind,
        )
        tick_info = {
            "ergodic_cost": info["cost"],
            "loss": metrics["loss"][-1] if metrics is not None else jnp.zeros(()),
            "beta": hyper.beta,
            "gamma": hyper.gamma,
            "robot_state": robot_state,
            "force": force,
        }
        return es, tick_info

    def run_chunk(self, es: ExperimentState, n_steps: int):
        """n exploration steps fused into one device program (lax.scan) —
        the TPU-native replacement for the reference's process tree."""
        def body(carry, _):
            return self.tick(carry)
        return jax.lax.scan(body, es, None, length=n_steps)

    def post_train_chunk(self, es: ExperimentState, n_calls: int):
        """n trainer calls with NO exploration — the post-exploration
        training phase. After the exploration loop ends, the reference
        keeps issuing trainer calls (pre_train_mp -> 25 SGD steps ->
        post_train_mp) until learning_ind reaches num_steps *
        target_learning_rate, then saves model_postexplr
        (trainer_ddp.py:202-249, main_async.py:117-158). Here each call is
        one scan iteration: entropy grade/spread over the frozen replay
        ring -> hyperparam update -> trainer call. Pure; jit me."""
        cfg = self.cfg

        def body(carry, _):
            es = carry
            key, k_train, k_hp = jax.random.split(es.key, 3)
            samples_hp = jax.random.uniform(
                k_hp, (cfg.num_target_samples, cfg.s_dim),
                minval=self.robot_lim[:, 0], maxval=self.robot_lim[:, 1],
            )
            pdf_vals = self.model.apply(es.params, es.mstate, samples_hp,
                                        method=CVAE.pdf)
            all_x, x_mask = es.buf.get_all_x()
            grade, spread = entropy_grade_spread(
                pdf_vals, all_x, x_mask, samples_hp,
                jnp.arange(cfg.s_dim), jnp.full(cfg.s_dim, cfg.std), cfg.xi,
            )
            hyper = hyperparam_update(
                es.hyper, grade, spread,
                fixed_beta=cfg.fixed_beta, beta_manual_ramp=cfg.beta_manual_ramp,
                fixed_gamma=cfg.fixed_gamma,
                gamma_manual_ramp=cfg.gamma_manual_ramp,
                other_locs=cfg.other_locs,
                beta_start=cfg.beta_start_weight, beta_end=cfg.beta_end_weight,
                beta_warmup_steps=cfg.beta_warmup_steps,
                beta_warmup_epoch=cfg.beta_warmup_epoch,
                gamma_start=cfg.gamma_start_weight,
                gamma_end=cfg.gamma_end_weight,
                gamma_warmup_steps=cfg.gamma_warmup_steps,
                gamma_warmup_epoch=cfg.gamma_warmup_epoch,
            )
            hyper = hyper._replace(iter=hyper.iter + self.trainer.num_learning_opt)
            if self.mesh is not None:
                from ..parallel.train import dp_train_call
                params, opt_state, mets = dp_train_call(
                    self.trainer, self.mesh, es.params, es.opt_state, es.buf,
                    k_train, hyper.beta, hyper.gamma,
                )
            else:
                params, opt_state, mets = train_call(
                    self.trainer, es.params, es.opt_state, es.buf,
                    k_train, hyper.beta, hyper.gamma,
                )
            buf = es.buf.update_hyperparams(es.explr_step, grade, spread)
            es = es._replace(
                params=params, opt_state=opt_state, buf=buf, hyper=hyper,
                key=key, learning_ind=es.learning_ind + 1,
            )
            return es, {"loss": mets["loss"][-1], "beta": hyper.beta,
                        "gamma": hyper.gamma}

        return jax.lax.scan(body, es, None, length=n_calls)
