"""Sample-based KL-ergodic MPC as one jitted TPU program.

Behavioral parity target: the reference's production planner
franka_test/scripts/control_torch/klerg.py (Robot :85, kldiv_planner :489,
forward :409, backward :433, rho_dot :590, get_target_dist :452,
get_samples :367, get_cost :686, line_search :712, save_update :293,
saturate_control :342) with the default flag set of
control_torch/robot_config.yaml.

TPU-first re-design (not a port):
  - The whole planner call — sampling, target-dist shaping, the hybrid
    iLQR-like inner loop with its acceptance tests and line search — is ONE
    jitted pure function. The reference's Python ``break``s become carried
    ``done`` masks over fixed-trip-count ``lax.scan``s; the variable-length
    line-search ``while`` becomes a masked scan over its (bounded, <=
    max_app_dur) iterations.
  - The (num_traj_samples x num_target_samples) footprint is the MXU matmul
    kernel of ealv_tpu.ops (the reference jit-traces a torch broadcast,
    klerg.py:334).
  - Variable-length trajectory history (memory buffer fill state) is a
    fixed-capacity ring + validity mask; empty-history behaves like the
    reference's zeroed q_base (klerg.py:497-498).
  - The target distribution is abstract: ``pdf_fn(ctx, samples)`` where ctx
    is a pytree (CVAE params+state, Gaussian target, belief grid), so model
    hot-swap is just passing new ctx — no file/flag-file handoff.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from ..ops import (
    renormalize,
    cost_norm,
    traj_footprint,
    traj_spread,
    kldiv_grad_batch,
)
from ..data.replay import TrajMemory
from .dynamics import rk4_step, DynState
from .policies import BarrierPushPolicy, ZeroPolicy, RollPolicy


@dataclasses.dataclass(frozen=True)
class KlergConfig:
    """Static planner configuration (the robot_config.yaml flag set +
    constructor args of Robot, klerg.py:87-91)."""

    horizon: int = 10
    num_target_samples: int = 2000
    num_traj_samples: int = 3000
    dt: float = 0.1
    R: float = 0.5
    std: float = 0.05
    alpha: float = 1.0
    pct_inner: float = 0.5  # pct_of_horizon_for_inner_loop
    # flags (robot_config.yaml)
    ctrl_app_search: bool = True
    full_cost: bool = False
    fixed_lam: bool = False
    lam: int = 1
    saturate: bool = False
    max_app_dur: int = 5
    weight_temp: bool = True
    weight_env: bool = False
    uniform_tdist: bool = False
    # sampling tricks (get_samples :367-407); defaults match robot_config.yaml
    add_recent_history: bool = False
    sample_near_current_loc: bool = False
    vel_smoothing: float = 0.8  # save_update :311-315 (0.5 for pybullet)

    @property
    def num_iters(self) -> int:
        return max(1, int(self.pct_inner * self.horizon))


class PlannerState(NamedTuple):
    u: jax.Array  # (H, m) control plan
    dyn: DynState  # current (measured) robot state
    memory: TrajMemory  # visited-state ring
    lims: jax.Array  # (d_explr, 2) sampling limits (scaled robot_lim)
    barrier: object  # BarrierFunction pytree
    last_plan: jax.Array  # (H+1, n) forward-simulated plan
    key: jax.Array  # PRNG


class KlergPlanner:
    """Factory binding static config + dynamics + policy + pdf_fn into pure
    jittable methods. ``explr_locs`` are the state-vector indices sampled /
    explored (the reference's explr_locs, klerg.py:162); ``states`` is the
    exploration state string used for per-dim kernel widths (:187) and
    control limits (:197).
    """

    def __init__(self, cfg: KlergConfig, dyn, policy, pdf_fn: Callable,
                 states: str, explr_locs, prior_dist=None):
        self.cfg = cfg
        self.dyn = dyn
        self.policy = policy
        self.pdf_fn = pdf_fn
        # scene prior used during the first prior_steps (use_prior path,
        # klerg.py:108-110,459-461); defaults to the hardcoded two-object
        # prior of the reference
        from .target_dists import prior_dist as make_prior
        self.prior_dist = prior_dist if prior_dist is not None else make_prior(states)
        self.states = states
        self.explr_locs = jnp.asarray(explr_locs, jnp.int32)
        # per-dim kernel width: velocities (uppercase) get 5x (klerg.py:187)
        self.std = jnp.asarray(
            [1.0 if s == s.lower() else 5.0 for s in states], jnp.float32
        ) * cfg.std
        # control saturation limits: z tighter (klerg.py:197)
        m = dyn.num_actions
        ctrl_states = states[:m] if len(states) >= m else states
        self.control_lim = jnp.asarray(
            [[-0.5, 0.5] if s == "z" else [-1.0, 1.0] for s in ctrl_states.ljust(m, "x")],
            jnp.float32,
        )
        self.R_inv = jnp.linalg.inv(jnp.eye(m, dtype=jnp.float32) * cfg.R)
        self.robot_lim = None  # set in init_state; kept static-shaped in pstate

    # ------------------------------------------------------------------
    def init_state(self, x0, robot_lim, barrier, buffer_capacity: int = 3000,
                   explr_lim_scale: float = 1.0, seed: int = 0) -> PlannerState:
        """Parity: Robot.__init__ workspace setup (klerg.py:113-211)."""
        robot_lim = jnp.asarray(robot_lim, jnp.float32)
        self._robot_lim = robot_lim  # exploration-dim bounds, static per planner
        span = (robot_lim[:, 1] - robot_lim[:, 0])[:, None]
        lims = robot_lim + jnp.asarray([[-1.0, 1.0]]) * span * (explr_lim_scale - 1.0) / 2.0
        dyn0 = self.dyn.init(jnp.asarray(x0, jnp.float32))
        u0 = jnp.zeros((self.cfg.horizon, self.dyn.num_actions), jnp.float32)
        pstate = PlannerState(
            u=u0,
            dyn=dyn0,
            memory=TrajMemory.create(buffer_capacity, self.dyn.num_states),
            lims=lims,
            barrier=barrier,
            last_plan=jnp.zeros((self.cfg.horizon + 1, self.dyn.num_states)),
            key=jax.random.PRNGKey(seed),
        )
        return pstate._replace(last_plan=self._rollout(dyn0, u0))

    def update_lims(self, pstate: PlannerState, idx, lims, robot_ctrl_lim=None):
        """Shrink/extend sampling limits (fingerprint capture; klerg.py:253-263)."""
        new_lims = pstate.lims.at[jnp.asarray(idx)].set(jnp.asarray(lims, jnp.float32))
        barrier = pstate.barrier
        if robot_ctrl_lim is not None and hasattr(barrier, "update_lims"):
            n_pos = self.dyn.num_actions
            barr_lim = jnp.concatenate(
                [new_lims[:n_pos], jnp.asarray(robot_ctrl_lim, jnp.float32)], 0
            )
            barrier = barrier.update_lims(barr_lim)
        return pstate._replace(lims=new_lims, barrier=barrier)

    # ------------------------------------------------------------------
    def _rollout(self, dyn0: DynState, u):
        """(H+1, n) states from rolling u open-loop (last_plan, klerg.py:580-582)."""
        def body(s, ut):
            s2 = self.dyn.step(s, ut)
            return s2, s2.x
        _, xs = jax.lax.scan(body, dyn0, u, unroll=True)
        return jnp.concatenate([dyn0.x[None], xs], 0)

    def _traj_states(self, dyn0: DynState, u):
        """(H, n) post-step states (get_cost's traj_list, klerg.py:690).
        ``u`` may be batched (..., H, m) -> (..., H, n): candidate plans roll
        out together as one batched program instead of per-candidate chains.
        """
        def body(s, ut):
            s2 = self.dyn.step(s, ut)
            return s2, s2.x
        if u.ndim == 2:
            return jax.lax.scan(body, dyn0, u, unroll=True)[1]
        roll = lambda uu: jax.lax.scan(body, dyn0, uu, unroll=True)[1]
        return jax.vmap(roll)(u)

    def _cost(self, dyn0, u_test, samples, p_n, q_base, barrier):
        """KL + barrier cost of candidate plan(s) (parity: get_cost :686-710).
        ``p_n`` is the cost-normalized target. ``u_test`` (H, m) -> scalar,
        or batched (K, H, m) -> (K,) costs in ONE footprint kernel."""
        if u_test.ndim == 2:
            traj = self._traj_states(dyn0, u_test)
            q_iter = traj_footprint(traj, samples, self.explr_locs, self.std)
            q = cost_norm(renormalize(q_base + q_iter))
            d_kl = jnp.sum(p_n * jnp.log(p_n / q))
            barr = jnp.sum(barrier.batch(traj))
            return d_kl + barr
        from ..ops import psi_matrix

        trajs = self._traj_states(dyn0, u_test)  # (K, H, n)
        k, h, _ = trajs.shape
        flat = trajs.reshape(k * h, -1)[:, self.explr_locs]
        psi_m = psi_matrix(samples, flat, self.std)  # (N, K*H) — ONE kernel
        q_iters = jnp.moveaxis(psi_m.reshape(-1, k, h).sum(-1), 1, 0)  # (K, N)
        q = renormalize(q_base[None, :] + q_iters, axis=1)
        q = jnp.where(jnp.isnan(q), 1e-6, q)
        q = q / jnp.sum(q, axis=1, keepdims=True)
        d_kl = jnp.sum(p_n[None, :] * jnp.log(p_n[None, :] / q), axis=1)
        barr = jax.vmap(lambda t: jnp.sum(barrier.batch(t)))(trajs)
        return d_kl + barr

    def _forward(self, pstate: PlannerState, u, idx):
        """Forward pass collecting linearizations (parity: forward :409-431).
        Returns (u_eff (H,m), traj (H,n) pre-step states, A, B, dbarr, dmu)."""
        zero_first = isinstance(self.policy, BarrierPushPolicy)
        u_init = jnp.where(zero_first & (idx == 0), jnp.zeros_like(u), u)

        def body(s, ut):
            u_eff = self.policy.act(s.x, ut)
            A, B = self.dyn.get_lin(s, u_eff)
            dmu = self.policy.dx(s.x, u_eff)
            dbarr = pstate.barrier.dbarr(s.x)
            x_t = s.x
            s2 = self.dyn.step(s, u_eff)
            return s2, (u_eff, x_t, A, B, dbarr, dmu)

        _, (u_eff, xs, A, B, dbarr, dmu) = jax.lax.scan(
            body, pstate.dyn, u_init, unroll=True
        )
        return u_eff, xs, A, B, dbarr, dmu

    def _backward(self, samples, p, q, xs, A, B, dbarr, dmu):
        """Costate integration (parity: backward :433-450, rho_dot :590-593).
        Returns (du (H,m), djdlam (H,))."""
        ratio = p / q
        # dgdx is rho-independent: one batched (H, N) kernel up front, so
        # the reverse scan is a pure chain of tiny matrix recursions
        dgdx_all = kldiv_grad_batch(xs, samples, self.explr_locs, self.std, ratio)

        def body(rho, inp):
            dgdx, A_t, B_t, db_t, dmu_t = inp
            def rho_dot(r, _):
                return dgdx - db_t - (A_t + B_t @ dmu_t).T @ r
            rho2 = rk4_step(rho_dot, -self.cfg.dt, rho, None)
            du = -self.R_inv @ B_t.T @ rho2
            djdlam = rho2 @ B_t @ du
            return rho2, (du, djdlam)

        rho0 = jnp.zeros(self.dyn.num_states, jnp.float32)
        _, (du, djdlam) = jax.lax.scan(
            body, rho0, (dgdx_all, A, B, dbarr, dmu), reverse=True, unroll=True
        )
        return du, djdlam

    def _target_dist(self, pdf_ctx, pstate, samples, temp, plot: bool = False,
                     use_prior=False, with_aux: bool = False):
        """Parity: get_target_dist :452-486 with uniform/prior/model modes +
        weight_temp/weight_env shaping. ``use_prior`` may be traced (the
        prior_steps schedule selects it per step).

        ``with_aux`` additionally returns {'pdf': raw model pdf at the
        samples, 'spread': the mean normalized coverage} — the exact
        quantities the trainer's entropy grade/spread schedule needs
        (pre_train_mp, trainer_module.py:487-545), so the tick can reuse
        this call's decode instead of running a second one. Keys are absent
        when the planner never computes them (uniform target / shaping off).
        """
        cfg = self.cfg
        rl = self._robot_lim
        aux = {}
        outside = jnp.any((samples < rl[:, 0]) | (samples > rl[:, 1]), axis=1)
        if cfg.uniform_tdist and not plot:
            p = renormalize(jnp.ones(samples.shape[0], jnp.float32))
        else:
            p = self.pdf_fn(pdf_ctx, samples)
            aux["pdf"] = p
            p_prior = renormalize(self.prior_dist.pdf(samples[:, : self.prior_dist.means.shape[1]]))
            p = jnp.where(use_prior, p_prior, p)
        if cfg.weight_env or cfg.weight_temp or plot:
            traj_all, mask = pstate.memory.get_all()
            spread = traj_spread(traj_all, samples, self.explr_locs, self.std,
                                 traj_mask=mask)
            spread = spread / jnp.maximum(jnp.max(spread), 1e-30)
            # scalar BEFORE the outside/empty adjustments — the
            # entropy-schedule form (pre_train_mp :511-525)
            aux["spread"] = jnp.where(
                pstate.memory.size > 0, jnp.mean(spread), 0.0)
            spread = jnp.where(outside, 1.0, spread)
            spread = jnp.where(pstate.memory.size > 0, spread, 0.0)
            if cfg.weight_env and not plot:
                p = p + (1.0 - spread) * jnp.min(p)
            else:
                p = p ** jnp.mean(spread)
            p = renormalize(p)
        if with_aux:
            return p**temp, aux
        return p**temp

    def _saturate(self, u):
        """Parity: saturate_control :342-349 / clamp (:523)."""
        if self.cfg.saturate:
            return jnp.tanh(u / 0.1) * self.control_lim[:, 1]
        return jnp.clip(u, self.control_lim[:, 0], self.control_lim[:, 1])

    def _line_search(self, cost_fn, t_app, u_app, u, idx, J0):
        """Fixed-trip re-expression of line_search :712-751.

        TPU-first: ALL candidate windows (lam = 1..max_app_dur) are costed in
        ONE batched rollout+footprint call up front (the reference evaluates
        them sequentially in a data-dependent while loop); the sequential
        early-stopping acceptance then runs as a cheap masked scan over the
        precomputed cost vector. Returns (tau_i, tau_f, success)."""
        H = self.cfg.horizon
        mad = self.cfg.max_app_dur

        # initial window size (parity :714-720)
        lam0 = jnp.where(
            (t_app == 0) | (t_app == H - 1),
            jnp.minimum(H, mad),
            jnp.where(
                t_app == idx,
                jnp.minimum(H - t_app, mad),
                jnp.minimum(
                    jnp.minimum(t_app - idx, H - t_app - idx), (mad + 1) // 2
                ),
            ),
        )
        lam0 = jnp.maximum(lam0, 1)

        def window(lam):
            # parity :730-738 (note different precedence than lam0's cases)
            ti = jnp.where(t_app == idx, t_app, jnp.where(t_app == H - 1, lam - 1, t_app - lam))
            tf = jnp.where(t_app == idx, lam + 1, jnp.where(t_app == H - 1, t_app, t_app + lam + 1))
            return ti, tf

        lams = jnp.arange(1, mad + 1)
        tis, tfs = jax.vmap(window)(lams)  # (mad,)
        t = jnp.arange(H)
        masks = (t[None, :] >= tis[:, None]) & (t[None, :] < tfs[:, None])  # (mad, H)
        u_variants = jnp.where(masks[:, :, None], u_app[None, None, :], u[None, :, :])
        Js = cost_fn(u_variants)  # (mad,) — one batched cost evaluation

        def body(carry, k):
            done, ti_l, tf_l, Jn_last, ti, tf, Jn = carry
            lam_k = lam0 - k
            active = (~done) & (lam_k > 0)
            # save current as "last" before testing the new window (:727-728)
            ti_l2 = jnp.where(active, ti, ti_l)
            tf_l2 = jnp.where(active, tf, tf_l)
            Jn_last2 = jnp.where(active, Jn, Jn_last)
            ti2 = tis[lam_k - 1]
            tf2 = tfs[lam_k - 1]
            Jn2 = jnp.where(active, Js[lam_k - 1], Jn)
            done2 = done | (active & (Jn_last2 < J0) & (Jn2 > Jn_last2))
            return (done2,
                    jnp.where(active, ti_l2, ti_l), jnp.where(active, tf_l2, tf_l),
                    Jn_last2,
                    jnp.where(active, ti2, ti), jnp.where(active, tf2, tf),
                    Jn2), None

        init = (jnp.zeros((), bool),
                jnp.asarray(idx), lam0,  # tau_last = [idx, lam] (:724)
                J0 * 2.0,  # Jn_last placeholder
                jnp.asarray(idx), lam0,  # current tau
                J0 * 2.0)
        (done, ti_l, tf_l, Jn_last, ti, tf, Jn), _ = jax.lax.scan(
            body, init, jnp.arange(mad), unroll=True
        )
        # post-loop acceptance (:748-750)
        take_cur = (~done) & (Jn < J0)
        ti_out = jnp.where(take_cur, ti, ti_l)
        tf_out = jnp.where(take_cur, tf, tf_l)
        success = done | take_cur
        return ti_out, tf_out, success

    # ------------------------------------------------------------------
    def plan(self, pstate: PlannerState, pdf_ctx, temp: float = 1.0,
             use_prior=False):
        """One full planner call (parity: kldiv_planner :489-588).
        Returns (pstate', info dict)."""
        cfg = self.cfg
        H = cfg.horizon
        key, k_samp, k_hist = jax.random.split(pstate.key, 3)

        # --- sampling (get_samples :367-407, default flags)
        d = pstate.lims.shape[0]
        n_uniform = cfg.num_target_samples
        if cfg.sample_near_current_loc:
            n_uniform = int(n_uniform * 0.9)
        samples = jax.random.uniform(
            k_samp, (n_uniform, d),
            minval=pstate.lims[:, 0], maxval=pstate.lims[:, 1],
        )
        if cfg.sample_near_current_loc:
            k_loc, k_samp = jax.random.split(k_samp)
            n_near = cfg.num_target_samples - n_uniform
            near = (
                jax.random.normal(k_loc, (n_near, d)) * (self.std * 4.0)
                + pstate.dyn.x[self.explr_locs][None, :]
            )
            samples = jnp.concatenate([samples, near], 0)
        if cfg.add_recent_history:
            recent, _ = pstate.memory.get_recent(H)
            samples = jnp.concatenate([samples, recent[:, self.explr_locs]], 0)
        traj_hist, hist_mask = pstate.memory.sample(k_hist, cfg.num_traj_samples)

        return self.plan_with_inputs(pstate._replace(key=key), pdf_ctx,
                                     samples, traj_hist, hist_mask,
                                     temp=temp, use_prior=use_prior)

    def plan_with_inputs(self, pstate: PlannerState, pdf_ctx, samples,
                         traj_hist, hist_mask, temp: float = 1.0,
                         use_prior=False):
        """The planner call AFTER sampling: target shaping, base footprint,
        and the hybrid inner loop, on caller-provided (samples,
        traj-history) inputs. ``plan`` draws them from the PRNG; this seam
        exists so a step-matched parity test can feed BOTH planners one
        identical frozen tuple and compare the accepted plan and cost
        trajectory of a single kldiv_planner call (klerg.py:489-588)."""
        cfg = self.cfg
        H = cfg.horizon

        # --- target + base footprint
        p, tdist_aux = self._target_dist(pdf_ctx, pstate, samples, temp,
                                         use_prior=use_prior, with_aux=True)
        q_base = traj_footprint(
            traj_hist, samples, self.explr_locs, self.std, traj_mask=hist_mask
        )
        p_n = cost_norm(p)
        cost_fn = lambda u_test: self._cost(
            pstate.dyn, u_test, samples, p_n, q_base, pstate.barrier
        )

        # --- inner hybrid loop (kldiv_planner :505-576), fixed trips + done mask
        def iter_body(carry, idx):
            u, last_cost, q_keep, done = carry
            u_eff, xs, A, B, dbarr, dmu = self._forward(pstate, u, idx)
            q_iter = traj_footprint(xs, samples, self.explr_locs, self.std)
            q = renormalize(q_base + q_iter)
            du, djdlam = self._backward(samples, p, q, xs, A, B, dbarr, dmu)
            u_star = self._saturate(u_eff + cfg.alpha * du)

            if cfg.ctrl_app_search:
                if cfg.full_cost:
                    # batched one-slot-substitution cost (:527-545)
                    t_idx = jnp.arange(H)
                    u_variants = jnp.broadcast_to(u[None], (H, H, u.shape[1]))
                    u_variants = u_variants.at[t_idx, t_idx].set(u_star)
                    costs = jax.vmap(cost_fn)(u_variants)
                    djdlam = renormalize(costs) - 1.0
                t_app = jnp.argmin(djdlam)
                neg = djdlam[t_app] < 0
                u_app = u_star[t_app]
                if cfg.fixed_lam:
                    t = jnp.arange(H)
                    m = ((t >= t_app) & (t < t_app + cfg.lam))[:, None]
                    u_new = jnp.where(m, u_app[None], u_eff)
                    ls_ok = jnp.ones((), bool)
                else:
                    # candidate windows are costed on the NOMINAL plan (the
                    # reference fills self.u, :741-743) even though the
                    # accepted window is applied to the policy-effective
                    # controls below; identical for Roll/Zero, differs for
                    # BarrierPush
                    ti, tf, ls_ok = self._line_search(
                        cost_fn, t_app, u_app, u, idx, last_cost
                    )
                    t = jnp.arange(H)
                    m = (ls_ok & (t >= ti) & (t < tf))[:, None]
                    u_new = jnp.where(m, u_app[None], u_eff)
                # non-negative djdlam -> break without updating (:560-564)
                step_done = ~neg
            else:
                u_new = u_star
                step_done = jnp.zeros((), bool)

            cost = cost_fn(u_new)
            cost_break = (idx > 0) & (last_cost <= cost)
            accept = (~done) & (~step_done) & (~cost_break)

            u_out = jnp.where(accept, u_new, u)
            last_cost_out = jnp.where(accept, cost, last_cost)
            q_out = jnp.where(accept, q, q_keep)
            done_out = done | step_done | cost_break
            return (u_out, last_cost_out, q_out, done_out), cost

        cost0 = cost_fn(pstate.u)
        q0 = renormalize(q_base)
        (u, final_cost, q_final, _), _ = jax.lax.scan(
            iter_body,
            (pstate.u, cost0, q0, jnp.zeros((), bool)),
            jnp.arange(cfg.num_iters),
        )
        u = jnp.nan_to_num(u)  # parity :578
        last_plan = self._rollout(pstate.dyn, u)

        # ergodic cost for logging (update_plots :679-682)
        q_n = cost_norm(q_final)
        d_kl = jnp.sum(p_n * jnp.log(p_n / q_n))

        pstate = pstate._replace(u=u, last_plan=last_plan)
        info = dict(samples=samples, p=p, q=q_final, cost=d_kl,
                    planned_traj=last_plan[:, self.explr_locs])
        # raw pdf + coverage for the trainer's entropy schedule (reused by
        # Experiment.absorb_step; keys absent when not computed)
        if "pdf" in tdist_aux:
            info["tdist_pdf"] = tdist_aux["pdf"]
        if "spread" in tdist_aux:
            info["tdist_spread"] = tdist_aux["spread"]
        return pstate, info

    def plot_dists(self, pstate: PlannerState, pdf_ctx, samples, plot_idx,
                   temp: float = 1.0):
        """Smoothed plot distributions (parity: update_plots single/smooth
        path, klerg.py:625-655): pin every non-plot dim to the current state,
        substitute the samples' plot dims, and evaluate the shaped target +
        trajectory footprint there. Returns (pplot_samples, pplot, qplot) —
        the dashboard payload of PlottingBufferTorch."""
        plot_idx = jnp.asarray(plot_idx)
        cur = pstate.dyn.x[self.explr_locs]
        pplot_samples = jnp.broadcast_to(cur[None, :], samples.shape)
        pplot_samples = pplot_samples.at[:, plot_idx].set(samples[:, plot_idx])
        pplot = self._target_dist(pdf_ctx, pstate, pplot_samples, temp, plot=True)
        traj_all, mask = pstate.memory.get_all()
        traj = jnp.concatenate([traj_all, pstate.last_plan], 0)
        mask_full = jnp.concatenate(
            [mask, jnp.ones(pstate.last_plan.shape[0], jnp.float32)], 0
        )
        qplot = renormalize(
            traj_footprint(traj, pplot_samples, self.explr_locs, self.std,
                           traj_mask=mask_full)
        )
        return pplot_samples, pplot, qplot

    def step(self, pstate: PlannerState, pdf_ctx, temp: float = 1.0,
             save_update: bool = False):
        """Plan + apply first control (parity: Robot.step :279-291).
        Returns (pstate', state_explr, vel, ctrl, info)."""
        pstate, info = self.plan(pstate, pdf_ctx, temp)
        ctrl = pstate.u[0]
        dyn2 = self.dyn.step(pstate.dyn, ctrl)
        if save_update:
            pstate = pstate._replace(dyn=dyn2)
            pstate = self.save_update(pstate, dyn2.x, save=True)
        m = self.dyn.num_actions
        return pstate, dyn2.x[self.explr_locs], dyn2.x[m:], ctrl, info

    def save_update(self, pstate: PlannerState, full_state, save: bool = True):
        """Sync planner to a measured state (parity: save_update :293-323):
        nan-guard, closest-plan-point policy shift, velocity smoothing."""
        full_state = jnp.asarray(full_state, jnp.float32)
        bad = jnp.any(jnp.isnan(full_state))
        full_state = jnp.nan_to_num(full_state)
        m = self.dyn.num_actions

        dist = jnp.linalg.norm(pstate.last_plan - full_state[None, :], axis=1)
        policy_idx = jnp.argmin(dist)
        planned = pstate.last_plan[policy_idx]

        vs = self.cfg.vel_smoothing
        vel = vs * full_state[m:] + (1 - vs) * planned[m:]
        x_new = jnp.concatenate([full_state[:m], vel])
        dyn_new = self.dyn.init(x_new)

        # policy warm-start shift (policy.reset(x, u, -policy_idx), :319)
        if isinstance(self.policy, RollPolicy):
            rolled = jnp.roll(pstate.u, -policy_idx, axis=0)
            t = jnp.arange(self.cfg.horizon)
            u_new = jnp.where((t >= self.cfg.horizon - policy_idx)[:, None], 0.0, rolled)
            u_new = jnp.where(policy_idx > 0, u_new, pstate.u)
        elif isinstance(self.policy, ZeroPolicy):
            u_new = jnp.where(policy_idx > 0, jnp.zeros_like(pstate.u), pstate.u)
        else:
            u_new = pstate.u

        memory = pstate.memory
        if save:
            # nan'd measurements are not pushed (:297-299)
            pushed = memory.push(dyn_new.x)
            memory = jax.tree.map(
                lambda a, b: jnp.where(bad, a, b), memory, pushed
            )
        # keep previous state entirely if measurement was nan
        dyn_out = jax.tree.map(
            lambda a, b: jnp.where(bad, a, b), pstate.dyn, dyn_new
        )
        u_out = jnp.where(bad, pstate.u, u_new)
        return pstate._replace(dyn=dyn_out, u=u_out, memory=memory)
