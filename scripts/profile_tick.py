"""Per-stage device-time breakdown of the flagship explore+learn tick.

Axon-honest timing: each stage is scanned N times inside ONE jitted program
(dependent chain), and a single host transfer forces completion, so the
tunnel RTT amortizes to nothing. Prints a table of ms/stage and the tick's
FLOP count + rough MFU.

Usage: python scripts/profile_tick.py [--inline]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


_DISPATCH_S = None


def dispatch_overhead():
    """Fixed per-jitted-call cost of this backend (measured with a
    near-empty program; ~30 ms over the axon tunnel). Subtracted from every
    stage so the numbers reflect device time, not RTT."""
    global _DISPATCH_S
    if _DISPATCH_S is None:
        def empty(x):
            return jax.lax.scan(lambda c, _: (c + 1.0, None), x, None,
                                length=8)[0]
        f = jax.jit(empty)
        _ = float(f(0.0))
        best = float("inf")
        for _ in range(5):
            t0 = time.perf_counter()
            _ = float(f(0.0))
            best = min(best, time.perf_counter() - t0)
        _DISPATCH_S = best
        print(f"{'per-dispatch overhead':<38s} {best*1e3:8.2f} ms (subtracted)")
    return _DISPATCH_S


def timed_scan(fn, state, n=30, name=""):
    """Scan fn n times over a carried state; return dispatch-corrected
    ms_per_call."""
    over = dispatch_overhead()
    def body(c, _):
        return fn(c), None
    run = jax.jit(lambda s: jax.lax.scan(body, s, None, length=n)[0])
    out = run(state)  # compile + warm
    leaf = jax.tree.leaves(out)[0]
    _ = jax.device_get(jnp.sum(leaf.astype(jnp.float32)))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = run(out if jax.tree.structure(out) == jax.tree.structure(state) else state)
        leaf = jax.tree.leaves(out)[0]
        _ = jax.device_get(jnp.sum(leaf.astype(jnp.float32)))
        best = min(best, (time.perf_counter() - t0) / n)
    best = max(best - over / n, 0.0)
    print(f"{name:<38s} {best*1e3:8.2f} ms")
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sgd", type=int, default=25)
    args = ap.parse_args()

    from ealv_tpu.utils.config import ExperimentConfig
    from ealv_tpu.runtime import Experiment
    from ealv_tpu.runtime.trainer import train_call
    from ealv_tpu.models.cvae import update_dist, CVAE

    cfg = ExperimentConfig(
        states="xyw", num_target_samples=2000, num_traj_samples=3000,
        image_dim=(180, 180, 3), batch_size=64, num_learning_opt=args.sgd,
    )
    exp = Experiment(cfg, train_calls_per_tick=1, train_every=1)
    es = exp.init(seed=0)

    # warm the buffer so the trainer has real work
    warm = jax.jit(lambda s: exp.run_chunk(s, 40)[0])
    es = warm(es)
    _ = float(es.explr_step)
    print(f"device: {jax.devices()[0]}, buffer={int(es.buf.size)}")

    # ---- full tick ----
    tick_ms = timed_scan(lambda s: exp.tick(s)[0], es, n=30,
                         name=f"full tick (inline {args.sgd} SGD)")

    # ---- stage: plan ----
    def plan_only(s):
        full_state = exp._measured_robot_state(s.env)
        pstate = exp.planner.save_update(s.pstate, full_state, save=True)
        pstate, info = exp.planner.plan(pstate, (s.params, s.mstate),
                                        use_prior=jnp.array(False))
        return s._replace(pstate=pstate)
    timed_scan(plan_only, es, n=30, name="plan (2000x3000 + CVAE pdf)")

    # ---- stage: env step + render/observe ----
    def sense_only(s):
        env = s.env
        for _ in range(cfg.data_to_ctrl_rate):
            env = exp.env.step_vel(env, jnp.zeros(6), None)
        pose, vel, force, img = exp.env.observe(env)
        buf = s.buf.push(s.buf.x[0] + img[0, 0, 0] * 0, img, force)
        return s._replace(env=env, buf=buf)
    timed_scan(sense_only, es, n=30, name="env step + render + push")

    # ---- stage: reseed (update_dist = 1-row encoder) ----
    def reseed_only(s):
        m, _ = update_dist(exp.model, s.params, s.mstate,
                           s.buf.x[0], s.buf.y[0], None)
        return s._replace(mstate=m)
    timed_scan(reseed_only, es, n=30, name="reseed (update_dist)")

    # ---- stage: entropy hyperparams ----
    from ealv_tpu.runtime.schedules import entropy_grade_spread
    def hp_only(s):
        samples_hp = jax.random.uniform(
            s.key, (cfg.num_target_samples, cfg.s_dim),
            minval=exp.robot_lim[:, 0], maxval=exp.robot_lim[:, 1])
        pdf_vals = exp.model.apply(s.params, s.mstate, samples_hp,
                                   method=CVAE.pdf)
        all_x, x_mask = s.buf.get_all_x()
        grade, spread = entropy_grade_spread(
            pdf_vals, all_x, x_mask, samples_hp, jnp.arange(cfg.s_dim),
            jnp.full(cfg.s_dim, cfg.std), cfg.xi)
        return s._replace(key=jax.random.fold_in(s.key, grade.astype(jnp.int32)))
    timed_scan(hp_only, es, n=30, name="entropy grade/spread (2000 pdf)")

    # ---- stage: trainer call ----
    def train_only(s):
        p, o, mets = train_call(exp.trainer, s.params, s.opt_state, s.buf,
                                s.key, 1e-4, 0.1)
        return s._replace(params=p, opt_state=o,
                          key=jax.random.fold_in(s.key, 1))
    tr_ms = timed_scan(train_only, es, n=10,
                       name=f"trainer call ({args.sgd} SGD @ b{cfg.batch_size})")
    print(f"{'  per SGD step':<38s} {tr_ms/args.sgd*1e3:8.2f} ms")

    # ---- trainer internals: fwd vs fwd+bwd, 1-step ----
    one = exp.trainer.__class__(**{**exp.trainer.__dict__, "num_learning_opt": 1})
    def train1(s):
        p, o, mets = train_call(one, s.params, s.opt_state, s.buf, s.key,
                                1e-4, 0.1)
        return s._replace(params=p, opt_state=o,
                          key=jax.random.fold_in(s.key, 1))
    timed_scan(train1, es, n=25, name="trainer 1 SGD step")

    def fwd_only(s):
        x, y, force, idx = s.buf.sample(s.key, cfg.batch_size, weighted=True)
        out = exp.model.apply(s.params, x, y, train=False)
        return s._replace(key=jax.random.fold_in(s.key, idx[0]))
    timed_scan(fwd_only, es, n=25, name="  forward only (b64, no x_decode)")

    def fwd_xdec(s):
        x, y, force, idx = s.buf.sample(s.key, cfg.batch_size, weighted=True)
        out = exp.model.apply(s.params, x, y, x_decode=x, train=False)
        return s._replace(key=jax.random.fold_in(s.key, idx[0]))
    timed_scan(fwd_xdec, es, n=25, name="  forward + cross-decode (2B dec)")

    print(f"\nsummary: tick {tick_ms*1e3:.1f} ms = {1/tick_ms:.1f} Hz; "
          f"trainer {tr_ms*1e3:.1f} ms ({tr_ms/tick_ms*100:.0f}% of tick)")


if __name__ == "__main__":
    main()
