"""Flagship benchmark: fused explore+learn step rate on one TPU chip.

Measures the complete online-learning step at reference production sizes —
KL-ergodic plan (2000 target samples x 3000 traj points, CVAE-uncertainty
target), synthetic-camera sense (180x180x3), replay push, model reseed,
entropy hyperparams, and a full 25-step batch-64 trainer call — i.e. the
work the reference spreads over its 7-process CPU deployment, fused into a
single lax.scan device program (zero host round-trips per step).

Headline configuration (north star, BASELINE.json): high-rate control with
concurrent learning — a full 25-step batch-64 trainer call every 3rd control
step, ~8.3 SGD steps per control step. The INLINE configuration (the
reference's sync semantics: 25 SGD steps EVERY step) is also measured and
reported to stderr with a per-stage breakdown and an MFU estimate.

``--mesh N`` additionally measures the headline chunk with the experiment
mesh-parallel over an N-device mesh (N=1 on the one real chip: verifies the
shard_map/psum path lowers on the actual TPU backend — the CI suite only
ever lowers it on virtual CPU devices — and quantifies the mesh-wrapper
overhead vs mesh=None).

Baselines:
  - The reference's hardware control loop runs at 5 Hz (dt=0.2,
    launch/run.launch:8). ``vs_baseline`` = our explore+learn Hz / 5.
  - CPU torch trainer on this image (single core — nproc=1 here): 633
    ms/SGD step at batch 64, measured with the reference-shaped model. The
    reference recommends 4 DDP workers (launch/run.launch:19); on this
    1-core image 4 gloo workers only timeshare (measured 2.8 s/step), so
    the fair comparison quoted is vs a hypothetical PERFECTLY-scaling
    4-worker CPU: 4 / 0.633 s = 6.3 SGD steps/s.

Timing notes: the axon tunnel adds tens of ms of RTT per host sync and
``block_until_ready`` alone is unreliable on it, so every measurement chains
many steps in one device program and forces ONE host transfer of values that
transitively depend on the whole computation.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import subprocess
import sys
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

PEAK_BF16_FLOPS = 197e12  # TPU v5e (v5 lite) single chip


def _fail_json(stage: str, attempts: list):
    """The one JSON line on unrecoverable backend failure: value null +
    structured error record instead of a stack trace (a transient tunnel
    outage should cost minutes, not the round's artifact)."""
    print(json.dumps({
        "metric": "explore_learn_step_rate",
        "value": None,
        "unit": "Hz",
        "vs_baseline": None,
        "error": {
            "kind": "backend_unavailable",
            "stage": stage,
            "attempts": attempts,
        },
    }))


def _acquire_backend(allow_any_platform: bool = False):
    """Bounded-retry probe of the TPU backend in a SUBPROCESS (an in-process
    ``jax.devices()`` on a flaky tunnel can hang indefinitely and poisons the
    process-wide backend cache on failure). Returns (ok, attempts) where
    attempts is a list of {t, elapsed_s, outcome} records.

    ``allow_any_platform`` (selfcheck mode): accept CPU too — the pre-flight
    certifies the bench CODE PATH, not the numbers, and must be runnable
    in-round without the tunnel.

    Knobs (for tests and driver tuning):
      EALV_BENCH_PROBE_RETRIES  (default 4)
      EALV_BENCH_PROBE_TIMEOUT  per-attempt seconds (default 90)
      EALV_BENCH_PROBE_BACKOFF  comma list of sleeps between attempts
                                (default "5,15,30")
      EALV_BENCH_PROBE_CMD      override probe argv (tests inject a failing
                                command to exercise this path)
    """
    retries = int(os.environ.get("EALV_BENCH_PROBE_RETRIES", "4"))
    timeout = float(os.environ.get("EALV_BENCH_PROBE_TIMEOUT", "90"))
    backoff = [float(x) for x in
               os.environ.get("EALV_BENCH_PROBE_BACKOFF", "5,15,30").split(",")]
    import shlex
    cmd_override = os.environ.get("EALV_BENCH_PROBE_CMD")
    # a sitecustomize pre-imports jax and pins jax_platforms to the TPU
    # plugin; re-apply JAX_PLATFORMS so `JAX_PLATFORMS=cpu bench.py
    # --selfcheck` really probes CPU (for the real bench the platform
    # check below still rejects anything that is not the TPU)
    probe_src = (
        "import os, jax\n"
        "p = os.environ.get('JAX_PLATFORMS')\n"
        "if p: jax.config.update('jax_platforms', p)\n"
        "d = jax.devices(); print(d[0].platform)\n")
    cmd = (shlex.split(cmd_override) if cmd_override else
           [sys.executable, "-c", probe_src])
    attempts = []
    for i in range(retries):
        t0 = time.time()
        try:
            out, err, rc = _run_probe_once(cmd, timeout)
            if rc is None:
                outcome = f"timeout>{timeout:g}s"
            else:
                outcome = _probe_outcome(rc, out, err,
                                         overridden=(cmd_override is not None
                                                     or allow_any_platform))
        except OSError as e:
            outcome = f"oserror: {e}"
        attempts.append({"t": round(t0, 1),
                         "elapsed_s": round(time.time() - t0, 1),
                         "outcome": outcome})
        if outcome == "ok":
            return True, attempts
        print(f"[bench] backend probe attempt {i+1}/{retries} failed: "
              f"{outcome}", file=sys.stderr)
        if i < retries - 1:
            time.sleep(backoff[min(i, len(backoff) - 1)])
    return False, attempts


def _run_probe_once(cmd, timeout):
    """One probe attempt with a BOUNDED reap. ``subprocess.run(timeout=)``
    SIGKILLs a timed-out child and then blocks in communicate() until it
    actually dies — but a probe wedged in an uninterruptible device
    syscall (the tunnel's futex-wait failure mode) survives SIGKILL until
    the syscall returns, which would hang the whole retry loop. Here the
    child's process group is killed and waited at most 5 s; if it still
    will not reap, the zombie is abandoned and the attempt reported as a
    timeout. Returns (stdout, stderr, rc) with rc=None on timeout."""
    import signal
    import tempfile

    with tempfile.TemporaryFile("w+") as fo, \
            tempfile.TemporaryFile("w+") as fe:
        p = subprocess.Popen(cmd, stdout=fo, stderr=fe,
                             start_new_session=True)
        try:
            rc = p.wait(timeout=timeout)
        except subprocess.TimeoutExpired:
            try:
                os.killpg(p.pid, signal.SIGKILL)
            except (ProcessLookupError, PermissionError):
                pass
            try:
                p.wait(timeout=5)
            except subprocess.TimeoutExpired:
                pass
            return "", "", None
        fo.seek(0)
        fe.seek(0)
        return fo.read(), fe.read(), rc


def _probe_outcome(rc: int, stdout: str, stderr: str,
                   overridden: bool) -> str:
    """Classify one probe attempt. A zero exit with a non-TPU platform is a
    FAILURE: jax.devices() falling back to CPU (plugin missing / init
    fallback) would let the benchmark publish a wildly-wrong CPU-measured
    artifact with no error record. Overridden probe commands (tests) are
    judged on exit code only."""
    if rc != 0:
        return "rc=%d: %s" % (rc, stderr.strip()[-200:])
    if not overridden and stdout.strip().split()[-1:] not in (["tpu"],
                                                              ["axon"]):
        return ("wrong platform %r (TPU plugin missing or fell back to "
                "CPU)" % stdout.strip()[-40:])
    return "ok"


def _is_backend_error(e: BaseException) -> bool:
    """Only the tunnel-outage signatures; a generic RuntimeError that merely
    mentions 'backend' (e.g. an unimplemented-lowering regression) must
    stay loud, not hide behind a value:null artifact."""
    msg = str(e)
    return isinstance(e, RuntimeError) and any(
        s in msg for s in ("UNAVAILABLE", "Unable to initialize backend",
                           "DEADLINE_EXCEEDED"))


def _analytic_flops_per_tick(cfg):
    """Rough FLOP count of one inline tick: 25 x (fwd + bwd ~ 3x fwd) of the
    CVAE at batch 64 with the 2B cross-decode, + the 2000-sample planner
    decode + (N, T) footprint kernels. Dominated by the conv stacks and the
    two feat-dim dense layers."""
    h, w, _ = cfg.image_dim
    B = cfg.batch_size
    dims = [(h, w)]
    for k, s in zip(cfg.cnn_kernels, cfg.cnn_strides):
        hh, ww = dims[-1]
        dims.append(((hh - k) // s + 1, (ww - k) // s + 1))
    chans = [cfg.image_dim[2]] + list(cfg.cnn_channels)
    conv = sum(
        2 * oh * ow * (k * k * ci) * co
        for (oh, ow), k, ci, co in zip(
            dims[1:], cfg.cnn_kernels, chans[:-1], chans[1:])
    )
    feat = dims[-1][0] * dims[-1][1] * cfg.cnn_channels[-1]
    hid = cfg.model_hidden() if hasattr(cfg, "model_hidden") else (512, 256)
    dense = 2 * (feat * hid[0] + hid[0] * hid[1] + hid[1] * 2 * cfg.z_dim)
    fwd = B * (2 * conv + dense)  # encoder + decoder(2B halves ~ 2x decoder)
    sgd = 3 * fwd  # fwd + bwd(2x)
    plan_decode = cfg.num_target_samples * dense
    footprint = 2 * cfg.num_target_samples * cfg.num_traj_samples * cfg.s_dim
    return cfg.num_learning_opt * sgd + plan_decode + 4 * footprint


def _timed(run, sync, reps=3, inner=1):
    """Best per-inner-step seconds over reps, one forced host sync each."""
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = run()
        sync(out)
        best = min(best, (time.perf_counter() - t0) / inner)
    return best


def _dispatch_overhead():
    """Fixed per-dispatch cost of ONE jitted call on this backend (the axon
    tunnel pays ~tens of ms per call regardless of the program) — measured
    with a near-empty program and SUBTRACTED from every stage, so stages
    reflect device time, not tunnel RTT."""
    def empty(x):
        def b(c, _):
            return c + 1.0, None
        out, _ = jax.lax.scan(b, x, None, length=25)
        return out
    empty_j = jax.jit(empty)
    _ = float(empty_j(0.0))
    return _timed(lambda: empty_j(0.0), float, inner=1)


def _measure_chunk(exp, es, chunk, t_dispatch):
    """Best steady-state seconds/tick of a run_chunk, dispatch-corrected."""
    run = jax.jit(lambda s: exp.run_chunk(s, chunk))
    es, infos = run(es)
    _ = float(infos["loss"][-1])
    t = _timed(
        lambda: run(es),
        lambda o: float(o[1]["loss"][-1])
        + float(jax.tree.leaves(o[0].params)[0].sum()),
        inner=chunk,
    ) - t_dispatch / chunk
    return t, es, infos


def _stage_breakdown(cfg, exp1, es, t_dispatch, t_inline, K=100, S=100):
    """Per-stage timings of the inline tick, printed to stderr."""
    from ealv_tpu.runtime.trainer import train_call
    from ealv_tpu.models.cvae import update_dist

    stages = {}

    def plan_scan(s):
        def body(ps, _):
            full = exp1._measured_robot_state(s.env)
            ps = exp1.planner.save_update(ps, full, save=True)
            ps, info = exp1.planner.plan(ps, (s.params, s.mstate),
                                         use_prior=jnp.zeros((), bool))
            return ps, info["cost"]
        ps, costs = jax.lax.scan(body, s.pstate, None, length=K)
        return costs
    plan_j = jax.jit(plan_scan)
    _ = float(plan_j(es)[-1])
    stages["plan"] = (_timed(lambda: plan_j(es), lambda o: float(o[-1]),
                             inner=K) - t_dispatch / K)

    def train_scan(s):
        def body(carry, i):
            p, o = carry
            p, o, m = train_call(exp1.trainer, p, o, s.buf,
                                 jax.random.fold_in(s.key, i), 0.001, 0.1)
            return (p, o), m["loss"][-1]
        (_, _), ls = jax.lax.scan(body, (s.params, s.opt_state),
                                  jnp.arange(4))
        return ls
    train_j = jax.jit(train_scan)
    _ = float(train_j(es)[-1])
    stages["train(25 SGD)"] = (_timed(lambda: train_j(es),
                                      lambda o: float(o[-1]), inner=4)
                               - t_dispatch / 4)

    def sense_scan(s):
        def body(env, _):
            env = exp1.env.step_vel(env, jnp.full(6, 0.01), None)
            pose, vel, force, img = exp1.env.observe(env)
            ms, _ = update_dist(exp1.model, s.params, s.mstate,
                                exp1._measured_robot_state(env)[:cfg.s_dim], img)
            return env, ms.z[0]
        env, zs = jax.lax.scan(body, s.env, None, length=S)
        return zs
    sense_j = jax.jit(sense_scan)
    _ = float(sense_j(es)[-1])
    stages["sense+reseed"] = (_timed(lambda: sense_j(es),
                                     lambda o: float(o[-1]), inner=S)
                              - t_dispatch / S)

    other = t_inline - sum(stages.values())
    print("[bench] per-stage (inline tick, production sizes):", file=sys.stderr)
    for k, v in stages.items():
        print(f"[bench]   {k:16s} {v*1e3:7.2f} ms", file=sys.stderr)
    print(f"[bench]   {'other':16s} {other*1e3:7.2f} ms", file=sys.stderr)


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--mesh", type=int, default=0, metavar="N",
                    help="additionally measure the headline chunk with an "
                         "N-device mesh (N=1 on the single real chip)")
    ap.add_argument("--skip-stages", action="store_true",
                    help="skip the per-stage breakdown (faster re-runs)")
    ap.add_argument("--host-loop", action="store_true",
                    help="additionally measure the deployment-shape rate: "
                         "HostLoopRunner driving a RobotBridge on the arm "
                         "backend (per-step dispatches + robustness layer)")
    ap.add_argument("--selfcheck", action="store_true",
                    help="pre-flight: run the FULL bench path (probe, "
                         "dispatch calibration, inline+headline chunks, "
                         "stage breakdown, JSON line) at toy sizes so a "
                         "breakage is caught in-round, not by the driver "
                         "(~2 min CPU; 2-4 min over the TPU tunnel, wall "
                         "dominated by dispatch overhead + compiles, not "
                         "compute); accepts any backend (runnable on CPU) "
                         "and marks the JSON line selfcheck:true")
    args = ap.parse_args()

    if args.selfcheck and os.environ.get("JAX_PLATFORMS"):
        # selfcheck must be runnable without the tunnel: honor an explicit
        # JAX_PLATFORMS despite the sitecustomize plugin pin (the backend
        # is not initialized yet — only cache config has been touched)
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

    ok, attempts = _acquire_backend(allow_any_platform=args.selfcheck)
    if not ok:
        _fail_json("probe", attempts)
        return
    print(f"[bench] backend probe ok after {len(attempts)} attempt(s)",
          file=sys.stderr)
    try:
        _run_benchmarks(args)
    except Exception as e:
        # A mid-run tunnel flake must still yield the structured one-line
        # JSON; anything that is NOT a backend outage stays loud (a code
        # regression should fail the run, not hide behind "value: null").
        if not _is_backend_error(e):
            raise
        print(f"[bench] backend failed mid-run: {e}", file=sys.stderr)
        attempts.append({"t": round(time.time(), 1), "elapsed_s": 0.0,
                         "outcome": f"midrun: {str(e)[-200:]}"})
        _fail_json("measure", attempts)


def _run_benchmarks(args):
    import numpy as np
    from ealv_tpu.utils.config import ExperimentConfig
    from ealv_tpu.runtime import Experiment

    toy = args.selfcheck  # same code path, toy shapes (<30 s pre-flight)
    cfg = ExperimentConfig(
        states="xyw",
        num_target_samples=64 if toy else 2000,
        num_traj_samples=100 if toy else 3000,
        image_dim=(24, 24, 3) if toy else (180, 180, 3),
        batch_size=8 if toy else 64,
        num_learning_opt=2 if toy else 25,
    )

    t_dispatch = _dispatch_overhead()
    print(f"[bench] per-dispatch overhead: {t_dispatch*1e3:.1f} ms/call",
          file=sys.stderr)

    # ---------------- inline configuration (reference sync semantics) -----
    # phase-boundary prints double as supervisor heartbeats: each long
    # compile window starts with a line, so legit silence never spans two
    # phases and a zero-output stall really means a wedged process
    print("[bench] compiling inline tick (production sizes)...",
          file=sys.stderr)
    exp1 = Experiment(cfg, train_calls_per_tick=1, train_every=1)
    es = exp1.init(seed=0)
    warm = jax.jit(lambda s: exp1.run_chunk(s, 8))
    es, _ = warm(es)
    _ = float(es.explr_step)

    print("[bench] measuring inline chunk...", file=sys.stderr)
    t_inline, es1, _ = _measure_chunk(exp1, es, 6 if toy else 24, t_dispatch)
    inline_hz = 1.0 / t_inline

    if not args.skip_stages:
        print("[bench] compiling per-stage scans...", file=sys.stderr)
        _stage_breakdown(cfg, exp1, es, t_dispatch, t_inline,
                         K=4 if toy else 100, S=4 if toy else 100)

    # MFU of the inline tick from the analytic model-FLOP count (the axon
    # backend's cost_analysis reports only the outer module). The tick is
    # HBM-bound (xprof roofline: every top op bound-by HBM), so single-digit
    # MFU is expected — see ARCHITECTURE.md for the per-op table.
    flops_tick = _analytic_flops_per_tick(cfg)
    mfu = flops_tick / t_inline / PEAK_BF16_FLOPS
    print(f"[bench] INLINE (25 SGD every step): {t_inline*1e3:.1f} ms/step = "
          f"{inline_hz:.1f} Hz"
          + (f" | MFU ~{mfu*100:.1f}% (memory-bound: see ARCHITECTURE.md)"
             if mfu else ""),
          file=sys.stderr)

    # ---------------- headline: north-star concurrent configuration ------
    # chunk 24 (multiple of train_every): amortizes the per-dispatch tunnel
    # cost the way a deployed run does (run_experiment chunks 25-50), and
    # the residual is subtracted explicitly
    hchunk = 6 if toy else 24
    print("[bench] compiling + measuring headline chunk...", file=sys.stderr)
    exp = Experiment(cfg, train_calls_per_tick=1, train_every=3)
    es = exp.init(seed=0)
    best, es, infos = _measure_chunk(exp, es, hchunk, t_dispatch)
    hz = 1.0 / best

    sgd_per_s = hz / 3.0 * cfg.num_learning_opt  # one call per 3 steps
    losses = np.asarray(infos["loss"])
    losses = losses[losses != 0]  # skip-steps report zero metrics
    last_loss = float(losses[-1]) if losses.size else float("nan")
    cpu_4worker = 4.0 / 0.633  # perfectly-scaling 4-worker CPU extrapolation
    print(
        f"[bench] HEADLINE (train every 3rd step): {best*1e3:.1f} ms/step = "
        f"{hz:.1f} Hz | loss {last_loss:.3f} | "
        f"ergodic cost {float(infos['ergodic_cost'][-1]):.3f} | "
        f"concurrent SGD steps/s {sgd_per_s:.0f} "
        f"({sgd_per_s/cpu_4worker:.0f}x a perfectly-scaling 4-worker CPU "
        f"torch reference, {sgd_per_s/1.58:.0f}x the measured 1-core rate) | "
        f"buffer {int(es.buf.size)} | learning_ind {int(es.learning_ind)}",
        file=sys.stderr,
    )

    # ---------------- optional: mesh-parallel on the real backend ---------
    if args.mesh > 0:
        from ealv_tpu.parallel import make_mesh

        mesh = make_mesh(args.mesh)
        expm = Experiment(cfg, train_calls_per_tick=1, train_every=3,
                          mesh=mesh)
        esm = expm.init(seed=0)
        t_mesh, _, _ = _measure_chunk(expm, esm, hchunk, t_dispatch)
        print(
            f"[bench] MESH x{args.mesh} (same headline chunk, shard_map "
            f"trainer + sharded pdf over a {args.mesh}-device mesh): "
            f"{t_mesh*1e3:.1f} ms/step = {1.0/t_mesh:.1f} Hz | "
            f"mesh-wrapper overhead {1e3*(t_mesh-best):+.1f} ms/step vs "
            f"mesh=None",
            file=sys.stderr,
        )

    # ---------------- optional: host-in-the-loop deployment shape ---------
    if args.host_loop:
        import time as _time
        from ealv_tpu.hw.bridge import SyntheticBridge
        from ealv_tpu.runtime import HostLoopRunner

        cfg_h = ExperimentConfig(
            states="xyw", num_target_samples=2000, num_traj_samples=3000,
            image_dim=(180, 180, 3), batch_size=64, num_learning_opt=25,
            sim_backend="arm",
        )
        exph = Experiment(cfg_h, train_calls_per_tick=1, train_every=3)
        rates = {}
        modes = [
            ("serial   ", dict(pipeline=False)),
            ("pipelined", dict(pipeline=True, device_fast=False)),
            ("DEVICE   ", dict(pipeline=True, device_fast=True)),
        ]
        for name, kw in modes:
            esh = exph.init(seed=0)
            bridge = SyntheticBridge(exph.env, esh.env)
            runner = HostLoopRunner(exph, bridge, **kw)
            for _ in range(6):
                esh = runner.step(esh)  # warm the jitted programs
            t0 = _time.perf_counter()
            n = 30
            for _ in range(n):
                esh = runner.step(esh)
            t_host = (_time.perf_counter() - t0) / n
            rates[name.strip()] = 1.0 / t_host
            print(
                f"[bench] HOSTLOOP {name} (arm backend "
                f"through the RobotBridge + robustness layer): "
                f"{t_host*1e3:.1f} ms/step = {1.0/t_host:.1f} Hz | events "
                f"{runner.events or 'none'}",
                file=sys.stderr,
            )
        print(
            f"[bench] HOSTLOOP speedups vs serial: pipelined "
            f"{rates['pipelined']/rates['serial']:.2f}x (plan t+1 fused "
            f"into absorb t's dispatch), device-resident "
            f"{rates['DEVICE']/rates['serial']:.2f}x (whole step is one "
            f"device program, command never leaves the device; host sees "
            f"only the deferred watchdog slice)",
            file=sys.stderr,
        )

    line = {
        "metric": "explore_learn_step_rate",
        "value": round(hz, 2),
        "unit": "Hz",
        "vs_baseline": round(hz / 5.0, 2),
    }
    if toy:
        # toy-shape Hz is not comparable to the 5 Hz reference envelope
        line["vs_baseline"] = None
        line["selfcheck"] = True
    print(json.dumps(line))


def _supervise() -> int:
    """Run the bench in a MONITORED child; relaunch once on zero-output stall.

    Failure mode observed on the tunneled backend (round 5, and the class
    `scripts/resume_study.py` already guards its phases against): a fresh
    client process occasionally wedges at device acquisition — futex wait,
    ZERO output, forever — while a bounded probe from ANOTHER process
    succeeds. No in-process hardening can catch that (the wedge can happen
    before any bench code runs), so the parent here never initializes a
    backend at all: it spawns the real bench as a child, watches combined
    stdout+stderr growth, and if nothing is produced for
    EALV_BENCH_STALL_S seconds kills the child's process group and
    relaunches the whole run (EALV_BENCH_RELAUNCHES times, default 1). A
    relaunch is a fresh process, which is exactly what recovers — the
    wedge is process-local. If every launch stalls, the structured
    one-line fail JSON is emitted (stage "stall") and the exit code stays
    0, same contract as a failed probe.

    The child's stdout/stderr are forwarded verbatim (buffered through
    temp files), so the driver-facing contract — one stdout JSON line,
    log on stderr — is unchanged.
    """
    import signal
    import tempfile

    stall = float(os.environ.get("EALV_BENCH_STALL_S", "600"))
    relaunches = int(os.environ.get("EALV_BENCH_RELAUNCHES", "1"))
    ledger = []
    for attempt in range(relaunches + 1):
        # the LAST launch gets a doubled window: if the box is merely
        # slow/contended (not wedged), give it every chance to finish
        # before burning the artifact on a stall verdict
        cur_stall = stall * (2 if attempt == relaunches else 1)
        t0 = time.time()
        out_f = tempfile.NamedTemporaryFile(
            mode="w+", prefix="bench_sup_out_", suffix=".log", delete=False)
        err_f = tempfile.NamedTemporaryFile(
            mode="w+", prefix="bench_sup_err_", suffix=".log", delete=False)
        env = dict(os.environ, EALV_BENCH_SUPERVISED="1")
        child = subprocess.Popen(
            [sys.executable, "-u", os.path.abspath(__file__)]
            + sys.argv[1:],
            stdout=out_f, stderr=err_f, env=env, start_new_session=True)
        last_size, last_growth = 0, time.time()
        stalled = False
        while True:
            rc = child.poll()
            size = (os.path.getsize(out_f.name)
                    + os.path.getsize(err_f.name))
            if size > last_size:
                last_size, last_growth = size, time.time()
            if rc is not None:
                break
            if time.time() - last_growth > cur_stall:
                stalled = True
                try:
                    os.killpg(child.pid, signal.SIGKILL)
                except (ProcessLookupError, PermissionError):
                    pass
                # bounded reap: a child wedged in an uninterruptible
                # device syscall survives even SIGKILL until the syscall
                # returns — do not block on it (the bug subprocess.run's
                # kill-then-communicate has); abandon the zombie instead
                try:
                    child.wait(timeout=10)
                except subprocess.TimeoutExpired:
                    pass
                break
            time.sleep(1.0)
        try:
            with open(err_f.name) as f:
                sys.stderr.write(f.read())
            sys.stderr.flush()
            if not stalled:
                with open(out_f.name) as f:
                    sys.stdout.write(f.read())
                sys.stdout.flush()
                return child.returncode
        finally:
            for tmp in (out_f, err_f):
                tmp.close()
                try:
                    os.unlink(tmp.name)
                except OSError:
                    pass
        ledger.append({"t": round(t0, 1),
                       "elapsed_s": round(time.time() - t0, 1),
                       "outcome": f"stalled: no output for {cur_stall:g}s"})
        print(f"[bench] supervisor: child produced no output for "
              f"{cur_stall:g}s (launch {attempt + 1}/{relaunches + 1}) — "
              f"killed its process group; "
              + ("relaunching fresh" if attempt < relaunches
                 else "out of relaunches"),
              file=sys.stderr)
    _fail_json("stall", ledger)
    return 0


if __name__ == "__main__":
    if os.environ.get("EALV_BENCH_SUPERVISED"):
        main()
    else:
        sys.exit(_supervise())
