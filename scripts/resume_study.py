#!/usr/bin/env python
"""Mid-run kill/resume study: SIGKILL an exploration run, resume it, and
assert the continuation is bit-identical to an uninterrupted control run.

The property being demonstrated (SURVEY.md §5; VERDICT r4 #6): the WHOLE
ExperimentState — params, optimizer, replay ring, planner, env, schedules,
RNG — checkpoints atomically (runtime/checkpoint.py), so `kill -9` at an
arbitrary step loses nothing past the last checkpoint and the resumed fused
path replays the remaining chunks EXACTLY (state -> state determinism; all
randomness lives in es.key). The reference cannot do this: its snapshots
are model+optimizer only (trainer_module.py:613-672), so a killed
exploration run restarts from scratch.

Protocol
  A (control)    : run_experiment.py --steps S, straight through.
  B (interrupted): same command, SIGKILL'd once log.txt shows a progress
                   line at step >= --kill-step; then re-run with --resume
                   (picks up the latest checkpoint).
  Assert         : every leaf of the two final checkpoints is bit-equal
                   (params, optimizer, replay ring, planner, env, RNG —
                   which pins the learning curve and everything after it).

Checkpoint cadence and the kill point must respect chunk alignment
(--save-rate a multiple of --chunk) so A and B execute identical chunk
sequences from the resume step onward — the same alignment a production
deployment gets by checkpointing between fused chunks.

Usage:
  python scripts/resume_study.py --small --steps 100        # quick (CPU ok)
  python scripts/resume_study.py --backend arm --steps 200  # flagship arm
"""

import argparse
import os
import shutil
import signal
import subprocess
import sys
import time

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
PY = sys.executable
RUN = os.path.join(REPO, "scripts", "run_experiment.py")


def _run_dir(out, method, seed):
    return os.path.join(out, "synth", f"{method}_{seed:04d}")


def _progress_step(log_path):
    """Largest explr step in the run log's progress lines."""
    best = -1
    if not os.path.exists(log_path):
        return best
    with open(log_path) as f:
        for line in f:
            parts = line.split()
            if len(parts) >= 4 and parts[0].isdigit() and "|" in line:
                best = max(best, int(parts[0]))
    return best


def launch(cmd, log_path, kill_at=None, timeout=3600, stall=900,
           retries=2, reset_dir=None):
    """Run one experiment subprocess; optionally SIGKILL it at a step.

    Stall watchdog: the tunneled TPU backend occasionally wedges a fresh
    client at device acquisition (the process futex-waits forever with no
    log output; observed round 5, twice). A healthy run emits its first
    progress line within ~12 min (one cold remote compile); if the log
    step doesn't advance for `stall` seconds the child is killed and the
    phase relaunched (up to `retries` times). `reset_dir` is wiped before
    a relaunch UNLESS the command resumes from a checkpoint — a fresh
    non-resume run must not inherit a half-written run dir.
    """
    for attempt in range(retries + 1):
        outcome = _launch_once(cmd, log_path, kill_at, timeout, stall)
        if outcome != "stalled":
            return outcome
        print(f"      backend stall (no log progress in {stall}s) — "
              f"retry {attempt + 1}/{retries}")
        if reset_dir and "--resume" not in cmd:
            shutil.rmtree(reset_dir, ignore_errors=True)
    raise RuntimeError(f"stalled {retries + 1} times: {' '.join(cmd)}")


def _launch_once(cmd, log_path, kill_at, timeout, stall):
    proc = subprocess.Popen(cmd, cwd=REPO, stdout=subprocess.DEVNULL,
                            stderr=subprocess.STDOUT)
    t0 = time.time()
    last_step, last_advance = -2, time.time()
    try:
        while proc.poll() is None:
            step = _progress_step(log_path)
            if step > last_step:
                last_step, last_advance = step, time.time()
            if kill_at is not None and step >= kill_at:
                proc.send_signal(signal.SIGKILL)  # no cleanup, no flush
                proc.wait()
                return "killed"
            if time.time() - last_advance > stall:
                proc.kill()
                proc.wait()
                return "stalled"
            if time.time() - t0 > timeout:
                raise RuntimeError(f"timed out: {' '.join(cmd)}")
            time.sleep(0.5)
        if kill_at is not None:
            raise RuntimeError(
                f"run finished (rc={proc.returncode}) before reaching the "
                f"kill step {kill_at} — raise --steps or lower --kill-step")
        if proc.returncode != 0:
            raise RuntimeError(
                f"run failed rc={proc.returncode}: {' '.join(cmd)}")
        return "completed"
    finally:
        if proc.poll() is None:
            proc.kill()


def compare_final(dir_a, dir_b):
    """Bit-compare the final step checkpoints of two run dirs."""
    import numpy as np
    import jax

    sys.path.insert(0, REPO)
    from ealv_tpu.runtime.checkpoint import latest_checkpoint

    import orbax.checkpoint as ocp

    ck_a = latest_checkpoint(os.path.join(dir_a, "checkpoints"))
    ck_b = latest_checkpoint(os.path.join(dir_b, "checkpoints"))
    print(f"control  final: {ck_a}\nresumed  final: {ck_b}")
    if os.path.basename(ck_a) != os.path.basename(ck_b):
        raise SystemExit(f"FINAL STEPS DIFFER: {ck_a} vs {ck_b}")

    with ocp.StandardCheckpointer() as ckptr:
        meta = ckptr.metadata(ck_a).item_metadata
        abstract = jax.tree.map(
            lambda m: jax.ShapeDtypeStruct(m.shape, m.dtype), meta.tree)
        tree_a = ckptr.restore(ck_a, abstract)
        tree_b = ckptr.restore(ck_b, abstract)

    leaves_a, treedef = jax.tree.flatten(tree_a)
    leaves_b = jax.tree.leaves(tree_b)
    paths = [jax.tree_util.keystr(p)
             for p, _ in jax.tree_util.tree_flatten_with_path(tree_a)[0]]
    bad = []
    for path, a, b in zip(paths, leaves_a, leaves_b):
        if not np.array_equal(np.asarray(a), np.asarray(b), equal_nan=True):
            d = float(np.max(np.abs(np.asarray(a, np.float64)
                                    - np.asarray(b, np.float64))))
            bad.append((path, d))
    print(f"compared {len(leaves_a)} leaves")
    if bad:
        for path, d in bad[:20]:
            print(f"  MISMATCH {path}: max|delta|={d:.3e}")
        raise SystemExit(f"{len(bad)} leaves differ — resume is NOT "
                         "bit-identical")
    print("ALL LEAVES BIT-IDENTICAL: kill -9 + --resume reproduced the "
          "uninterrupted run exactly")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--method", default="entklerg")
    ap.add_argument("--backend", default=None, choices=["free", "arm"])
    ap.add_argument("--steps", type=int, default=200)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--chunk", type=int, default=25)
    ap.add_argument("--save-rate", type=int, default=50,
                    help="checkpoint cadence (multiple of --chunk)")
    ap.add_argument("--kill-step", type=int, default=None,
                    help="SIGKILL once the log shows this step "
                         "(default: ~40%% of --steps, past >=1 checkpoint)")
    ap.add_argument("--small", action="store_true")
    ap.add_argument("--out", default=os.path.join(REPO, "runs", "resume_study"))
    ap.add_argument("--keep", action="store_true",
                    help="keep the run dirs (several GB at flagship size)")
    ap.add_argument("--reuse-control", action="store_true",
                    help="skip the control run if a completed one (log "
                         "progress at --steps) already sits in --out")
    args = ap.parse_args()

    if args.save_rate % args.chunk:
        raise SystemExit("--save-rate must be a multiple of --chunk "
                         "(checkpoints land between fused chunks)")
    kill_at = args.kill_step or max(args.save_rate,
                                    (args.steps * 2 // 5) // args.chunk
                                    * args.chunk)

    base = [PY, RUN, "--method", args.method, "--steps", str(args.steps),
            "--seed", str(args.seed), "--chunk", str(args.chunk),
            "--save-rate", str(args.save_rate)]
    if args.backend:
        base += ["--backend", args.backend]
    if args.small:
        base += ["--small"]

    out_a = os.path.join(args.out, "control")
    out_b = os.path.join(args.out, "interrupted")
    dir_a = _run_dir(out_a, args.method, args.seed)
    dir_b = _run_dir(out_b, args.method, args.seed)

    reuse = (args.reuse_control
             and _progress_step(os.path.join(dir_a, "log.txt")) >= args.steps)
    shutil.rmtree(out_b, ignore_errors=True)
    if not reuse:
        shutil.rmtree(out_a, ignore_errors=True)

    if reuse:
        print(f"[1/3] control run: reusing completed run in {dir_a}")
    else:
        print(f"[1/3] control run: {args.steps} steps")
        launch(base + ["--out", out_a], os.path.join(dir_a, "log.txt"),
               reset_dir=out_a)

    print(f"[2/3] interrupted run: SIGKILL at step >= {kill_at}")
    state = launch(base + ["--out", out_b], os.path.join(dir_b, "log.txt"),
                   kill_at=kill_at, reset_dir=out_b)
    print(f"      {state} at step ~{_progress_step(os.path.join(dir_b, 'log.txt'))}; resuming")
    launch(base + ["--out", out_b, "--resume"],
           os.path.join(dir_b, "log.txt"))

    print("[3/3] comparing final checkpoints")
    compare_final(dir_a, dir_b)
    if not args.keep:
        shutil.rmtree(args.out, ignore_errors=True)


if __name__ == "__main__":
    main()
