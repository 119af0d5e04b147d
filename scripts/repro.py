#!/usr/bin/env python
"""One-command regeneration of every published PARITY/README table.

Each table name maps to a pinned-seed invocation; outputs (stdout log +
generated artifacts) land under ``runs/repro/<table>/``. Regenerate one
table or all of them:

    python scripts/repro.py --list          # what exists, what it pins
    python scripts/repro.py matrix          # PARITY section 5 (300-step)
    python scripts/repro.py planner         # PARITY section 2 (torch + ealv)
    python scripts/repro.py all

Provenance map (table -> published number):
  planner     PARITY section 2   seeds-matched planner behavior study
  matrix      PARITY section 5   fingerprint method matrix, 300-step table
  matrix1000  PARITY section 5   reference-length (1000-step) replication
  k3 / k4     PARITY section 6   multi-object studies (fixed-seek parity)
  k3-active   PARITY section 6   K=3 with --seek-mode uncertain (active
                                 re-localization of the least-certain object)
  k3-raw      PARITY section 6   K=3 with --target-sharpness 1 (the
                                 reference's raw target-blind belief)
  k3-study    PARITY section 6   3-seed x 3-mode (raw/fixed/active)
                                 aggregate study (scripts/k3_study.py)
  arm         PARITY section 7   arm-backend flagship study, seeds 0/1/2
  force       PARITY section 4   force-learning end-to-end study
  bench       README headline    explore+learn step rate (bench.py)
  soak        PARITY section 8   reference-length 3000-step run
                                 (scripts/run_experiment.py --post-train)

The heavy studies need the TPU chip; on a CPU-only box pass --small where
supported (the table values themselves were measured on the chip).
"""

import argparse
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
PY = sys.executable


def _sub(script, *args):
    return [PY, os.path.join(REPO, "scripts", script), *map(str, args)]


TABLES = {
    "matrix": {
        "doc": "PARITY 5: method matrix, 600 learn / 300 id steps, seed 0",
        "cmd": _sub("run_fingerprint_matrix.py", "--learn-steps", 600,
                    "--id-steps", 300, "--seed", 0),
        "out": True,
        "small_ok": True,
    },
    "matrix1000": {
        "doc": "PARITY 5: reference-length 1000-step identification, seed 0",
        "cmd": _sub("run_fingerprint_matrix.py", "--learn-steps", 600,
                    "--id-steps", 1000, "--seed", 0),
        "out": True,
        "small_ok": True,
    },
    "k3": {
        "doc": "PARITY 6: K=3 multi-object, 800 learn / 500 id, seed 0",
        "cmd": _sub("run_fingerprint_matrix.py", "--objects", 3,
                    "--learn-steps", 800, "--id-steps", 500, "--seed", 0),
        "out": True,
        "small_ok": True,
    },
    "k3-active": {
        "doc": "PARITY 6: K=3 with uncertainty-targeted re-localization",
        "cmd": _sub("run_fingerprint_matrix.py", "--objects", 3,
                    "--learn-steps", 800, "--id-steps", 500, "--seed", 0,
                    "--seek-mode", "uncertain"),
        "out": True,
        "small_ok": True,
    },
    "k3-raw": {
        "doc": "PARITY 6: K=3 with the reference's raw (unsharpened) belief "
               "target — the target-blind baseline both stacks share",
        "cmd": _sub("run_fingerprint_matrix.py", "--objects", 3,
                    "--learn-steps", 800, "--id-steps", 500, "--seed", 0,
                    "--target-sharpness", 1.0),
        "out": True,
        "small_ok": True,
    },
    "k3-study": {
        "doc": "PARITY 6: 3-seed x 3-mode (raw/fixed/active) K=3 "
               "aggregate study; writes summary.md/json",
        "cmd": _sub("k3_study.py"),
        "out": True,
        "small_ok": True,
    },
    "k4": {
        "doc": "PARITY 6: K=4 multi-object, 800 learn / 500 id, seed 0",
        "cmd": _sub("run_fingerprint_matrix.py", "--objects", 4,
                    "--learn-steps", 800, "--id-steps", 500, "--seed", 0),
        "out": True,
        "small_ok": True,
    },
    "force": {
        "doc": "PARITY 4: force-learning end-to-end, 1200 steps, seed 0",
        "cmd": _sub("force_study.py", "--steps", 1200, "--seed", 0),
    },
    "force-dynamic": {
        "doc": "PARITY 4: force learning on the penalty-contact arm plant "
               "(contact force from simulated mechanics, franka_env.py "
               ":268-284 parity), 1200 steps, seed 0",
        "cmd": _sub("force_study.py", "--steps", 1200, "--seed", 0,
                    "--backend", "arm-dynamic"),
    },
    "force-soft": {
        "doc": "PARITY 4: force learning on the soft-object arm plant "
               "(compliant saturating contact, the loadSoftBody variant "
               "franka_env.py:160-162), 1200 steps, seed 0",
        "cmd": _sub("force_study.py", "--steps", 1200, "--seed", 0,
                    "--backend", "arm-dynamic-soft"),
    },
    "resume": {
        "doc": "SURVEY 5 beat: SIGKILL the flagship arm run mid-exploration, "
               "--resume from the pytree checkpoint, assert the continuation "
               "is bit-identical to an uninterrupted control run",
        "cmd": _sub("resume_study.py", "--backend", "arm", "--steps", 200,
                    "--save-rate", 50),
    },
    "bench": {
        "doc": "README headline: explore+learn step rate + inline breakdown",
        "cmd": [PY, os.path.join(REPO, "bench.py")],
    },
    "soak": {
        "doc": "reference-length soak: 3000 steps + clustering + post-train "
               "+ periodic checkpoints on the arm backend",
        "cmd": _sub("run_experiment.py", "--steps", 3000, "--seed", 0,
                    "--backend", "arm", "--post-train", "--save-rate", 500,
                    "--cluster-every", 200, "--dash-every", 500),
        "out": True,
        "small_ok": True,
    },
}
# arm flagship study: three pinned seeds (PARITY 7 rows)
for s in (0, 1, 2):
    TABLES[f"arm-s{s}"] = {
        "doc": f"PARITY 7: arm-backend flagship study, seed {s}",
        "cmd": _sub("run_fingerprint_matrix.py", "--objects", 2,
                    "--backend", "arm", "--host-loop",
                    "--learn-steps", 800, "--id-steps", 1000, "--seed", s),
        "out": True,
        "small_ok": True,
    }


def planner_study(seeds=tuple(range(10)), steps=300, out_dir=None,
                  run_torch=True):
    """PARITY section 2: the reference's own demo spec (klerg.py:754-843)
    run seeds-matched through BOTH planners — states 'xyXY', Gaussian
    target (-0.8, 0) with x-var 0.06, horizon 10, R=0.05, 1500 target x
    1000 traj samples — and summarized with the coverage metrics of the
    published table (late-x mean, frac(x<0), y-std, steps/s)."""
    import numpy as np

    def metrics(path, dt_wall, n):
        late = path[n // 2:]
        return {
            "late_x": float(late[:, 0].mean()),
            "frac_x_neg": float((path[:, 0] < 0).mean()),
            "y_std": float(path[:, 1].std()),
            "steps_per_s": n / dt_wall,
        }

    rows = []

    # ---- ealv planner ----
    import jax
    import jax.numpy as jnp
    from ealv_tpu.control import (KlergConfig, KlergPlanner, make_dynamics,
                                  make_policy, setup_barrier, gaussian_dist)

    states = "xyXY"
    dyn = make_dynamics("xy", dt=0.1)
    policy = make_policy("Roll", dyn, 10)
    cfg = KlergConfig(horizon=10, num_target_samples=1500,
                      num_traj_samples=1000, R=0.05)
    planner = KlergPlanner(cfg, dyn, policy,
                           lambda ctx, samples: ctx.pdf(samples), states,
                           explr_locs=list(range(4)))
    robot_lim = jnp.array([[-1.0, 1.0]] * 2 + [[-1.5, 1.5]] * 2)
    barrier, _ = setup_barrier("xy", robot_lim[:2],
                               jnp.array([[-1.5, 1.5]] * 2), [0, 1],
                               barr_weight=5.0)
    target = gaussian_dist(jnp.array([-0.8, 0.0, 0.9, 0.0]),
                           jnp.array([0.06, 1.0, 0.5, 1.0]))
    step = jax.jit(lambda ps: planner.step(ps, target, save_update=True))
    for seed in seeds:
        np.random.seed(seed)
        x0 = jnp.array([0.5, -0.5, 0.0, 0.0])
        # seed=seed: the planner PRNG must vary per row (round-5 fix — the
        # earlier study left init_state at seed=0, collapsing the ealv rows
        # to one deterministic run)
        ps = planner.init_state(x0, robot_lim, barrier,
                                buffer_capacity=2000, explr_lim_scale=1.15,
                                seed=seed)
        ps, *_ = step(ps)  # warm the compile out of the timing
        ps = planner.init_state(x0, robot_lim, barrier,
                                buffer_capacity=2000, explr_lim_scale=1.15,
                                seed=seed)
        path = []
        t0 = time.perf_counter()
        for _ in range(steps):
            ps, state, vel, ctrl, info = step(ps)
            path.append(np.asarray(state))
        wall = time.perf_counter() - t0
        rows.append(("ealv", seed, metrics(np.array(path), wall, steps)))

    # ---- torch reference planner (API use on the mounted reference) ----
    if run_torch:
        ref = "/root/reference/franka_test/scripts"
        if os.path.isdir(ref):
            if ref not in sys.path:
                sys.path.insert(0, ref)
            np.product = np.prod  # removed numpy alias the reference uses
            import types
            for mod in ("numa", "faster_fifo", "rospy", "pyqtgraph"):
                sys.modules.setdefault(mod, types.ModuleType(mod))
            import torch
            from control_torch.klerg import Robot, dummyTestDist

            for seed in seeds:
                torch.manual_seed(seed)
                np.random.seed(seed)
                tgt = dummyTestDist(
                    torch.FloatTensor([-0.8, 0.0, 0.9, 0.0]),
                    torch.diag(torch.FloatTensor([0.06, 1.0, 0.5, 1.0])))
                robot = Robot(
                    x0=np.array([0.5, -0.5, 0.0, 0.0]),
                    robot_lim=np.array([[-1.0, 1.0]] * 2 + [[-1.5, 1.5]] * 2),
                    robot_ctrl_lim=np.array([[-1.5, 1.5]] * 2),
                    explr_idx=np.arange(4), horizon=10, states=states,
                    buffer_capacity=10000, R=0.05, target_dist=tgt,
                    vel_states=True, explr_robot_lim_scale=1.15)
                robot.test()
                path = []
                t0 = time.perf_counter()
                for _ in range(steps):
                    state, vel, cmd = robot.step(
                        num_target_samples=1500, num_traj_samples=1000,
                        save_update=True)
                    path.append(np.asarray(state))
                wall = time.perf_counter() - t0
                rows.append(("torch", seed,
                             metrics(np.array(path), wall, steps)))
        else:
            print("[repro] /root/reference not mounted; torch rows skipped")

    lines = ["| seed | impl | late-x mean | frac(x<0) | y-std | steps/s |",
             "|---|---|---|---|---|---|"]
    for impl, seed, m in sorted(rows, key=lambda r: (r[1], r[0])):
        lines.append(f"| {seed} | {impl} | {m['late_x']:.3f} | "
                     f"{m['frac_x_neg']:.2f} | {m['y_std']:.2f} | "
                     f"{m['steps_per_s']:.1f} |")
    # per-implementation aggregate row (the spread claim's actual evidence)
    for impl in ("ealv", "torch"):
        ms = [m for i, _, m in rows if i == impl]
        if not ms:
            continue
        lx = np.array([m["late_x"] for m in ms])
        fx = np.array([m["frac_x_neg"] for m in ms])
        ys = np.array([m["y_std"] for m in ms])
        lines.append(
            f"| mean±std ({len(ms)} seeds) | {impl} | "
            f"{lx.mean():.3f}±{lx.std():.3f} | {fx.mean():.2f}±{fx.std():.2f} "
            f"| {ys.mean():.2f}±{ys.std():.2f} | |")
    table = "\n".join(lines)
    print(table)
    if out_dir:
        with open(os.path.join(out_dir, "planner_table.md"), "w") as f:
            f.write(table + "\n")
    return rows


def _probe_backend() -> bool:
    """Bounded-retry probe of the TPU backend before launching any study
    (they hang indefinitely on a dead tunnel otherwise — the BENCH_r03
    failure mode). Reuses bench._acquire_backend so there is exactly ONE
    probe methodology in the repo: same retries/backoff knobs, and the
    same wrong-platform rejection (a CPU-fallback jax.devices() success
    must not let a 'TPU study' silently run on CPU). Skipped when the
    caller already pinned a platform."""
    if os.environ.get("JAX_PLATFORMS"):
        return True
    sys.path.insert(0, REPO)
    from bench import _acquire_backend
    ok, _attempts = _acquire_backend()
    return ok


def run_table(name: str, small: bool = False) -> int:
    out_dir = os.path.join(REPO, "runs", "repro", name)
    os.makedirs(out_dir, exist_ok=True)
    if name == "planner":
        planner_study(out_dir=out_dir)
        return 0
    spec = TABLES[name]
    cmd = list(spec["cmd"])
    if spec.get("out"):
        cmd += ["--out", out_dir]
    if small:
        if not spec.get("small_ok"):
            print(f"[repro] {name}: no --small variant; running at the "
                  f"pinned (published) shapes", file=sys.stderr)
        else:
            cmd += ["--small"]
    print(f"[repro] {name}: {' '.join(cmd)}", flush=True)
    log = os.path.join(out_dir, "log.txt")
    with open(log, "w") as f:
        p = subprocess.Popen(cmd, stdout=subprocess.PIPE,
                             stderr=subprocess.STDOUT, text=True, cwd=REPO)
        for line in p.stdout:
            sys.stdout.write(line)
            f.write(line)
        p.wait()
    print(f"[repro] {name}: rc={p.returncode}, log -> {log}")
    return p.returncode


def main():
    ap = argparse.ArgumentParser(
        description="regenerate published PARITY/README tables")
    ap.add_argument("tables", nargs="*",
                    help="table name(s), or 'all' (see --list)")
    ap.add_argument("--list", action="store_true")
    ap.add_argument("--small", action="store_true",
                    help="pass --small to the studies that support it "
                         "(CPU-friendly shapes; values will differ from "
                         "the published chip-measured tables)")
    args = ap.parse_args()

    names = ["planner"] + list(TABLES)
    if args.list or not args.tables:
        print("available tables:")
        print(f"  {'planner':12s} PARITY 2: seeds-matched planner study "
              f"(torch + ealv)")
        for n, spec in TABLES.items():
            print(f"  {n:12s} {spec['doc']}")
        return
    chosen = names if args.tables == ["all"] else args.tables
    for n in chosen:
        if n not in names:
            ap.error(f"unknown table {n!r}; --list shows the registry")
    if not _probe_backend():
        print("[repro] jax backend unreachable (TPU tunnel down?) — "
              "aborting before any study hangs; pin JAX_PLATFORMS=cpu to "
              "force CPU shapes", file=sys.stderr)
        sys.exit(2)
    rc = 0
    for n in chosen:
        rc |= run_table(n, small=args.small)
    sys.exit(rc)


if __name__ == "__main__":
    main()
