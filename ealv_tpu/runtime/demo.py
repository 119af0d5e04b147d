"""Two-minute demo: explore + learn on the synthetic scene, one program.

    python -m ealv_tpu.runtime.demo [--steps N] [--backend free|arm]

Runs the flagship `Experiment` at small sizes (the `--small` preset of
scripts/run_experiment.py) as fused scan chunks and prints the learning
curve plus the achieved step rate.  This is the minimal end-to-end slice
of the reference's `run.launch` flow (SURVEY.md §3.1) — the full CLI with
checkpoints, dashboards, clustering, and host-loop deployment lives in
scripts/run_experiment.py.
"""

from __future__ import annotations

import argparse
import time


def main(argv=None) -> None:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--steps", type=int, default=120)
    ap.add_argument("--chunk", type=int, default=40, help="steps per fused scan")
    ap.add_argument("--backend", choices=["free", "arm"], default="free")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)

    import jax

    from ..utils.config import ExperimentConfig
    from .agent import Experiment

    cfg = ExperimentConfig(
        explr_method="entklerg", states="xyw", num_steps=args.steps,
        seed=args.seed, sim_backend=args.backend,
        image_dim=(48, 48, 3), cnn_kernels=(3, 3), cnn_strides=(2, 2),
        cnn_channels=(10, 10), hidden_dim=(256, 128), z_dim=12,
        num_target_samples=512, num_traj_samples=512,
        traj_buffer_capacity=1024, buffer_capacity=1024, batch_size=32,
        num_learning_opt=10,
    )
    exp = Experiment(cfg, train_calls_per_tick=1)
    es = exp.init(seed=args.seed)
    run = jax.jit(lambda s: exp.run_chunk(s, args.chunk))

    print(f"[demo] backend={args.backend} states={cfg.states} "
          f"steps={args.steps} (chunks of {args.chunk}) on {jax.devices()[0]}")
    print("[demo] compiling first chunk (20-40 s on a cold TPU cache)...")
    done, t_total = 0, 0.0
    while done < args.steps:
        t0 = time.perf_counter()
        es, infos = jax.block_until_ready(run(es))
        dt = time.perf_counter() - t0
        done += args.chunk
        if done > args.chunk:  # exclude the compile chunk from the rate
            t_total += dt
        loss = float(infos["loss"][-1])
        erg = float(infos["ergodic_cost"][-1])
        print(f"[demo] step {done:4d}  loss {loss:+8.3f}  ergodic {erg:6.3f}"
              f"  ({args.chunk / dt:5.1f} Hz)")
    if done > args.chunk and t_total > 0:
        rate = (done - args.chunk) / t_total
        print(f"[demo] steady-state: {rate:.1f} explore+learn steps/s "
              f"(reference hardware loop: 5 Hz)")
    print("[demo] done. Next: scripts/run_experiment.py (full CLI), "
          "scripts/run_fingerprint_matrix.py (fingerprint pipeline).")


if __name__ == "__main__":
    main()
