"""Flagship benchmark: full explore+learn tick rate on one TPU chip.

Measures the complete online-learning step at reference production sizes —
KL-ergodic plan (2000 target samples x 3000 traj points, CVAE-uncertainty
target), synthetic-camera sense (180x180x3), replay push, model reseed,
entropy hyperparams, and one 25-step batch-64 trainer call — i.e. the work
the reference spreads over its 7-process CPU deployment, serialized into one
jitted device program per tick.

Baseline: the reference's hardware control loop runs at 5 Hz (dt=0.2,
launch/run.launch:8) with learning throttled to <=3 trainer calls per step
on 4 CPU DDP workers. ``vs_baseline`` = our explore+learn Hz / 5.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import sys
import time

import jax


def main():
    from ealv_tpu.utils.config import ExperimentConfig
    from ealv_tpu.runtime import Experiment

    cfg = ExperimentConfig(
        states="xyw",
        num_target_samples=2000,
        num_traj_samples=3000,
        image_dim=(180, 180, 3),
        batch_size=64,
        num_learning_opt=25,
    )
    exp = Experiment(cfg, train_calls_per_tick=1)
    es = exp.init(seed=0)
    tick = jax.jit(exp.tick)

    t0 = time.perf_counter()
    es, info = tick(es)
    jax.block_until_ready(info["loss"])
    compile_s = time.perf_counter() - t0
    print(f"[bench] compile: {compile_s:.1f}s on {jax.devices()[0]}", file=sys.stderr)

    n = 15
    t0 = time.perf_counter()
    for _ in range(n):
        es, info = tick(es)
    jax.block_until_ready(info["loss"])
    dt = (time.perf_counter() - t0) / n
    hz = 1.0 / dt

    print(
        f"[bench] tick {dt*1e3:.1f} ms | loss {float(info['loss']):.3f} | "
        f"ergodic cost {float(info['ergodic_cost']):.3f} | "
        f"buffer {int(es.buf.size)} | learning_ind {int(es.learning_ind)}",
        file=sys.stderr,
    )
    print(json.dumps({
        "metric": "explore_learn_step_rate",
        "value": round(hz, 2),
        "unit": "Hz",
        "vs_baseline": round(hz / 5.0, 2),
    }))


if __name__ == "__main__":
    main()
