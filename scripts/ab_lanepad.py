#!/usr/bin/env python
"""In-context A/B of lane-packed conv layouts (VERDICT r4 #3).

The roofline (ARCHITECTURE §7) attributes the trainer call's remaining
1.9x-of-HBM-floor gap to the reference model's 3/10/10/20-channel convs
occupying a fraction of the 128-wide vector lanes (achieved BW 160-460
GB/s vs ~850 at the well-shaped ops). ``lane_pad=N`` computes every conv
on channel dims zero-padded to a multiple of N — identical parameters and
math (equivalence: tests/test_cvae.py::TestLanePad) — so this measures
whether an explicitly padded layout buys a faster XLA lowering than the
implicit padding the hardware does anyway, against the extra HBM bytes
the padded activations cost.

Measures the INLINE tick (25 SGD steps every step, production sizes) with
the bench methodology: chained steps in one device program, dispatch
overhead subtracted. In-context only (ARCHITECTURE §4: isolated scan A/Bs
hoist operand transforms).

    python scripts/ab_lanepad.py              # 0 vs 8 vs 32
    python scripts/ab_lanepad.py --lanes 0 16 64
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--lanes", type=int, nargs="+", default=[0, 8, 32])
    ap.add_argument("--chunk", type=int, default=24)
    args = ap.parse_args()

    from ealv_tpu.utils.config import ExperimentConfig
    from ealv_tpu.runtime import Experiment
    from bench import _dispatch_overhead, _measure_chunk

    t_disp = _dispatch_overhead()
    print(f"[ab] dispatch overhead {t_disp*1e3:.1f} ms", file=sys.stderr)

    results = {}
    for lane in args.lanes:
        cfg = ExperimentConfig(
            states="xyw", num_target_samples=2000, num_traj_samples=3000,
            image_dim=(180, 180, 3), batch_size=64, num_learning_opt=25,
            lane_pad=lane,
        )
        exp = Experiment(cfg, train_calls_per_tick=1, train_every=1)
        es = exp.init(seed=0)
        t, _es, _infos = _measure_chunk(exp, es, args.chunk, t_disp)
        results[lane] = t
        print(f"[ab] lane_pad={lane:<3d} inline tick {t*1e3:.2f} ms/step "
              f"({1.0/t:.1f} Hz)", file=sys.stderr)

    base = results.get(0)
    for lane, t in results.items():
        if lane and base:
            print(f"[ab] lane_pad={lane} vs native: {1e3*(t-base):+.2f} "
                  f"ms/step ({'WIN' if t < base else 'LOSS'})")


if __name__ == "__main__":
    main()
