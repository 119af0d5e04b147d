#!/usr/bin/env python
"""In-context A/B of the encoder weight-gradient schedules (VERDICT r3 #3).

Measures the INLINE tick (25 SGD steps every step, production sizes) with
each `fast_encoder_grads` variant, using the bench methodology: chained
steps in one device program, dispatch overhead measured with a near-empty
program and subtracted. The in-context number is the only one that counts
(ARCHITECTURE §4: isolated scan A/Bs hoist operand transforms).

    python scripts/ab_wgrad.py            # xla vs pallas
    python scripts/ab_wgrad.py --all      # xla vs s2d vs im2col vs pallas
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
    ap.add_argument("--all", action="store_true")
    ap.add_argument("--chunk", type=int, default=24)
    args = ap.parse_args()

    from ealv_tpu.utils.config import ExperimentConfig
    from ealv_tpu.runtime import Experiment
    # bench.py IS the benchmark methodology — import it rather than keep a
    # second copy that can drift (the published numbers and these A/Bs must
    # share the dispatch-subtraction convention to be comparable)
    from bench import _dispatch_overhead, _measure_chunk

    t_disp = _dispatch_overhead()
    print(f"[ab] dispatch overhead {t_disp*1e3:.1f} ms", file=sys.stderr)

    variants = [False, "pallas"] if not args.all else [
        False, "s2d", "im2col", "pallas"]
    results = {}
    for variant in variants:
        cfg = ExperimentConfig(
            states="xyw", num_target_samples=2000, num_traj_samples=3000,
            image_dim=(180, 180, 3), batch_size=64, num_learning_opt=25,
            fast_encoder_grads=variant,
        )
        exp = Experiment(cfg, train_calls_per_tick=1, train_every=1)
        es = exp.init(seed=0)
        t, _es, _infos = _measure_chunk(exp, es, args.chunk, t_disp)
        name = variant if isinstance(variant, str) else "xla"
        results[name] = t
        print(f"[ab] {name:8s} inline tick {t*1e3:.2f} ms/step "
              f"({1.0/t:.1f} Hz)", file=sys.stderr)

    base = results["xla"]
    for name, t in results.items():
        if name != "xla":
            print(f"[ab] {name} vs xla: {1e3*(t-base):+.2f} ms/step "
                  f"({'WIN' if t < base else 'LOSS'})")


if __name__ == "__main__":
    main()
