"""Script-level smoke test: scripts/run_experiment.py end-to-end (the
roslaunch run.launch entry point) — run dir artifacts, resume, dashboard.
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPT = os.path.join(REPO, "scripts", "run_experiment.py")


def run_cli(out_dir, *extra, steps=8):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = ""  # child re-pins via its own config
    cmd = [sys.executable, SCRIPT, "--steps", str(steps), "--chunk", "4",
           "--small", "--seed", "0", "--out", str(out_dir), *extra]
    # force CPU in the child (tests must not require the real chip)
    code = (
        "import sys, jax; jax.config.update('jax_platforms', 'cpu'); "
        f"sys.argv = {cmd[1:]!r}; __file__ = sys.argv[0]; "
        "exec(compile(open(sys.argv[0]).read(), sys.argv[0], 'exec'))"
    )
    return subprocess.run([sys.executable, "-c", code], env=env,
                          capture_output=True, text=True, timeout=900)


@pytest.fixture(scope="module")
def run_dir(tmp_path_factory):
    out = tmp_path_factory.mktemp("cli")
    r = run_cli(out, "--dash-every", "4")
    assert r.returncode == 0, r.stderr[-2000:]
    return os.path.join(str(out), "synth", "entklerg_0000")


class TestRunExperimentCLI:
    def test_run_dir_artifacts(self, run_dir):
        for f in ("config.yaml", "log.txt", "metrics.npz", "training.png",
                  "final_view.png", "dashboard.png", "dashboard.html"):
            assert os.path.exists(os.path.join(run_dir, f)), f
        assert os.path.isdir(os.path.join(run_dir, "checkpoints"))

    def test_metrics_series(self, run_dir):
        m = np.load(os.path.join(run_dir, "metrics.npz"))
        assert "loss" in m and "ergodic_cost" in m
        assert m["ergodic_cost"].size >= 8

    def test_resume_continues(self, run_dir):
        out = os.path.dirname(os.path.dirname(run_dir))
        r = run_cli(out, "--resume", steps=12)
        assert r.returncode == 0, r.stderr[-2000:]
        log = open(os.path.join(run_dir, "log.txt")).read()
        assert "resumed from" in log
        assert "12 steps" in log or "done: 12" in log

    def test_post_train_phase(self, run_dir):
        # default-on post-exploration training (trainer_ddp.py:202-249):
        # learning ratio reaches num_steps * target_learning_rate (3.0)
        # and the postexplr checkpoint exists
        log = open(os.path.join(run_dir, "log.txt")).read()
        assert "post-exploration training" in log
        assert "postexplr checkpoint" in log
        assert os.path.isdir(os.path.join(run_dir, "checkpoints", "postexplr"))
        import re
        m = re.findall(r"learning_ind (\d+)/(\d+)", log)
        assert m and int(m[-1][0]) >= int(m[-1][1])


class TestDemoEntry:
    def test_demo_module_runs(self):
        """python -m ealv_tpu.runtime.demo: the quickstart entry completes
        and prints the learning curve + steady-state rate."""
        env = dict(os.environ)
        env["JAX_PLATFORMS"] = ""
        code = (
            "import sys, jax; jax.config.update('jax_platforms', 'cpu'); "
            "from ealv_tpu.runtime.demo import main; "
            "main(['--steps', '4', '--chunk', '2'])"
        )
        r = subprocess.run([sys.executable, "-c", code], env=env, cwd=REPO,
                           capture_output=True, text=True, timeout=900)
        assert r.returncode == 0, r.stderr[-2000:]
        assert "steady-state" in r.stdout
        assert "loss" in r.stdout
