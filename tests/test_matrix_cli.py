"""Script-level smoke test: scripts/run_fingerprint_matrix.py — the
fingerprint_mp-equivalent CLI (learn -> capture -> matrix identification in
one command; parity: scripts/fingerprint_mp:181-261). Covers the arm +
host-loop + no-cluster-monitor path end-to-end, which is the flagship-study
configuration (PARITY section 7).
"""

import os
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPT = os.path.join(REPO, "scripts", "run_fingerprint_matrix.py")


def run_matrix_cli(*extra):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = ""  # child re-pins via its own config
    cmd = [SCRIPT, *extra]
    # force CPU in the child (tests must not require the real chip)
    code = (
        "import sys, jax; jax.config.update('jax_platforms', 'cpu'); "
        f"sys.argv = {cmd!r}; __file__ = sys.argv[0]; "
        "exec(compile(open(sys.argv[0]).read(), sys.argv[0], 'exec'))"
    )
    return subprocess.run([sys.executable, "-c", code], env=env,
                          capture_output=True, text=True, timeout=900)


def test_arm_host_loop_matrix(tmp_path):
    """The PARITY-7 path: arm backend, host loop, no cluster monitor (the
    module-level jnp use after the skipped monitor branch), belief
    artifacts saved."""
    out = str(tmp_path / "mx")
    r = run_matrix_cli(
        "--small", "--objects", "2", "--backend", "arm", "--host-loop",
        "--cluster-every", "0", "--learn-steps", "20", "--id-steps", "10",
        "--capture-steps", "8", "--seed", "3", "--out", out,
    )
    assert r.returncode == 0, (r.stdout[-2000:], r.stderr[-2000:])
    assert "host-loop learning steps on 'arm' backend" in r.stdout
    assert "true centers (robot):" in r.stdout
    assert "| L2 |" in r.stdout
    for combo in ("L2", "KL", "BC", "L2_error"):
        p = os.path.join(out, f"beliefs_{combo}.npz")
        assert os.path.exists(p), p
        with np.load(p) as z:
            assert all(np.isfinite(z[k]).all() for k in z.files
                       if np.issubdtype(z[k].dtype, np.floating))


def test_fused_free_matrix(tmp_path):
    """The fused (non-host-loop) free-backend path still runs end-to-end."""
    r = run_matrix_cli(
        "--small", "--learn-steps", "50", "--id-steps", "10",
        "--capture-steps", "8", "--seed", "1",
    )
    assert r.returncode == 0, (r.stdout[-2000:], r.stderr[-2000:])
    assert "learning steps in" in r.stdout
    assert "| L2 |" in r.stdout


def test_uncertain_seek_mode_cli(tmp_path):
    """--seek-mode uncertain (active re-localization of the least-certain
    object) runs the fused program end-to-end."""
    r = run_matrix_cli(
        "--small", "--objects", "3", "--learn-steps", "20", "--id-steps",
        "10", "--capture-steps", "8", "--seed", "2",
        "--seek-mode", "uncertain",
    )
    assert r.returncode == 0, (r.stdout[-2000:], r.stderr[-2000:])
    assert "| L2 |" in r.stdout
