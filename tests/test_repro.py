"""scripts/repro.py — the one-command table-regeneration registry.

The heavy studies themselves run on the chip (and are exercised by their
own CLIs' smoke tests); these tests pin the registry's integrity so a
renamed script or flag can't silently orphan a published table.
"""

import importlib.util
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_repro():
    spec = importlib.util.spec_from_file_location(
        "repro", os.path.join(REPO, "scripts", "repro.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_registry_commands_reference_existing_scripts():
    m = _load_repro()
    assert len(m.TABLES) >= 10
    for name, spec in m.TABLES.items():
        script = spec["cmd"][1]
        assert os.path.exists(script), f"{name}: {script} missing"
        assert spec["doc"]


@pytest.mark.slow
def test_list_flag_prints_every_table():
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "repro.py"),
         "--list"], capture_output=True, text=True, timeout=60, cwd=REPO)
    assert r.returncode == 0
    m = _load_repro()
    for name in list(m.TABLES) + ["planner"]:
        assert name in r.stdout


def test_unknown_table_rejected():
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "repro.py"),
         "not-a-table"], capture_output=True, text=True, timeout=60,
        cwd=REPO)
    assert r.returncode != 0
    assert "unknown table" in r.stderr


@pytest.mark.slow
def test_registry_flags_parse():
    """Every registered command's flags must be accepted by its script's
    argparse (run with --help appended; argparse exits 0 after printing)."""
    m = _load_repro()
    seen = set()
    for name, spec in m.TABLES.items():
        script = spec["cmd"][1]
        if script in seen:
            continue
        seen.add(script)
        r = subprocess.run(
            [sys.executable, script, "--help"], capture_output=True,
            text=True, timeout=120, cwd=REPO,
            env={**os.environ, "JAX_PLATFORMS": "cpu"})
        assert r.returncode == 0, (script, r.stderr[-500:])
        # each flag the registry passes must appear in the script's help
        flags = [a for a in spec["cmd"][2:] if str(a).startswith("--")]
        for f in flags:
            assert f in r.stdout, f"{name}: {script} does not accept {f}"
