"""scripts/k3_study.py — the multi-seed belief-target study driver.

The study itself needs the chip; these tests pin the log parser and the
aggregation math so the published PARITY section-6 aggregate table can't
silently drift from what the per-run logs say.
"""

import importlib.util
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load():
    spec = importlib.util.spec_from_file_location(
        "k3_study", os.path.join(REPO, "scripts", "k3_study.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


LOG = """+ python scripts/run_fingerprint_matrix.py --objects 3
800 learning steps in 19s; loss -3.780
seek-target share per object (post-adoption): [0.31, 0.53, 0.16]

| method | per-object error | mean error |
|---|---|---|
| L2 | 0.377, 0.124, 0.452 | 0.318 |
| KL | 0.377, 0.982, 0.411 | 0.590 |
| BC | 0.377, 0.908, 0.411 | 0.565 |
| L2_error | 1.282, 0.185, 0.564 | 0.677 |
"""


def test_parse_log(tmp_path):
    m = _load()
    p = tmp_path / "log.txt"
    p.write_text(LOG)
    res = m.parse_log(str(p))
    assert res["L2"] == [0.377, 0.124, 0.452]
    assert res["L2_error"] == [1.282, 0.185, 0.564]
    assert res["seek_share"] == [0.31, 0.53, 0.16]
    assert m.parse_log(str(tmp_path / "missing.txt")) is None


def test_aggregate_and_render(tmp_path):
    m = _load()
    # two seeds, one mode; the second seed's worst object is worse
    for seed, tbl in ((0, "| L2 | 0.3, 0.1, 0.5 | 0.3 |"),
                      (1, "| L2 | 0.2, 0.9, 0.1 | 0.4 |")):
        d = tmp_path / f"s{seed}_active"
        d.mkdir()
        (d / "log.txt").write_text(
            "| method | per-object error | mean error |\n" + tbl + "\n")
    runs, summary = m.aggregate(str(tmp_path), seeds=[0, 1],
                                modes=("active",))
    assert ("active", 0) in runs and ("active", 1) in runs
    st = summary["active"]["L2"]
    assert abs(st["mean_error"] - (0.3 + 0.4) / 2) < 1e-9
    assert abs(st["worst_object_mean"] - (0.5 + 0.9) / 2) < 1e-9
    assert st["worst_object_max"] == 0.9
    md = m.render(summary, [0, 1])
    assert "| active | L2 |" in md and "0.350" in md and "0.900" in md


def test_aggregate_skips_missing_runs(tmp_path):
    m = _load()
    runs, summary = m.aggregate(str(tmp_path), seeds=[0, 1])
    assert runs == {} and summary == {}


def test_missing_runs_marked_and_fail_the_invocation(tmp_path, monkeypatch,
                                                     capsys):
    # a failed/unparseable run must not silently shrink the aggregate: the
    # summary carries an INCOMPLETE banner naming the absent runs and the
    # script exits nonzero (repro.py propagates the rc)
    import json
    import sys

    import pytest

    m = _load()
    md = m.render({}, [0], missing=[("active", 0)])
    assert "INCOMPLETE" in md and "s0_active" in md

    d = tmp_path / "s0_active"
    d.mkdir()
    (d / "log.txt").write_text(
        "| method | per-object error | mean error |\n"
        "| L2 | 0.3, 0.1, 0.5 | 0.3 |\n")
    monkeypatch.setattr(sys, "argv", [
        "k3_study.py", "--parse-only", "--seeds", "0", "1",
        "--modes", "active", "--out", str(tmp_path)])
    with pytest.raises(SystemExit) as ei:
        m.main()
    assert ei.value.code == 1
    saved = json.load(open(tmp_path / "summary.json"))
    assert saved["missing"] == ["s1_active"]
    assert "INCOMPLETE" in (tmp_path / "summary.md").read_text()
