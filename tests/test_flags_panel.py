"""Tests for the remaining reference flags (prior_steps, intensity, force,
z-ensemble, dx in the runtime) and the control panel."""

import io

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ealv_tpu.utils.config import ExperimentConfig
from ealv_tpu.runtime import Experiment
from ealv_tpu.runtime.panel import ControlPanel, ControlHooks


def tiny_cfg(**kw):
    d = dict(
        states="xyw",
        image_dim=(24, 24, 3),
        cnn_kernels=(3, 3), cnn_strides=(2, 2), cnn_channels=(8, 8),
        hidden_dim=(64, 32), z_dim=8,
        num_target_samples=64, num_traj_samples=32,
        traj_buffer_capacity=128, buffer_capacity=128,
        batch_size=8, num_learning_opt=2,
    )
    d.update(kw)
    return ExperimentConfig(**d)


@pytest.mark.slow
class TestFlags:
    def _run(self, cfg, n=3):
        exp = Experiment(cfg, train_calls_per_tick=1)
        es = exp.init(seed=0)
        tick = jax.jit(exp.tick)
        for _ in range(n):
            es, info = tick(es)
        return es, info

    def test_prior_steps(self):
        es, info = self._run(tiny_cfg(prior_steps=2))
        assert np.isfinite(float(info["loss"]))

    def test_learn_force(self):
        es, info = self._run(tiny_cfg(learn_force=True))
        assert np.isfinite(float(info["loss"]))
        assert float(jnp.abs(es.buf.force).max()) >= 0  # force channel pushed

    def test_intensity(self):
        es, info = self._run(tiny_cfg(image_dim=(24, 24, 1)))
        assert es.buf.y.shape[-1] == 1

    def test_dx_mode(self):
        es, info = self._run(tiny_cfg(dx=True))
        assert np.isfinite(float(info["loss"]))

    def test_z_ensemble(self):
        es, info = self._run(tiny_cfg(use_z_ensemble=True))
        assert np.isfinite(float(info["ergodic_cost"]))

    def test_brightness_state(self):
        es, info = self._run(tiny_cfg(states="xyb"))
        assert np.isfinite(np.asarray(info["robot_state"])).all()


class TestControlPanel:
    def test_commands(self):
        log = {"mode": None, "z": 0.0, "b": None, "reset": 0}
        hooks = ControlHooks(
            reset_fn=lambda: log.__setitem__("reset", log["reset"] + 1),
            switch_mode_fn=lambda m: log.__setitem__("mode", m),
            nudge_z_fn=lambda dz: log.__setitem__("z", log["z"] + dz),
            brightness_fn=lambda b: log.__setitem__("b", b),
        )
        out = io.StringIO()
        panel = ControlPanel(hooks, out=out)
        for cmd in ["pause", "status", "mode pose", "z up", "b 0.7",
                    "reset", "save", "resume"]:
            assert panel.handle(cmd)
        assert not panel.handle("quit")
        assert log["mode"] == "pose" and abs(log["z"] - 0.01) < 1e-9
        assert log["b"] == 0.7 and log["reset"] == 1
        assert hooks.pause_mgr.consume_save()
        assert not hooks.pause_mgr.paused

    def test_stdin_loop(self):
        hooks = ControlHooks()
        inp = io.StringIO("pause\nstatus\nquit\n")
        out = io.StringIO()
        ControlPanel(hooks, inp=inp, out=out).run()
        assert "paused=True" in out.getvalue()


class TestWebPanel:
    """Browser control panel (runtime/webpanel.py): the tk GUI role served
    over HTTP on the same ControlHooks surface."""

    @pytest.fixture()
    def panel(self, tmp_path):
        from ealv_tpu.runtime.panel import ControlHooks
        from ealv_tpu.runtime.webpanel import WebPanel
        modes = []
        hooks = ControlHooks(switch_mode_fn=modes.append,
                             brightness_fn=lambda b: modes.append(("b", b)))
        (tmp_path / "dashboard.png").write_bytes(b"\x89PNG fake")
        wp = WebPanel(hooks, run_dir=str(tmp_path))
        wp.start()
        yield wp, hooks, modes
        wp.stop()

    def _post(self, port, line):
        import urllib.request
        req = urllib.request.Request(f"http://127.0.0.1:{port}/cmd",
                                     data=line.encode(), method="POST")
        with urllib.request.urlopen(req, timeout=5) as r:
            return r.read().decode()

    def _get(self, port, path):
        import urllib.request
        with urllib.request.urlopen(f"http://127.0.0.1:{port}{path}",
                                    timeout=5) as r:
            return r.status, r.read()

    def test_commands_drive_hooks(self, panel):
        wp, hooks, modes = panel
        assert self._post(wp.port, "pause") == "paused"
        assert hooks.pause_mgr.paused
        assert self._post(wp.port, "resume") == "resumed"
        assert not hooks.pause_mgr.paused
        self._post(wp.port, "mode pose")
        assert modes[-1] == "pose"
        self._post(wp.port, "b 0.4")
        assert modes[-1] == ("b", 0.4)
        self._post(wp.port, "save")
        assert hooks.pause_mgr.save_requested

    def test_status_and_page_and_image(self, panel):
        import json
        wp, hooks, modes = panel
        code, body = self._get(wp.port, "/status")
        assert code == 200
        s = json.loads(body)
        assert set(s) == {"paused", "manual", "save_pending"}
        code, body = self._get(wp.port, "/")
        assert code == 200 and b"brightness" in body
        code, body = self._get(wp.port, "/dashboard.png")
        assert code == 200 and body.startswith(b"\x89PNG")
