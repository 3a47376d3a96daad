"""Metrics logging / debug utilities tests."""

import json
import os

import jax.numpy as jnp
import numpy as np

from human_body_reconstruction_tpu.utils import observability as obs


def test_metrics_logger_writes_csv_and_jsonl(tmp_path, capsys):
    log = obs.MetricsLogger(out_dir=str(tmp_path), name="m")
    log.log({"step": 1, "loss": jnp.asarray(0.5), "psnr": 20.0})
    log.log({"step": 2, "loss": jnp.asarray(0.25), "psnr": 23.0})
    log.close()
    lines = open(os.path.join(tmp_path, "m.jsonl")).read().strip().splitlines()
    assert len(lines) == 2
    rec = json.loads(lines[0])
    assert rec["loss"] == 0.5 and rec["step"] == 1
    csv_lines = open(os.path.join(tmp_path, "m.csv")).read().strip().splitlines()
    assert csv_lines[0].startswith("step,loss")
    assert len(csv_lines) == 3
    out = capsys.readouterr().out
    assert "loss=0.5" in out


def test_metrics_logger_stdout_only():
    log = obs.MetricsLogger()
    log.log({"a": 1.0})  # must not raise without out_dir
    log.close()


def test_grad_norms():
    grads = {"table": jnp.ones((4, 2)), "mlp": {"w": jnp.full((3,), 2.0)}}
    norms = obs.grad_norms(grads)
    np.testing.assert_allclose(float(norms["grad_norm/table"]),
                               np.sqrt(8.0), rtol=1e-6)
    np.testing.assert_allclose(float(norms["grad_norm/mlp"]),
                               np.sqrt(12.0), rtol=1e-6)
