"""Smoke tests: the example CLIs run end-to-end (tiny configs, CPU)."""

import subprocess
import sys
import os

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ENV = dict(
    os.environ,
    JAX_PLATFORMS="cpu",
    PALLAS_AXON_POOL_IPS="",
    PYTHONPATH=REPO + os.pathsep + os.environ.get("PYTHONPATH", ""),
)


def _run(args, timeout=600):
    return subprocess.run(
        [sys.executable] + args,
        cwd=REPO,
        env=ENV,
        capture_output=True,
        text=True,
        timeout=timeout,
    )


def test_train_nbody_cli(tmp_path):
    r = _run(
        [
            "examples/train_nbody.py",
            "--steps", "12", "--graphs", "8",
            "--ckpt-dir", str(tmp_path), "--log", str(tmp_path / "m.jsonl"),
        ]
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "final loss" in r.stdout
    assert (tmp_path / "m.jsonl").exists()


def test_train_pointcloud_cli():
    r = _run(
        [
            "examples/train_pointcloud.py",
            "--points", "2000", "--steps", "2", "--neighbors", "8",
        ]
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "final loss" in r.stdout
