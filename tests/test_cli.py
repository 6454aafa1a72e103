"""CLI smoke tests: tiny runs of each subcommand on the CPU mesh."""

import json

import pytest

from scalable_e3_gnn_tpu.cli import main


def test_info(capsys):
    assert main(["info"]) == 0
    rec = json.loads(capsys.readouterr().out)
    assert rec["device_count"] >= 1
    assert rec["backend"] == "cpu"


def test_configs(capsys):
    assert main(["configs"]) == 0
    out = capsys.readouterr().out
    for name in ("nbody", "qm9", "cloud100k", "cloud1m", "cloud10m"):
        assert name in out


def test_train_nbody_tiny(capsys, tmp_path):
    rc = main(
        ["train", "--config", "nbody", "--steps", "3", "--graphs", "8",
         "--ckpt-dir", str(tmp_path)]
    )
    assert rc == 0
    rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rec["config"] == "nbody" and rec["steps"] == 3
    assert rec["final_loss"] < 1e3


def test_train_qm9_tiny(capsys):
    rc = main(
        ["train", "--config", "qm9", "--steps", "3", "--molecules", "8",
         "--batch-size", "4"]
    )
    assert rc == 0
    rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rec["config"] == "qm9" and rec["steps"] == 3


def test_train_cloud_tiny(capsys):
    rc = main(
        ["train", "--config", "cloud100k", "--steps", "2", "--points", "2000"]
    )
    assert rc == 0
    rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rec["config"] == "cloud100k" and rec["edges"] > 0
