"""Report tool + pipeline runner (CPU backend)."""

import json
import os

import pytest

from yolotpu.cli import pipeline as pl
from yolotpu.cli import report as rp


def test_report_run_list_compare(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    args = ["--report-dir", "reports", "run", "--label", "t1",
            "--model", "yolov2-tiny", "--width", "64", "--height", "64",
            "--precision", "fp32", "--batch", "2", "--steps", "3",
            "--synthetic-weights"]
    assert rp.main(args) == 0
    assert rp.main([a.replace("t1", "t2") for a in args]) == 0
    dirs = sorted(os.listdir("reports"))
    assert len(dirs) == 2
    m = json.load(open(f"reports/{dirs[0]}/metrics.json"))
    assert m["latency"]["count"] == 3 and m["latency"]["fps"] > 0
    assert "compile_seconds" in m
    assert os.path.exists(f"reports/{dirs[0]}/summary.md")
    assert rp.main(["--report-dir", "reports", "list"]) == 0
    assert rp.main(["--report-dir", "reports", "compare", dirs[0], dirs[1]]) == 0


def test_pipeline_stage_windowing():
    assert pl.compute_stage_list(None, None) == pl.STAGES
    assert pl.compute_stage_list("artifacts", "host_quickstart") == [
        "artifacts", "host_quickstart"]
    with pytest.raises(ValueError):
        pl.compute_stage_list("report", "artifacts")


def test_pipeline_host_stages(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    (tmp_path / "pipe.yaml").write_text(
        "model: yolov2\nsynthetic_weights: true\n")
    rc = pl.main(["--config", "pipe.yaml", "--from", "host_sanity",
                  "--to", "host_quickstart"])
    assert rc == 0
    assert os.path.exists("weights/weights.bin")
    assert os.path.exists("weights/iofm_Q.bin")


def test_pipeline_init_config(tmp_path):
    p = tmp_path / "cfg.yaml"
    assert pl.main(["--init-config", str(p)]) == 0
    assert "model: yolov2" in p.read_text()
