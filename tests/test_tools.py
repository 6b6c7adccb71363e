"""Report tool + pipeline runner (CPU backend)."""

import json
import os

import pytest

from yolotpu.cli import pipeline as pl
from yolotpu.cli import report as rp


@pytest.mark.slow
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


@pytest.mark.slow
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


def test_report_parse_log(tmp_path):
    log = tmp_path / "run.log"
    log.write_text(
        "frame 0: inference time: 10.00 ms\n"
        "noise line\n"
        "frame 1: inference time: 20.00 ms\n"
        "frame 2: inference time: 30.00 ms\n")
    from yolotpu.cli.report import parse_inference_log
    stats = parse_inference_log(str(log))
    assert stats["count"] == 3
    assert stats["median_ms"] == 20.0
    assert stats["fps"] == 50.0
    assert rp.main(["parse-log", str(log)]) == 0
    empty = tmp_path / "empty.log"
    empty.write_text("nothing here\n")
    assert rp.main(["parse-log", str(empty)]) == 1
