"""Offline-safe Hub push + tracker artifacts (capability of the reference's
save_push + wandb checkpoint artifacts, trainer.py:726-774)."""

import json
import os

import pytest

from vietnamese_qa_system_tpu.train.hub import push_to_hub
from vietnamese_qa_system_tpu.utils.trackers import JsonlTracker


@pytest.fixture
def export_dir(tmp_path):
    d = tmp_path / "export"
    d.mkdir()
    (d / "params.npz").write_bytes(b"x" * 100)
    (d / "config.json").write_text("{}")
    sub = d / "sub"
    sub.mkdir()
    (sub / "extra.txt").write_text("y")
    return str(d)


def test_push_dry_run_writes_manifest(export_dir):
    out = push_to_hub(export_dir, "org/repo", dry_run=True)
    assert out["pushed"] is False and "dry run" in out["reason"]
    manifest = json.load(open(os.path.join(export_dir, "push_manifest.json")))
    assert manifest["repo_id"] == "org/repo" and manifest["private"] is True
    paths = [f["path"] for f in manifest["files"]]
    assert "params.npz" in paths and os.path.join("sub", "extra.txt") in paths
    sizes = {f["path"]: f["bytes"] for f in manifest["files"]}
    assert sizes["params.npz"] == 100
    # the manifest never lists itself
    assert "push_manifest.json" not in paths


def test_push_without_token_degrades(export_dir, monkeypatch):
    monkeypatch.delenv("HF_TOKEN", raising=False)
    out = push_to_hub(export_dir, "org/repo")
    assert out["pushed"] is False and "token" in out["reason"]


def test_push_upload_failure_degrades(export_dir, monkeypatch):
    # a token is present but there is no network/hub — must not raise
    monkeypatch.setenv("HF_TOKEN", "hf_dummy")
    out = push_to_hub(export_dir, "org/repo")
    assert out["pushed"] is False
    assert "upload failed" in out["reason"] or "token" in out["reason"]


def test_push_missing_dir_raises(tmp_path):
    with pytest.raises(ValueError, match="does not exist"):
        push_to_hub(str(tmp_path / "nope"), "org/repo")


def test_jsonl_tracker_artifact(tmp_path):
    tr = JsonlTracker(str(tmp_path), run_name="r")
    tr.log_artifact(str(tmp_path), name="ckpt", type="model")
    tr.finish()
    lines = [json.loads(l) for l in open(tr.path)]
    assert lines[0]["artifact_name"] == "ckpt"
    assert lines[0]["artifact_type"] == "model"


def test_cli_train_push_dry_run(tmp_path):
    from vietnamese_qa_system_tpu.cli.main import main

    raw = tmp_path / "raw.jsonl"
    with open(raw, "w", encoding="utf-8") as f:
        for i in range(8):
            f.write(
                json.dumps(
                    {"instruction": f"câu {i}", "input": "", "output": f"đáp {i}"},
                    ensure_ascii=False,
                )
                + "\n"
            )
    parsed = tmp_path / "p"
    main(["parse", "--parser", "alpaca", "--input", str(raw),
          "--output-dir", str(parsed)])
    rc = main([
        "train",
        "--train-files", str(parsed / "AlpacaParser.jsonl"),
        "--epochs", "1", "--batch-size", "8", "--max-len", "384",
        "--log-dir", str(tmp_path / "logs"),
        "--push-to-hub", "org/test-repo", "--push-dry-run",
    ])
    assert rc == 0
    manifest = json.load(
        open(tmp_path / "logs" / "export" / "push_manifest.json")
    )
    assert manifest["repo_id"] == "org/test-repo"
    assert any(f["path"] == "params.npz" for f in manifest["files"])
    # artifact line landed in the tracker log
    logs = [p for p in (tmp_path / "logs").glob("*.jsonl")]
    text = "".join(open(p).read() for p in logs)
    assert "artifact" in text
