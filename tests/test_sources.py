"""Pluggable parser sources (capability of the reference parsers' HF
streaming reads, src/data/dataloader.py:72-73): local files by default,
hf:// specs streaming through the real `datasets` library."""

import json

import pytest

from vietnamese_qa_system_tpu.etl.parsers.builtin import AlpacaParser
from vietnamese_qa_system_tpu.etl.sources import (
    HFDatasetSource,
    LocalFileSource,
    parse_source_spec,
)


@pytest.fixture
def raw_file(tmp_path):
    p = tmp_path / "raw.jsonl"
    with open(p, "w", encoding="utf-8") as f:
        for i in range(5):
            f.write(
                json.dumps(
                    {"instruction": f"câu hỏi {i}", "input": "", "output": f"trả lời {i}"},
                    ensure_ascii=False,
                )
                + "\n"
            )
    return str(p)


def test_spec_parsing():
    s = parse_source_spec("some/local/file.jsonl")
    assert isinstance(s, LocalFileSource)
    s = parse_source_spec("hf://Open-Orca/OpenOrca#train")
    assert isinstance(s, HFDatasetSource)
    assert s.name == "Open-Orca/OpenOrca" and s.split == "train"
    s = parse_source_spec("hf://facebook/eli5@LFQA#validation")
    assert s.name == "facebook/eli5" and s.config == "LFQA"
    assert s.split == "validation"
    with pytest.raises(ValueError, match="empty dataset name"):
        parse_source_spec("hf://#train")


def test_local_source_load(raw_file):
    s = LocalFileSource(raw_file)
    assert s.exists()
    rows = s.load()
    assert len(rows) == 5 and rows[0]["instruction"] == "câu hỏi 0"
    assert len(s.load(max_examples=2)) == 2
    assert not LocalFileSource("/nope/missing.jsonl").exists()


def test_hf_source_streams_through_datasets(raw_file):
    """The real `datasets` streaming path, offline: json builder over a
    local file — exactly what an hf:// Hub spec does when reachable."""
    s = HFDatasetSource("json", data_files=raw_file, streaming=True)
    rows = s.load()
    assert len(rows) == 5
    assert rows[3]["output"] == "trả lời 3"
    assert len(s.load(max_examples=1)) == 1


def test_parser_runs_over_hf_source(raw_file, tmp_path):
    """A concrete parser driven by a streamed HF source end-to-end."""
    parser = AlpacaParser(
        None,
        str(tmp_path / "out"),
        source=HFDatasetSource("json", data_files=raw_file, streaming=True),
        seed=0,
    )
    out = parser.run()
    rows = [json.loads(l) for l in open(out, encoding="utf-8")]
    assert len(rows) == 5
    assert all(set(r) == {"id", "system_prompt", "question", "answer"} for r in rows)
    assert rows[2]["question"] == "câu hỏi 2"


def test_parser_local_path_still_default(raw_file, tmp_path):
    parser = AlpacaParser(raw_file, str(tmp_path / "out"), seed=0)
    out = parser.run()
    assert len(open(out, encoding="utf-8").read().splitlines()) == 5


def test_missing_local_input_raises(tmp_path):
    parser = AlpacaParser("/nope/missing.jsonl", str(tmp_path))
    with pytest.raises(FileNotFoundError):
        parser.run()
