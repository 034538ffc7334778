"""Data-layer tests: template rendering (golden behavior), schema prompt
assembly, weighted JSONL mixing, completion-only masking, bucketing,
packing — the reference had only __main__ smoke blocks here (SURVEY §4).
"""

import json
import random

import numpy as np
import pytest

from vietnamese_qa_system_tpu.data import (
    ByteTokenizer,
    DEFAULT_BANK,
    DataFileSpec,
    IGNORE_INDEX,
    InstructExample,
    QADataLoader,
    QAExample,
    RESPONSE_PREFIX,
    batch_encode,
    generate_id,
    parse_record,
)


# ------------------------------------------------------------------ templates


def test_templates_have_20_variants_per_family():
    for fam in ("prompt", "response", "no_answer", "trivial", "system"):
        assert DEFAULT_BANK.size(fam) == 20, fam


def test_template_substitution_and_errors():
    text = DEFAULT_BANK.render("prompt", 0, question="Q?", context="C")
    assert "Q?" in text and "C" in text
    with pytest.raises(KeyError):
        DEFAULT_BANK.render("prompt", 0, question="Q?")  # missing context
    with pytest.raises(IndexError):
        DEFAULT_BANK.render("prompt", 99, question="q", context="c")
    with pytest.raises(KeyError):
        DEFAULT_BANK.render("nope", 0)


def test_template_random_is_seeded():
    r1 = DEFAULT_BANK.render_random("system", random.Random(7))
    r2 = DEFAULT_BANK.render_random("system", random.Random(7))
    assert r1 == r2


# -------------------------------------------------------------------- schemas


def test_qa_example_rendering_branches():
    rng = random.Random(0)
    # answerable with docs -> normal response containing the answer
    ex = QAExample("a", "Thủ đô Việt Nam?", ["Hà Nội là thủ đô."], "Hà Nội")
    r = ex.render(rng)
    assert "Thủ đô Việt Nam?" in r["prompt"]
    assert "[CTX0]" in r["prompt"]
    assert "Hà Nội" in r["target"]
    # impossible -> refusal mentioning the question
    ex2 = QAExample("b", "Câu không trả lời được?", ["doc"], None)
    assert ex2.is_impossible
    r2 = ex2.render(rng)
    assert "Câu không trả lời được?" in r2["target"]
    # trivial without docs -> trivial family with answer
    ex3 = QAExample("c", "1+1?", [], "2", is_trivial=True)
    r3 = ex3.render(rng)
    assert "2" in r3["target"]
    # no docs prompt carries the no-docs marker
    assert "KHÔNG CÓ TÀI LIỆU" in r3["prompt"]


def test_qa_doc_shuffle_is_seeded():
    docs = [f"doc {i}" for i in range(10)]
    ex = QAExample("a", "q", docs, "ans")
    s1 = ex.shuffled_docs(random.Random(3))
    s2 = ex.shuffled_docs(random.Random(3))
    assert s1 == s2
    assert sorted(s1) == sorted(docs)


def test_instruct_rendering_modes():
    ex = InstructExample("i", "Hệ thống.", "Câu hỏi?", "Đáp án.")
    s2s = ex.render(task="seq2seq")
    assert s2s == {"prompt": "Hệ thống.\n\n### Câu hỏi:\nCâu hỏi?\n\n", "target": "Đáp án."}
    tr = ex.render(task="causal", mode="train")
    assert tr["text"].endswith("Đáp án.")
    assert tr["text"][: tr["prompt_len_chars"]].endswith(RESPONSE_PREFIX + "\n")
    ev = ex.render(task="causal", mode="eval")
    assert ev["prompt"].endswith(RESPONSE_PREFIX + "\n")
    assert ev["perplexity"] == ev["prompt"] + ev["target"]


def test_parse_record_validates_fields():
    rec = {"id": "x", "question": "q", "answer": "a"}
    ex = parse_record(rec, "qa")
    assert isinstance(ex, QAExample)
    with pytest.raises(ValueError):
        parse_record({"id": "x", "bogus": 1}, "qa")


def test_generate_id_deterministic():
    assert generate_id(random.Random(5)) == generate_id(random.Random(5))
    assert len(generate_id(random.Random(5), size=8)) == 8


# --------------------------------------------------------------------- loader


@pytest.fixture
def jsonl_files(tmp_path):
    f1 = tmp_path / "instruct.jsonl"
    with open(f1, "w") as f:
        for i in range(20):
            f.write(
                json.dumps(
                    {
                        "id": f"i{i}",
                        "system_prompt": "Bạn là trợ lý.",
                        "question": f"câu hỏi {i}",
                        "answer": f"đáp án {i}",
                    },
                    ensure_ascii=False,
                )
                + "\n"
            )
    f2 = tmp_path / "qa.jsonl"
    with open(f2, "w") as f:
        for i in range(20):
            f.write(
                json.dumps(
                    {
                        "id": f"q{i}",
                        "question": f"hỏi {i}",
                        "documents": [f"tài liệu {i}"],
                        "answer": f"trả lời {i}",
                    },
                    ensure_ascii=False,
                )
                + "\n"
            )
    return f1, f2


def test_weighted_mixing(jsonl_files):
    f1, f2 = jsonl_files
    dl = QADataLoader(ByteTokenizer(), max_len=512, batch_size=4)
    examples = dl.load_examples(
        [DataFileSpec(str(f1), "instruct", 0.75), DataFileSpec(str(f2), "qa", 0.25)],
        max_examples=16,
    )
    # 12 from file1, 4 from file2
    assert len(examples) == 16


def test_completion_only_masking(jsonl_files):
    f1, _ = jsonl_files
    tok = ByteTokenizer()
    dl = QADataLoader(tok, max_len=512, batch_size=4)
    examples = dl.load_examples([DataFileSpec(str(f1), "instruct")], max_examples=4)
    batch = next(dl.batches(examples, shuffle=False))
    ids, labels, mask = batch["input_ids"], batch["labels"], batch["attention_mask"]
    for r in range(ids.shape[0]):
        n = mask[r].sum()
        # prompt region masked, target region = ids, padding masked
        tgt = labels[r][labels[r] != IGNORE_INDEX]
        assert len(tgt) > 0
        text = tok.decode([t for t in tgt if t != tok.eos_id])
        assert text.startswith("đáp án")
        # everything before the target is IGNORE_INDEX
        first_tgt = np.argmax(labels[r] != IGNORE_INDEX)
        assert (labels[r][:first_tgt] == IGNORE_INDEX).all()
        assert (labels[r][n:] == IGNORE_INDEX).all()


def test_too_long_examples_skipped(jsonl_files):
    f1, _ = jsonl_files
    dl = QADataLoader(ByteTokenizer(), max_len=48, batch_size=2)
    dl.load_examples([DataFileSpec(str(f1), "instruct")], max_examples=8)
    assert dl.stats["skipped_too_long"] > 0


def test_bucketed_static_shapes(jsonl_files):
    f1, _ = jsonl_files
    dl = QADataLoader(ByteTokenizer(), max_len=256, batch_size=4)
    examples = dl.load_examples([DataFileSpec(str(f1), "instruct")], max_examples=8)
    widths = {b["input_ids"].shape[1] for b in dl.batches(examples, shuffle=False)}
    assert widths <= {64, 128, 256}


def test_packing_blocks(jsonl_files):
    f1, _ = jsonl_files
    dl = QADataLoader(ByteTokenizer(), max_len=128, batch_size=2, pack=True)
    examples = dl.load_examples([DataFileSpec(str(f1), "instruct")], max_examples=12)
    for batch in dl.batches(examples, shuffle=False):
        assert batch["input_ids"].shape[1] == 128
        assert batch["attention_mask"].all()  # packed: no padding


def test_seq2seq_collation(jsonl_files):
    f1, _ = jsonl_files
    dl = QADataLoader(ByteTokenizer(), task="seq2seq", max_len=256, batch_size=4)
    examples = dl.load_examples([DataFileSpec(str(f1), "instruct")], max_examples=4)
    batch = next(dl.batches(examples, shuffle=False))
    assert "labels" in batch and batch["labels"].shape[0] == 4
    assert (batch["labels"] != IGNORE_INDEX).any()


def test_seq2seq_long_labels_use_target_ladder(jsonl_files):
    """Labels get their own bucket ladder (target_max_len): with
    target_max_len > max_len a long target must widen the label array,
    not overflow the input ladder's top bucket."""
    f1, _ = jsonl_files
    dl = QADataLoader(
        ByteTokenizer(), task="seq2seq", max_len=64, target_max_len=256,
        batch_size=2,
    )
    long_answer = "dài " * 50  # ~200 bytes > max_len=64
    examples = [
        {"input_ids": dl.tok.encode("câu hỏi"), "labels": dl.tok.encode(long_answer)},
        {"input_ids": dl.tok.encode("hỏi"), "labels": dl.tok.encode("ngắn")},
    ]
    batch = next(dl.batches(examples, shuffle=False))
    assert batch["input_ids"].shape[1] <= 64
    assert batch["labels"].shape[1] == 256
    assert (batch["labels"][0] != IGNORE_INDEX).sum() == len(examples[0]["labels"])


def test_causal_overlong_target_truncates_not_negative_slice():
    """skip_too_long=False with a target longer than max_len must cap the
    total at max_len (prompt dropped first, then the target tail) — the
    old `prompt[:max_len - len(target)]` slice went negative and produced
    sequences LONGER than max_len."""
    tok = ByteTokenizer()
    dl = QADataLoader(tok, max_len=32, batch_size=1, skip_too_long=False)
    ex = dl._tokenize({"prompt": "p" * 20, "target": "t" * 64})
    assert ex is not None
    assert len(ex["input_ids"]) == 32
    assert len(ex["labels"]) == 32
    # completion-only masking: every kept token is target, none is prompt
    assert all(l != IGNORE_INDEX for l in ex["labels"])


def test_epoch_shuffle_deterministic(jsonl_files):
    f1, _ = jsonl_files
    dl = QADataLoader(ByteTokenizer(), max_len=256, batch_size=4)
    examples = dl.load_examples([DataFileSpec(str(f1), "instruct")], max_examples=8)
    b1 = [b["input_ids"].tolist() for b in dl.batches(examples, epoch=1)]
    b2 = [b["input_ids"].tolist() for b in dl.batches(examples, epoch=1)]
    b3 = [b["input_ids"].tolist() for b in dl.batches(examples, epoch=2)]
    assert b1 == b2
    assert b1 != b3


def test_batch_encode_left_padding():
    tok = ByteTokenizer()
    ids, mask = batch_encode(tok, ["ab", "cdef"], 6, pad_side="left")
    assert (ids[0][:4] == tok.pad_id).all()
    assert mask[0].sum() == 2 and mask[1].sum() == 4


def test_shard_for_process():
    examples = [{"i": i} for i in range(10)]
    s0 = QADataLoader.shard_for_process(examples, 0, 4)
    s1 = QADataLoader.shard_for_process(examples, 1, 4)
    all_back = sorted(
        x["i"]
        for p in range(4)
        for x in QADataLoader.shard_for_process(examples, p, 4)
    )
    assert all_back == list(range(10))  # disjoint + complete
    assert s0 == [{"i": 0}, {"i": 4}, {"i": 8}]
    assert s1 == [{"i": 1}, {"i": 5}, {"i": 9}]
