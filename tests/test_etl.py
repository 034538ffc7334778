"""ETL tests: parser contract enforcement, concrete parser field mappings,
code filter, tone normalization, fault-tolerant translation, reformat."""

import json

import pytest

from vietnamese_qa_system_tpu.etl import (
    DataParser,
    FlakyWrapper,
    NullTranslator,
    get_parser,
    have_code,
    normalize_tones,
    reformat_data,
    translate_texts,
)
from vietnamese_qa_system_tpu.etl.parsers import (
    AlpacaParser,
    CtxInjectorParser,
    Eli5Parser,
    SquadV2Parser,
    TranslationPairParser,
    WebglmQAParser,
    ZaloAIMathParser,
)


# ------------------------------------------------------------------ filters


def test_code_filter_flags_code():
    code = "def foo(x):\n    return {x: 1};\nimport re\nclass A: pass"
    flagged, score, found = have_code(code)
    assert flagged and score >= 5


def test_code_filter_passes_prose():
    prose = (
        "Hà Nội là thủ đô của Việt Nam. Thành phố này có lịch sử hơn một "
        "nghìn năm với nhiều di tích."
    )
    flagged, score, _ = have_code(prose)
    assert not flagged


# ----------------------------------------------------------------- normalize


def test_tone_normalization_clusters():
    assert normalize_tones("hòa bình") == "hoà bình"
    assert normalize_tones("thúy") == "thuý"
    assert normalize_tones("khỏe") == "khoẻ"
    assert normalize_tones("ÒA") == "OÀ"
    assert normalize_tones("Ọa") == "Oạ"
    # already-new-style text unchanged
    assert normalize_tones("hoà bình") == "hoà bình"
    assert normalize_tones("không đổi gì") == "không đổi gì"


# ----------------------------------------------------------------- translate


def test_translate_retries_failed_chunks():
    texts = [f"text {i}" for i in range(10)]
    flaky = FlakyWrapper(NullTranslator(), fail_times=2)
    out = translate_texts(texts, flaky, chunk_size=3, max_retries=3)
    assert out == texts  # order preserved through failures


def test_translate_gives_up_after_retries():
    flaky = FlakyWrapper(NullTranslator(), fail_times=99)
    with pytest.raises(RuntimeError):
        translate_texts(["a", "b"], flaky, chunk_size=1, max_retries=2)


# ------------------------------------------------------------------ contract


def test_parser_contract_enforced(tmp_path):
    class BadParser(DataParser):
        schema = "instruct"

        def read(self):  # missing super().read()
            self.raw = []

        def convert(self):
            super().convert()
            self.converted = []

    p = BadParser(None, str(tmp_path))
    with pytest.raises(TypeError, match="never calls super"):
        p.read()


def test_parser_save_validates_schema(tmp_path):
    class EmptyParser(DataParser):
        schema = "instruct"

        def read(self):
            super().read()
            self.raw = []

        def convert(self):
            super().convert()
            self.converted = [{"id": "x", "bad_field": 1}]

    p = EmptyParser(None, str(tmp_path))
    p.read()
    p.convert()
    with pytest.raises(ValueError, match="unknown fields"):
        p.save()


# ------------------------------------------------------------ concrete parsers


def _write_jsonl(path, rows):
    with open(path, "w", encoding="utf-8") as f:
        for r in rows:
            f.write(json.dumps(r, ensure_ascii=False) + "\n")


def test_alpaca_parser(tmp_path):
    src = tmp_path / "alpaca.jsonl"
    _write_jsonl(
        src,
        [
            {"instruction": "Tóm tắt", "input": "văn bản dài", "output": "tóm tắt ngắn"},
            {"instruction": "Giải thích", "input": "", "output": "lời giải"},
        ],
    )
    p = AlpacaParser(str(src), str(tmp_path / "out"))
    out = p.run()
    rows = [json.loads(l) for l in open(out, encoding="utf-8")]
    assert len(rows) == 2
    assert rows[0]["question"] == "Tóm tắt\nvăn bản dài"
    assert rows[1]["question"] == "Giải thích"
    assert rows[0]["system_prompt"]  # random system prompt filled in


def test_zaloai_math_parser(tmp_path):
    src = tmp_path / "zalo.jsonl"
    _write_jsonl(
        src,
        [
            {
                "question": "1+1 bằng mấy?",
                "choices": ["1", "2", "3"],
                "answer": "B",
                "explanation": "Vì 1+1=2.",
            }
        ],
    )
    p = ZaloAIMathParser(str(src), str(tmp_path / "out"))
    rows = [json.loads(l) for l in open(p.run(), encoding="utf-8")]
    assert "A. 1" in rows[0]["question"] and "B. 2" in rows[0]["question"]
    assert "Đáp án: B" in rows[0]["answer"]


def test_translation_pair_parser_both_directions(tmp_path):
    src = tmp_path / "mt.jsonl"
    _write_jsonl(src, [{"translation": {"en": "hello", "vi": "xin chào"}}])
    p = TranslationPairParser(str(src), str(tmp_path / "out"))
    rows = [json.loads(l) for l in open(p.run(), encoding="utf-8")]
    assert len(rows) == 2
    answers = {r["answer"] for r in rows}
    assert answers == {"hello", "xin chào"}


def test_eli5_parser_docs_and_answers(tmp_path):
    src = tmp_path / "eli5.jsonl"
    _write_jsonl(
        src,
        [
            {
                "q_id": "q1",
                "question": "Tại sao trời xanh?",
                "doc_tokens": [f"doc {i}" for i in range(15)],
                "answers": {"text": ["tán xạ ánh sáng", "một đáp án khác"]},
            }
        ],
    )
    p = Eli5Parser(str(src), str(tmp_path / "out"))
    rows = [json.loads(l) for l in open(p.run(), encoding="utf-8")]
    assert len(rows) == 1  # first answer only by default
    assert len(rows[0]["documents"]) == 10  # max_docs cap
    assert rows[0]["answer"] == "tán xạ ánh sáng"


def test_webglm_parser(tmp_path):
    src = tmp_path / "webglm.jsonl"
    _write_jsonl(
        src,
        [{"question": "q?", "answer": "a [1]", "references": ["ref một", "ref hai"]}],
    )
    p = WebglmQAParser(str(src), str(tmp_path / "out"))
    rows = [json.loads(l) for l in open(p.run(), encoding="utf-8")]
    assert rows[0]["documents"] == ["ref một", "ref hai"]


def test_squad_v2_parser_impossible(tmp_path):
    src = tmp_path / "squad.json"
    data = {
        "data": [
            {
                "paragraphs": [
                    {
                        "context": "Bối cảnh.",
                        "qas": [
                            {
                                "id": "1",
                                "question": "Có?",
                                "answers": [{"text": "có"}],
                                "is_impossible": False,
                            },
                            {
                                "id": "2",
                                "question": "Không?",
                                "answers": [],
                                "is_impossible": True,
                            },
                        ],
                    }
                ]
            }
        ]
    }
    with open(src, "w", encoding="utf-8") as f:
        json.dump(data, f, ensure_ascii=False)
    p = SquadV2Parser(str(src), str(tmp_path / "out"))
    rows = [json.loads(l) for l in open(p.run(), encoding="utf-8")]
    assert rows[0]["answer"] == "có"
    assert rows[1]["answer"] is None


def test_ctx_injector(tmp_path):
    src = tmp_path / "qa.jsonl"
    _write_jsonl(
        src,
        [{"id": "1", "question": "q", "documents": ["chính"], "answer": "a"}] * 5,
    )
    p = CtxInjectorParser(
        str(src),
        str(tmp_path / "out"),
        ctx_pool=["nhiễu một", "nhiễu hai"],
        max_ctx_inject=2,
        seed=0,
    )
    rows = [json.loads(l) for l in open(p.run(), encoding="utf-8")]
    # every record keeps its real doc; some gained noise docs
    assert all("chính" in r["documents"] for r in rows)
    assert any(len(r["documents"]) > 1 for r in rows)


def test_parser_translation_skips_code(tmp_path):
    class Upper(NullTranslator):
        def translate_batch(self, texts, src, dst):
            return [t.upper() for t in texts]

    src = tmp_path / "x.jsonl"
    _write_jsonl(
        src,
        [
            {"instruction": "prose only here", "input": "", "output": "an answer"},
            {
                "instruction": "write code",
                "input": "",
                "output": "def f(x):\n  return {x};\nimport os; class A: pass",
            },
        ],
    )
    p = AlpacaParser(
        str(src), str(tmp_path / "out"), do_translate=True, translator=Upper()
    )
    rows = [json.loads(l) for l in open(p.run(), encoding="utf-8")]
    assert rows[0]["answer"] == "AN ANSWER"  # translated
    assert "def f(x)" in rows[1]["answer"]  # code left untouched
    assert p.stats["translate_skipped_code"] == 1


def test_reformat_data(tmp_path):
    src = tmp_path / "arr.json"
    with open(src, "w") as f:
        json.dump([{"a": 1}, {"a": 2}], f)
    (out,) = reformat_data([str(src)])
    lines = [json.loads(l) for l in open(out)]
    assert lines == [{"a": 1}, {"a": 2}]


def test_registry_lookup():
    assert get_parser("alpaca") is AlpacaParser
    with pytest.raises(KeyError):
        get_parser("nope")


def test_seq2seq_translator_backend():
    """Model-backed translation (the reference's local vinai seq2seq
    path): a tiny t5 drives translate_texts end-to-end — thread pool,
    chunking and resubmit all run over DEVICE generation."""
    import jax

    from vietnamese_qa_system_tpu.data.tokenizer import ByteTokenizer
    from vietnamese_qa_system_tpu.etl.translate import (
        FlakyWrapper,
        Seq2SeqTranslator,
        translate_texts,
    )
    from vietnamese_qa_system_tpu.models import t5
    from vietnamese_qa_system_tpu.models.config import ModelConfig

    cfg = ModelConfig(
        arch="seq2seq", seq2seq_family="t5", vocab_size=512, d_model=32,
        n_heads=2, d_kv=8, n_layers=1, n_decoder_layers=1, d_ff=64,
        mlp_gated=True, tie_embeddings=False, relative_attention_buckets=8,
        attention_bias=False,
    )
    params = t5.init_t5(jax.random.key(0), cfg)
    backend = Seq2SeqTranslator(
        params, cfg, ByteTokenizer(), max_len=32, max_new_tokens=4,
        prompt="{src}-{dst}: {text}",
    )
    texts = [f"sentence {i}" for i in range(6)]
    out = translate_texts(
        texts, FlakyWrapper(backend, fail_times=1), src="en", dst="vi",
        chunk_size=2, max_workers=2,
    )
    assert len(out) == 6
    assert all(isinstance(t, str) for t in out)
