"""CLI smoke tests: each subcommand end-to-end in-process (conftest already
forces the 8-device CPU mesh)."""

import json

import pytest

from vietnamese_qa_system_tpu.cli.main import main


@pytest.fixture
def dataset(tmp_path):
    raw = tmp_path / "raw.jsonl"
    with open(raw, "w", encoding="utf-8") as f:
        for i in range(16):
            f.write(
                json.dumps(
                    {
                        "instruction": f"Chủ đề {i}",
                        "input": "",
                        "output": f"Giải thích {i}",
                    },
                    ensure_ascii=False,
                )
                + "\n"
            )
    docs = tmp_path / "docs.jsonl"
    with open(docs, "w", encoding="utf-8") as f:
        for i in range(8):
            f.write(json.dumps({"doc": f"bài viết {i}: nội dung {i}"}, ensure_ascii=False) + "\n")
    return raw, docs


def test_cli_parse(dataset, tmp_path):
    raw, _ = dataset
    rc = main(
        ["parse", "--parser", "alpaca", "--input", str(raw),
         "--output-dir", str(tmp_path / "out")]
    )
    assert rc == 0
    out = tmp_path / "out" / "AlpacaParser.jsonl"
    assert out.exists()
    assert len(out.read_text().splitlines()) == 16


def test_cli_train_smoke(dataset, tmp_path):
    raw, _ = dataset
    parsed = tmp_path / "p"
    main(["parse", "--parser", "alpaca", "--input", str(raw), "--output-dir", str(parsed)])
    rc = main(
        [
            "train",
            "--train-files", str(parsed / "AlpacaParser.jsonl"),
            "--epochs", "1", "--batch-size", "4", "--max-steps", "2",
            "--max-len", "256", "--use-lora",
            "--checkpoint-dir", str(tmp_path / "ckpt"),
            "--log-dir", str(tmp_path / "logs"),
            "--mesh", '{"data": 1}',
        ]
    )
    assert rc == 0
    assert (tmp_path / "ckpt").exists()


def test_cli_train_seq2seq_t5_smoke(dataset, tmp_path):
    """End-to-end CLI training of the t5-family seq2seq arch (the
    reference's SEQ_2_SEQ_LM task type) over parsed data."""
    raw, _ = dataset
    parsed = tmp_path / "p"
    main(["parse", "--parser", "alpaca", "--input", str(raw),
          "--output-dir", str(parsed)])
    import json as _json
    mcfg_path = tmp_path / "t5.json"
    from vietnamese_qa_system_tpu.models.config import ModelConfig
    mcfg_path.write_text(ModelConfig(
        arch="seq2seq", seq2seq_family="t5", vocab_size=512, d_model=32,
        n_heads=2, d_kv=8, n_layers=1, n_decoder_layers=1, d_ff=64,
        mlp_gated=True, tie_embeddings=False,
        relative_attention_buckets=8, attention_bias=False,
    ).to_json())
    rc = main(
        [
            "train", "--arch", "seq2seq",
            "--model-config", str(mcfg_path),
            "--train-files", str(parsed / "AlpacaParser.jsonl"),
            "--epochs", "1", "--batch-size", "4", "--max-steps", "2",
            "--max-len", "128", "--use-lora",
            "--checkpoint-dir", str(tmp_path / "ckpt"),
            "--log-dir", str(tmp_path / "logs"),
            "--mesh", '{"data": 1}',
        ]
    )
    assert rc == 0


def test_cli_train_no_data(tmp_path):
    rc = main(["train", "--log-dir", str(tmp_path), "--mesh", '{"data": 1}'])
    assert rc == 2


def test_cli_ingest_and_serve(dataset, tmp_path, monkeypatch, capsys):
    _, docs = dataset
    rc = main(
        [
            "ingest",
            "--inputs", str(docs),
            "--index", str(tmp_path / "index"),
            "--db", str(tmp_path / "docs.db"),
            "--capacity", "2048", "--batch-size", "8", "--max-len", "48",
        ]
    )
    assert rc == 0

    answers = iter(["bài viết 3", ""])
    monkeypatch.setattr("builtins.input", lambda *a: next(answers))
    rc = main(
        [
            "serve",
            "--index", str(tmp_path / "index"),
            "--db", str(tmp_path / "docs.db"),
            "--k", "2", "--max-len", "48",
        ]
    )
    assert rc == 0
    out = capsys.readouterr().out
    assert "score=" in out and "bài viết" in out


def test_cli_chat_smoke(monkeypatch, capsys):
    answers = iter(["xin chào", ""])
    monkeypatch.setattr("builtins.input", lambda *a: next(answers))
    rc = main(["chat", "--max-new-tokens", "4", "--max-len", "32"])
    assert rc == 0
    assert "model>" in capsys.readouterr().out


def test_cli_chat_quantized_smoke(monkeypatch, capsys):
    """--quantize int8 decodes over a quantized base (serving-side QLoRA
    capability: 2x less weight HBM traffic per generated token)."""
    answers = iter(["xin chào", ""])
    monkeypatch.setattr("builtins.input", lambda *a: next(answers))
    rc = main(["chat", "--max-new-tokens", "4", "--max-len", "32",
               "--quantize", "int8"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "model>" in out and "int8-quantized base" in out


def test_cli_chat_seq2seq_smoke(monkeypatch, capsys):
    """Chat REPL over an encoder-decoder (the reference's mt5 experiments
    generate interactively in src/test.py): output is decoder-side new
    tokens only, right-padded encoder input."""
    answers = iter(["xin chào", ""])
    monkeypatch.setattr("builtins.input", lambda *a: next(answers))
    rc = main(["chat", "--arch", "seq2seq", "--max-new-tokens", "4",
               "--max-len", "32"])
    assert rc == 0
    assert "model>" in capsys.readouterr().out


def test_cli_convert_ckpt(dataset, tmp_path):
    """train with LoRA -> convert-ckpt to HF dir -> loadable by transformers."""
    raw, _ = dataset
    parsed = tmp_path / "p"
    main(["parse", "--parser", "alpaca", "--input", str(raw), "--output-dir", str(parsed)])
    rc = main(
        [
            "train",
            "--train-files", str(parsed / "AlpacaParser.jsonl"),
            "--epochs", "1", "--batch-size", "4", "--max-steps", "2",
            "--max-len", "256", "--use-lora",
            "--checkpoint-dir", str(tmp_path / "ckpt"),
            "--log-dir", str(tmp_path / "logs"),
            "--mesh", '{"data": 1}',
        ]
    )
    assert rc == 0
    rc = main(
        [
            "convert-ckpt",
            "--checkpoint-dir", str(tmp_path / "ckpt"),
            "--out-dir", str(tmp_path / "exported"),
            "--use-lora", "--format", "hf",
        ]
    )
    assert rc == 0
    import transformers

    model = transformers.AutoModelForCausalLM.from_pretrained(
        str(tmp_path / "exported")
    )
    assert model.config.model_type == "gpt_neox"


def test_cli_chat_draft_model_smoke(monkeypatch, capsys):
    """--speculative draft wires a small draft model through the chat REPL
    (draft-model speculative decoding; greedy output stays token-exact)."""
    answers = iter(["xin chào", ""])
    monkeypatch.setattr("builtins.input", lambda *a: next(answers))
    rc = main(["chat", "--max-new-tokens", "4", "--max-len", "32",
               "--speculative", "draft", "--draft-size", "tiny",
               "--draft-tokens", "3"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "model>" in out


def test_cli_lora_adapter_artifact_roundtrip(dataset, tmp_path):
    """train --use-lora writes an adapter-only adapter.npz; it loads into
    a multi-LoRA serving bank exactly the way `serve --adapter` does."""
    raw, _ = dataset
    parsed = tmp_path / "p"
    main(["parse", "--parser", "alpaca", "--input", str(raw),
          "--output-dir", str(parsed)])
    rc = main(
        [
            "train",
            "--train-files", str(parsed / "AlpacaParser.jsonl"),
            "--epochs", "1", "--batch-size", "4", "--max-steps", "2",
            "--max-len", "256", "--use-lora", "--lora-r", "4",
            "--checkpoint-dir", str(tmp_path / "ckpt"),
            "--log-dir", str(tmp_path / "logs"),
            "--mesh", '{"data": 1}',
        ]
    )
    assert rc == 0
    adapter_path = tmp_path / "ckpt" / "adapter.npz"
    assert adapter_path.exists()

    import jax

    from vietnamese_qa_system_tpu.engine.continuous import ContinuousEngine
    from vietnamese_qa_system_tpu.models import tiny_test
    from vietnamese_qa_system_tpu.models.causal_lm import init_causal_lm
    from vietnamese_qa_system_tpu.models.lora import LoraConfig, init_lora
    from vietnamese_qa_system_tpu.train.checkpoint import load_pytree

    cfg = tiny_test("causal")
    params = init_causal_lm(jax.random.key(0), cfg)
    lcfg = LoraConfig(r=4, alpha=16)
    target = init_lora(jax.random.key(0), params, lcfg)
    loaded = load_pytree(str(adapter_path), target)
    eng = ContinuousEngine(params, cfg, n_slots=1, total=64, buckets=(16,),
                           chunk_steps=4, adapters={"trained": loaded},
                           lora_config=lcfg)
    try:
        out = eng.submit([5, 6, 7], 6, adapter="trained").result(timeout=120)
        assert len(out["ids"]) == 6
    finally:
        eng.close()


def test_cli_serve_reader_strategy_tp(dataset, tmp_path, monkeypatch,
                                      capsys):
    """Multi-chip serving surface: --reader-strategy tp shards the reader
    over the (virtual 8-device) mesh; the REPL QA path must run over the
    sharded params (GSPMD inserts the collectives)."""
    _, docs = dataset
    assert main([
        "ingest",
        "--inputs", str(docs),
        "--index", str(tmp_path / "index"),
        "--db", str(tmp_path / "docs.db"),
        "--capacity", "2048", "--batch-size", "8", "--max-len", "48",
    ]) == 0
    answers = iter(["bài viết 3", ""])
    monkeypatch.setattr("builtins.input", lambda *a: next(answers))
    rc = main([
        "serve",
        "--index", str(tmp_path / "index"),
        "--db", str(tmp_path / "docs.db"),
        "--k", "2", "--max-len", "48",
        "--reader-size", "tiny", "--reader-strategy", "tp",
        "--max-new-tokens", "4",
    ])
    assert rc == 0
    out = capsys.readouterr().out
    assert "reader sharded: strategy=tp over 8 devices" in out


def test_cli_serve_ivf_crossover_warning(dataset, tmp_path, monkeypatch,
                                         capsys):
    """Serving an IVF index with a query batch beyond the measured
    flat-scan crossover (batch > rows_per_shard / (nprobe * cap)) must
    print the advisory (docs/BENCHMARKS.md "IVF vs flat")."""
    _, docs = dataset
    assert main([
        "ingest", "--inputs", str(docs),
        "--index", str(tmp_path / "index"), "--db", str(tmp_path / "d.db"),
        "--capacity", "512", "--batch-size", "8", "--max-len", "48",
    ]) == 0
    assert main([
        "build-ivf", "--index", str(tmp_path / "index"),
        "--out", str(tmp_path / "ivf"), "--clusters", "4", "--nprobe", "2",
    ]) == 0
    capsys.readouterr()

    monkeypatch.setattr("builtins.input", lambda *a: "")
    assert main([
        "serve", "--index", str(tmp_path / "ivf"),
        "--db", str(tmp_path / "d.db"), "--k", "2", "--max-len", "48",
    ]) == 0
    out = capsys.readouterr().out
    # tiny corpus: 256 offline query batch >> crossover — advisory fires
    assert "crossover" in out


def test_cli_serve_index_autoselect(dataset, tmp_path, monkeypatch,
                                    capsys):
    """--ivf-index enables batch-aware dispatch: bulk batch (offline REPL
    pads to 256) on a tiny corpus lands past the crossover -> flat is
    chosen automatically; --index-select ivf forces the probe path and
    still serves hits (VERDICT r3 task 7)."""
    _, docs = dataset
    assert main([
        "ingest", "--inputs", str(docs),
        "--index", str(tmp_path / "index"), "--db", str(tmp_path / "d.db"),
        "--capacity", "512", "--batch-size", "8", "--max-len", "48",
    ]) == 0
    assert main([
        "build-ivf", "--index", str(tmp_path / "index"),
        "--out", str(tmp_path / "ivf"), "--clusters", "4", "--nprobe", "4",
    ]) == 0
    capsys.readouterr()

    answers = iter(["bài viết 3", ""])
    monkeypatch.setattr("builtins.input", lambda *a: next(answers))
    assert main([
        "serve", "--index", str(tmp_path / "index"),
        "--ivf-index", str(tmp_path / "ivf"),
        "--db", str(tmp_path / "d.db"), "--k", "2", "--max-len", "48",
    ]) == 0
    out = capsys.readouterr().out
    assert "index-select: flat" in out and "score=" in out

    answers = iter(["bài viết 3", ""])
    monkeypatch.setattr("builtins.input", lambda *a: next(answers))
    assert main([
        "serve", "--index", str(tmp_path / "index"),
        "--ivf-index", str(tmp_path / "ivf"), "--index-select", "ivf",
        "--db", str(tmp_path / "d.db"), "--k", "2", "--max-len", "48",
    ]) == 0
    out = capsys.readouterr().out
    assert "index-select: ivf" in out and "forced" in out
    assert "score=" in out and "bài viết" in out

    # misuse: --index must be the flat store when --ivf-index is given
    import pytest

    with pytest.raises(SystemExit):
        main([
            "serve", "--index", str(tmp_path / "ivf"),
            "--ivf-index", str(tmp_path / "ivf"),
            "--db", str(tmp_path / "d.db"),
        ])
