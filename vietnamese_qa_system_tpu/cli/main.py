"""Command-line interface: train / parse / ingest / serve / chat / bench.

Capability of the reference's launch layer (reference train.py:15-213 —
~80 flags in six groups — plus the accelerate YAML strategy switch,
scripts/train*.sh, the parser __main__ blocks, setup_docs_db.py ingestion,
heavy_ranker.py querying and the ds_inference.py chat REPL), unified into
one typed subcommand surface.  On TPU there is no external launcher: the
distribution strategy is the --strategy/--mesh flags compiled into the SPMD
program, not a YAML handed to `accelerate launch`.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from typing import Optional

from ..utils.logging import dist_print


# --------------------------------------------------------------------- train


def _add_train_args(p: argparse.ArgumentParser) -> None:
    g = p.add_argument_group("model")
    g.add_argument("--arch", choices=["causal", "seq2seq"], default="causal")
    g.add_argument("--model-size", default="tiny",
                   choices=["tiny", "gpt125m", "gptneo125m", "pythia410m",
                            "llama1b", "qwen2-05b", "bloom560m", "phogpt4b", "mt5small",
                            "seq2seq-small"],
                   help="preset size (reference used gpt-neo-125m / "
                        "pythia-410m; mt5small = its seq2seq experiments)")
    g.add_argument("--model-config", help="path to a ModelConfig json (overrides preset)")
    g.add_argument("--scan-layers", action="store_true",
                   help="stack homogeneous blocks and run them under "
                   "lax.scan (T5X/MaxText-style): compile time O(1) in "
                   "depth + per-layer remat (lower memory; causal only)")
    g.add_argument("--remat-policy", default=None,
                   choices=["full", "dots", "proj_bf16", "none"],
                   help="scan-over-layers remat granularity: full = "
                   "recompute the layer (min memory), dots = save matmul/"
                   "flash outputs and recompute only elementwise glue "
                   "(faster when HBM allows), proj_bf16 = like dots but "
                   "saves round to bf16 (half the bytes; the flagship "
                   "SPEED config with --quantize-base int8: PhoGPT-4B "
                   "measured 68% vs 49% MFU, docs/BENCHMARKS.md round-5)"
                   ", none = no remat")
    g.add_argument("--init-params", help="checkpoint dir or converted-weights .npz to start from")

    g = p.add_argument_group("lora (reference peft group, train.py:33)")
    g.add_argument("--use-lora", action="store_true")
    g.add_argument("--lora-r", type=int, default=8)
    g.add_argument("--lora-alpha", type=int, default=16)
    g.add_argument("--lora-targets", nargs="*", default=None)
    g.add_argument("--quantize-base", choices=["int8", "nf4", "nf4-dq"], default=None,
                   help="quantize the frozen base for LoRA training "
                   "(capability of the reference's --use_8bit/--use_4bit "
                   "BitsAndBytesConfig flags)")
    g.add_argument("--qlora-dequant", choices=["fused", "once", "once_folded"],
                   default="fused",
                   help="dequant placement: at each matmul (fused) or "
                   "once per microbatch before the forward (once — "
                   "faster when HBM headroom allows a live bf16 copy; "
                   "see TrainConfig.qlora_dequant)")

    g = p.add_argument_group("optimization (reference bnb/training groups)")
    g.add_argument("--optimizer", default="adamw",
                   choices=["adamw", "lion", "adamw8bit", "lion8bit"])
    g.add_argument("--lr", type=float, default=2e-4)
    g.add_argument("--weight-decay", type=float, default=0.0)
    g.add_argument("--max-grad-norm", type=float, default=1.0)
    g.add_argument("--lr-scheduler", default="linear",
                   choices=["linear", "cosine", "constant"])
    g.add_argument("--warmup-steps", type=int, default=0)
    g.add_argument("--epochs", type=int, default=1)
    g.add_argument("--max-steps", type=int, default=None)
    g.add_argument("--batch-size", type=int, default=8,
                   help="global batch (= grad-accum * microbatch)")
    g.add_argument("--grad-accum", type=int, default=1)
    g.add_argument("--remat", action="store_true",
                   help="rematerialize the loss (gradient checkpointing)")

    g = p.add_argument_group("distribution (replaces accelerate YAMLs)")
    g.add_argument("--host-offload", choices=["optimizer", "params", "all"],
                   default=None,
                   help="keep state in host memory, streamed through HBM "
                   "per step (capability of the reference's ZeRO-3 CPU "
                   "offload accelerate config)")
    g.add_argument("--strategy", default="dp",
                   choices=["dp", "zero2", "fsdp", "tp", "fsdp_tp"])
    g.add_argument("--mesh", default=None,
                   help='mesh axes as json, e.g. \'{"data": 2, "model": 4}\'')

    g = p.add_argument_group("data (reference dataloader group, train.py:95)")
    g.add_argument("--train-files", nargs="+", required=False, default=[])
    g.add_argument("--train-schemas", nargs="*", default=None,
                   help="schema per file: qa|instruct (default instruct)")
    g.add_argument("--train-fractions", nargs="*", type=float, default=None,
                   help="mix fraction per file (reference --each_train_file_percentage)")
    g.add_argument("--eval-files", nargs="*", default=[])
    g.add_argument("--max-examples", type=int, default=None)
    g.add_argument("--max-len", type=int, default=512)
    g.add_argument("--pack", action="store_true", help="group_texts block packing")
    g.add_argument("--tokenizer", default="byte",
                   help='"byte" or a local HF tokenizer path')

    g = p.add_argument_group("checkpoint / logging")
    g.add_argument("--checkpoint-dir", default=None)
    g.add_argument("--sharded-checkpoint", action="store_true",
                   help="per-host shard files (multi-host topologies); "
                   "restore reassembles onto the current mesh")
    g.add_argument("--save-every-steps", type=int, default=None)
    g.add_argument("--save-every-seconds", type=float, default=None)
    g.add_argument("--async-checkpoint", action="store_true",
                   help="write checkpoints from a background thread "
                   "(device-side snapshot; saves never stall the step loop)")
    g.add_argument("--resume", action="store_true")
    g.add_argument("--log-dir", default="runs/logs")
    g.add_argument("--report-to", default="jsonl", choices=["jsonl", "wandb"])
    g.add_argument("--run-name", default=None)
    g.add_argument("--push-to-hub", default=None, metavar="REPO_ID",
                   help="export the merged model after training and push it "
                   "to a private Hub repo (offline-safe: records a manifest "
                   "when no network/token; reference save_push)")
    g.add_argument("--push-dry-run", action="store_true",
                   help="with --push-to-hub: never upload, only manifest")
    g.add_argument("--log-every", type=int, default=10)
    g.add_argument("--seed", type=int, default=42)

    g = p.add_argument_group("evaluation (reference generation group, train.py:130)")
    g.add_argument("--do-eval", action="store_true")
    g.add_argument("--do-generative-eval", action="store_true")
    g.add_argument("--max-new-tokens", type=int, default=64)
    g.add_argument("--temperature", type=float, default=0.0)
    g.add_argument("--top-k", type=int, default=0)
    g.add_argument("--top-p", type=float, default=1.0)
    g.add_argument("--repetition-penalty", type=float, default=1.0)
    g.add_argument("--no-repeat-ngram-size", type=int, default=0)
    g.add_argument("--min-new-tokens", type=int, default=0)
    g.add_argument("--num-beams", type=int, default=1)
    g.add_argument("--length-penalty", type=float, default=1.0)
    g.add_argument("--speculative", choices=["none", "ngram"], default="none",
                   help="prompt-lookup speculative decoding for generative "
                   "eval (token-exact greedy / distribution-exact sampled; "
                   "causal models without penalties/beams only)")
    g.add_argument("--draft-tokens", type=int, default=8)
    g.add_argument("--draft-ngram", type=int, default=3)
    g.add_argument("--print-samples", type=int, default=0,
                   help="decode and print N training examples before "
                   "training (reference trainer.py:417-437 sample dump)")
    g.add_argument("--profile-steps", type=int, default=0,
                   help="capture a jax.profiler device trace for the first "
                   "N steps")


def _model_config(args):
    from ..models import config as mcfg

    import dataclasses

    if args.model_config:
        with open(args.model_config) as f:
            cfg = mcfg.ModelConfig.from_json(f.read())
        if getattr(args, "scan_layers", False):
            cfg = dataclasses.replace(cfg, scan_layers=True)
        if getattr(args, "remat_policy", None):
            cfg = dataclasses.replace(cfg, remat_policy=args.remat_policy)
        return cfg
    presets = {
        "tiny": lambda: mcfg.tiny_test(args.arch),
        "gpt125m": mcfg.gpt_125m_class,
        "gptneo125m": mcfg.gpt_neo_125m,
        "pythia410m": mcfg.pythia_410m_class,
        "llama1b": mcfg.llama_1b_class,
        "qwen2-05b": mcfg.qwen2_05b_class,
        "bloom560m": mcfg.bloom_560m_class,
        "phogpt4b": mcfg.phogpt_4b_class,
        "mt5small": mcfg.mt5_small_class,
        "seq2seq-small": mcfg.seq2seq_native_small,
    }
    cfg = presets[args.model_size]()
    if cfg.arch != args.arch and args.model_size == "tiny":
        cfg = dataclasses.replace(cfg, arch=args.arch)
    if getattr(args, "scan_layers", False):
        if cfg.arch != "causal" or cfg.attention_layers is not None:
            raise SystemExit(
                "--scan-layers requires a homogeneous causal model"
            )
        cfg = dataclasses.replace(cfg, scan_layers=True)
    if getattr(args, "remat_policy", None):
        cfg = dataclasses.replace(cfg, remat_policy=args.remat_policy)
    return cfg


def _tokenizer(spec: str):
    from ..data import ByteTokenizer, HFTokenizer

    return ByteTokenizer() if spec == "byte" else HFTokenizer(spec)


def _file_specs(files, schemas, fractions):
    from ..data import DataFileSpec

    schemas = schemas or ["instruct"] * len(files)
    fractions = fractions or [1.0] * len(files)
    # reference passes percentages (30 30 15 ...); accept either unit
    fractions = [f / 100.0 if f > 1.0 else f for f in fractions]
    return [
        DataFileSpec(path, schema, frac)
        for path, schema, frac in zip(files, schemas, fractions)
    ]


def cmd_train(args) -> int:
    from ..data import QADataLoader
    from ..models import LoraConfig
    from ..train import TrainConfig, Trainer, generative_eval, perplexity_eval

    model = _model_config(args)
    tok = _tokenizer(args.tokenizer)
    import dataclasses

    if tok.vocab_size > model.vocab_size:
        model = dataclasses.replace(model, vocab_size=tok.vocab_size)

    lora = (
        LoraConfig(
            r=args.lora_r,
            alpha=args.lora_alpha,
            targets=tuple(args.lora_targets) if args.lora_targets else LoraConfig.targets,
        )
        if args.use_lora
        else None
    )
    mesh_axes = json.loads(args.mesh) if args.mesh else None
    cfg = TrainConfig(
        model=model,
        lora=lora,
        optimizer=args.optimizer,
        lr=args.lr,
        weight_decay=args.weight_decay,
        max_grad_norm=args.max_grad_norm,
        schedule=args.lr_scheduler,
        warmup_steps=args.warmup_steps,
        epochs=args.epochs,
        grad_accum=args.grad_accum,
        strategy=args.strategy,
        mesh_axes=mesh_axes,
        host_offload=args.host_offload,
        checkpoint_dir=args.checkpoint_dir,
        sharded_checkpoint=args.sharded_checkpoint,
        save_every_steps=args.save_every_steps,
        save_every_seconds=args.save_every_seconds,
        async_checkpoint=args.async_checkpoint,
        resume=args.resume,
        quantize_base=args.quantize_base,
        qlora_dequant=args.qlora_dequant,
        seed=args.seed,
        log_every=args.log_every,
        log_dir=args.log_dir,
        report_to=args.report_to,
        run_name=args.run_name,
        remat=args.remat,
        profile_steps=args.profile_steps,
    )

    dl = QADataLoader(
        tok,
        task=model.arch if model.arch == "seq2seq" else "causal",
        max_len=args.max_len,
        batch_size=args.batch_size,
        seed=args.seed,
        pack=args.pack,
    )
    train_examples = dl.load_examples(
        _file_specs(args.train_files, args.train_schemas, args.train_fractions),
        max_examples=args.max_examples,
        split="train",
    )
    if not train_examples:
        dist_print(
            f"no training examples loaded (stats: {dl.stats} — "
            f"skipped_too_long>0 means --max-len {args.max_len} is too small "
            "for prompt+answer)",
            file=sys.stderr,
        )
        return 2
    eval_examples = (
        dl.load_examples(
            _file_specs(args.eval_files, None, None),
            max_examples=args.max_examples,
            split="eval",
        )
        if args.eval_files
        else []
    )

    if args.print_samples:
        # decode-and-print sample batches before training (the reference
        # dumps rendered batches on rank 0, trainer.py:417-437)
        from ..data.loader import IGNORE_INDEX

        shown = 0
        for batch in dl.batches(train_examples, shuffle=False):
            for r in range(batch["input_ids"].shape[0]):
                if shown >= args.print_samples:
                    break
                ids_row = batch["input_ids"][r]
                labels_row = batch["labels"][r]
                full = tok.decode([t for t in ids_row if t != tok.pad_id])
                target = tok.decode(
                    [t for t in labels_row if t not in (IGNORE_INDEX, tok.pad_id)]
                )
                dist_print(f"--- sample {shown} ---\n{full}\n>>> target: {target}")
                shown += 1
            if shown >= args.print_samples:
                break

    if args.pack:
        # packing concatenates all token streams and cuts max_len blocks
        # (data/loader.py::pack_examples), so the step count follows the
        # BLOCK count — example count would over-state total_steps and
        # leave the LR schedule mostly undecayed at the true end of training
        total_tokens = sum(len(ex["input_ids"]) for ex in train_examples)
        steps_per_epoch = max((total_tokens // args.max_len) // args.batch_size, 1)
    else:
        steps_per_epoch = max(len(train_examples) // args.batch_size, 1)
    total = args.max_steps or steps_per_epoch * args.epochs
    init_params = None
    if args.init_params:
        init_params = load_converted_params(args.init_params, model)
    trainer = Trainer(cfg, total_steps=total, params=init_params)

    def train_batches(epoch: int):
        # epoch index comes from the trainer so resumed runs reproduce the
        # exact per-epoch shuffle order of the original run (a call-counting
        # closure would drift by the trainer's len() probe on resume).
        return dl.batches(train_examples, epoch=epoch)

    def eval_fn(state, epoch):
        metrics = {}
        params = trainer.merged_params()
        if eval_examples:
            metrics.update(
                perplexity_eval(
                    params, model, dl.batches(eval_examples, shuffle=False),
                    mesh=trainer.mesh,
                )
            )
        if args.do_generative_eval and eval_examples:
            from ..models.generate import GenerationConfig

            gm = generative_eval(
                params,
                model,
                tok,
                _gen_batches(dl, eval_examples, tok, args),
                gen_config=GenerationConfig(
                    max_new_tokens=args.max_new_tokens,
                    temperature=args.temperature,
                    top_k=args.top_k,
                    top_p=args.top_p,
                    repetition_penalty=args.repetition_penalty,
                    no_repeat_ngram_size=args.no_repeat_ngram_size,
                    min_new_tokens=args.min_new_tokens,
                    num_beams=args.num_beams,
                    length_penalty=args.length_penalty,
                    seed=args.seed,
                    speculative=(
                        args.speculative
                        if model.arch == "causal" and args.num_beams == 1
                        and args.repetition_penalty == 1.0
                        and args.no_repeat_ngram_size == 0
                        and args.min_new_tokens == 0
                        else "none"
                    ),
                    draft_tokens=args.draft_tokens,
                    draft_ngram=args.draft_ngram,
                ),
                log_dir=os.path.join(args.log_dir, "predictions"),
                epoch=epoch,
                run_name=args.run_name or "model",
            )
            metrics["gen_tokens_per_s"] = gm["gen_tokens_per_s"]
        dist_print(f"eval @ epoch {epoch}: {metrics}")
        return metrics

    trainer.fit(
        train_batches,
        eval_fn=eval_fn if (args.do_eval and eval_examples) else None,
        max_steps=args.max_steps,
    )
    dist_print(f"training done at step {int(trainer.state['step'])}")
    if trainer.adapter is not None and args.checkpoint_dir:
        # adapter-only artifact: loadable by `serve --adapter NAME=PATH`
        # into the multi-LoRA serving bank (many fine-tunes, one base)
        from ..train.checkpoint import save_pytree

        adapter_path = os.path.join(args.checkpoint_dir, "adapter.npz")
        save_pytree(adapter_path, trainer.state["adapter"])
        dist_print(
            f"adapter saved -> {adapter_path} (r={args.lora_r}, "
            f"alpha={args.lora_alpha})"
        )
    if args.push_to_hub:
        # export merged weights + push (offline-safe: records a manifest
        # when no network/token — capability of the reference's save_push,
        # trainer.py:726-774) and log the export as a tracker artifact
        from ..train.hub import push_to_hub

        export_dir = os.path.join(args.log_dir, "export")
        os.makedirs(export_dir, exist_ok=True)
        merged = trainer.merged_params()
        if args.quantize_base is not None:
            from ..models import dequantize_tree

            merged = dequantize_tree(merged)
        from ..train.checkpoint import save_pytree

        save_pytree(os.path.join(export_dir, "params.npz"), merged)
        with open(os.path.join(export_dir, "config.json"), "w") as f:
            f.write(model.to_json())
        result = push_to_hub(
            export_dir, args.push_to_hub, dry_run=args.push_dry_run
        )
        trainer.tracker.log_artifact(export_dir, name=args.push_to_hub)
        if result["pushed"]:
            dist_print(f"pushed to hub repo {args.push_to_hub}")
        else:
            dist_print(
                f"hub push recorded offline ({result['reason']}) -> "
                f"{export_dir}/push_manifest.json"
            )
    return 0


def _gen_batches(dl, examples, tok, args):
    """Left-padded prompt-only batches for generative eval."""
    import numpy as np

    from ..data.loader import IGNORE_INDEX

    bs = args.batch_size
    for i in range(0, len(examples), bs):
        # keep the tail: dropping it silently yields ZERO batches when the
        # eval set is smaller than batch_size (a short final batch costs one
        # extra eval-only compile, which is fine)
        group = examples[i : i + bs]
        prompts = []
        for ex in group:
            if dl.task == "seq2seq":
                # encoder input IS the prompt; labels carry no IGNORE
                # prompt-prefix to count for seq2seq examples
                prompts.append(list(ex["input_ids"]))
            else:
                ids = ex["input_ids"]
                labels = ex["labels"]
                n_prompt = sum(1 for l in labels if l == IGNORE_INDEX)
                prompts.append(ids[:n_prompt])
        n = len(group)
        width = max(max(len(p) for p in prompts), 1)
        ids = np.full((n, width), tok.pad_id, np.int32)
        mask = np.zeros((n, width), np.int32)
        for r, pr in enumerate(prompts):
            ids[r, width - len(pr):] = pr
            mask[r, width - len(pr):] = 1
        yield {"input_ids": ids, "attention_mask": mask}


def load_converted_params(path: str, model_cfg):
    """Load params from a framework checkpoint dir (step_N/state.npz), a
    flat .npz, or a LOCAL HF model directory (config.json with a causal
    model_type gpt_neox / gpt_neo / gpt2 / llama / mistral / bloom, or a
    seq2seq t5 / mt5 — converted via models/convert_hf.py).  When the
    target config uses scan_layers, imported list-form blocks are
    stacked."""
    from ..train.checkpoint import CheckpointManager
    from ..train.trainer import init_model_params

    import jax

    if os.path.isdir(path) and os.path.exists(os.path.join(path, "config.json")):
        with open(os.path.join(path, "config.json")) as f:
            model_type = json.load(f).get("model_type")
        if model_type in (
            "gpt_neox", "gpt_neo", "gpt2", "llama", "mistral", "bloom"
        ):
            from ..models.convert_hf import load_causal_auto

            params, _ = load_causal_auto(path)
            if getattr(model_cfg, "scan_layers", False):
                from ..models.causal_lm import stack_blocks

                params = stack_blocks(params)
            return params
        if model_type in ("t5", "mt5", "longt5"):
            from ..models.convert_hf import load_seq2seq_auto

            params, _ = load_seq2seq_auto(path)
            return params
    target = init_model_params(model_cfg, jax.random.key(0))
    if os.path.isdir(path):
        mgr = CheckpointManager(path)
        state, _ = mgr.restore({"params": target})
        if state is None:
            raise FileNotFoundError(f"no checkpoints under {path}")
        return state["params"]
    from ..train.checkpoint import load_pytree

    return load_pytree(path, target)


# --------------------------------------------------------------------- parse


def cmd_parse(args) -> int:
    from ..etl import get_parser

    cls = get_parser(args.parser)
    kwargs = dict(seed=args.seed, do_translate=args.translate)
    if args.ctx_pool:
        with open(args.ctx_pool) as f:
            kwargs["ctx_pool"] = [line.strip() for line in f if line.strip()]
    parser = cls(args.input, args.output_dir, **kwargs)
    out = parser.run()
    dist_print(f"wrote {parser.stats['converted']} records -> {out}")
    return 0


# -------------------------------------------------------------------- ingest


def _encoder_from_spec(spec: str, seed: int):
    """Encoder by preset name or LOCAL HF BERT directory (sentence-
    transformers MiniLM-class import via models/convert_hf.py)."""
    import jax

    from ..models import minilm_class, mpnet_class, tiny_test
    from ..models.encoder import init_encoder

    if os.path.isdir(spec):
        from ..models.convert_hf import load_encoder_auto

        return load_encoder_auto(spec)
    presets = {
        "tiny": lambda: tiny_test("encoder"),
        "minilm": minilm_class,
        "mpnet": mpnet_class,
    }
    cfg = presets[spec]()
    return init_encoder(jax.random.key(seed), cfg), cfg



def cmd_ingest(args) -> int:
    from ..core.mesh import SHARD_AXIS, create_mesh
    from ..engine import BM25Index, DocStore, IngestPipeline, VectorStore
    from ..etl.parser import load_json_or_jsonl

    params, cfg = _encoder_from_spec(args.encoder, args.seed)
    tok = _tokenizer(args.tokenizer)

    mesh = create_mesh({SHARD_AXIS: args.shards}) if args.shards > 1 else None
    if os.path.exists(os.path.join(args.index, "meta.json")):
        store = VectorStore.load(args.index, mesh=mesh)
    else:
        store = VectorStore(args.capacity, cfg.d_model, mesh=mesh, dtype=args.dtype)
    docstore = DocStore(args.db)
    lexical = None
    if args.hybrid:
        bm25_path = os.path.join(args.index, "bm25.json")
        lexical = (
            BM25Index.load(bm25_path) if os.path.exists(bm25_path) else BM25Index()
        )
    pipe = IngestPipeline(
        params, cfg, tok, store, docstore,
        batch_size=args.batch_size, max_len=args.max_len, lexical=lexical,
    )
    for path in args.inputs:
        rows = load_json_or_jsonl(path)
        docs = [r[args.text_field] if isinstance(r, dict) else str(r) for r in rows]
        sources = [path] * len(docs)
        ids = pipe.add_documents(docs, sources, chunk_size=args.chunk_size)
        dist_print(f"{path}: ingested {len(ids)} chunks (store size {store.size})")
    store.save(args.index)
    if lexical is not None:
        lexical.save(os.path.join(args.index, "bm25.json"))
        dist_print(f"bm25 term index saved ({lexical.n_docs} docs)")
    dist_print(f"index saved -> {args.index}; docs in {args.db}")
    return 0


def cmd_build_ivf(args) -> int:
    """Cluster a flat index into an IVF ANN index (the faiss-IVF
    capability behind the reference's txtai backend; engine/ivf.py).
    Serving loads either directory transparently (meta.json type)."""
    from ..core.mesh import SHARD_AXIS, create_mesh
    from ..engine import IVFIndex, VectorStore

    mesh = create_mesh({SHARD_AXIS: args.shards}) if args.shards > 1 else None
    store = VectorStore.load(args.index, mesh=mesh, capacity=0)
    ivf = IVFIndex.build(
        store,
        n_clusters=args.clusters,
        nprobe=args.nprobe,
        cap_mult=args.cap_mult,
        kmeans_iters=args.kmeans_iters,
        seed=args.seed,
    )
    ivf.save(args.out)
    spill = int(ivf._spill_counts.sum())
    dist_print(
        f"IVF index saved -> {args.out}: {ivf.size} vectors, "
        f"{ivf.n_clusters} clusters x cap {ivf.cap} per shard, "
        f"{spill} spilled ({100.0 * spill / max(ivf.size, 1):.2f}%), "
        f"default nprobe {ivf.nprobe}"
    )
    return 0


# --------------------------------------------------------------------- serve


def cmd_serve(args) -> int:
    """Interactive retrieval loop (capability of heavy_ranker.py's query
    path as a usable REPL)."""
    import jax

    from ..engine import BM25Index, DocStore, Retriever, load_index

    params, cfg = _encoder_from_spec(args.encoder, args.seed)
    tok = _tokenizer(args.tokenizer)
    # shrink-to-fit: query cost scans the slab, not the build-time
    # headroom (a 40-doc dev index built with --capacity 1M would
    # otherwise scan 1M rows per query); --capacity N keeps room for
    # online /ingest growth.  IVF directories (cli build-ivf) load as
    # IVFIndex transparently.
    store = load_index(args.index, capacity=args.capacity)
    docstore = DocStore(args.db)
    from ..engine.ivf import IVFIndex, ivf_crossover_batch, select_serving_index

    # serving dispatches full query_batch-sized blocks per top-k call
    qb_est = args.max_batch if args.port is not None else 256
    if args.ivf_index is not None:
        # batch-aware index selection (measured crossover ~B=25 at 1M
        # rows / nprobe 8 / cap 512 — docs/BENCHMARKS.md "IVF vs flat"):
        # IVF probing is 7.9x faster at interactive batch but reads
        # ~nprobe*cap rows PER QUERY, so bulk batches flip to the flat
        # scan's amortized corpus sweep
        ivf = load_index(args.ivf_index)
        if not isinstance(ivf, IVFIndex):
            raise SystemExit(f"--ivf-index {args.ivf_index} is not an "
                             "IVF directory (cli build-ivf output)")
        if isinstance(store, IVFIndex):
            raise SystemExit("--index must be the FLAT store when "
                             "--ivf-index is given")
        if args.index_select == "flat":
            chosen, cross = store, None
        elif args.index_select == "ivf":
            chosen, cross = ivf, None
        else:
            chosen, cross = select_serving_index(store, ivf, qb_est)
        kind = "ivf" if isinstance(chosen, IVFIndex) else "flat"
        dist_print(
            f"index-select: {kind} (query batch {qb_est}"
            + (f", crossover ~{cross}" if cross is not None else ", forced")
            + ")"
        )
        store = chosen
    elif isinstance(store, IVFIndex):
        # IVF-only serving: warn past the crossover (no flat slab to
        # fall back to — pass the flat dir via --index + --ivf-index
        # for automatic selection)
        crossover = ivf_crossover_batch(store)
        if qb_est > crossover:
            rows_per_shard = store.size // max(store.n_shards, 1)
            dist_print(
                f"WARNING: IVF index with query batch {qb_est} > "
                f"crossover ~{crossover} (= {rows_per_shard} rows / "
                f"(nprobe {store.nprobe} * cap {store.cap} * 10)); "
                "probed-bucket reads will exceed the flat scan's "
                "amortized cost. Lower --max-batch, rebuild with a "
                "smaller build-ivf --nprobe, or pass the flat dir as "
                "--index with --ivf-index for automatic selection."
            )
    lexical = None
    bm25_path = os.path.join(args.index, "bm25.json")
    if args.hybrid_weight < 1.0 and os.path.exists(bm25_path):
        lexical = BM25Index.load(bm25_path)
        dist_print(f"hybrid retrieval on (weight {args.hybrid_weight})")
    # in HTTP mode every dispatch pads to query_batch — size it to the
    # micro-batch cap, not the offline default of 256, or each small
    # batch does 8x+ the needed encoder/top-k work
    qbatch = args.max_batch if args.port is not None else 256
    retriever = Retriever(
        params, cfg, tok, store, docstore, max_len=args.max_len,
        lexical=lexical, hybrid_weight=args.hybrid_weight,
        mode=args.search_mode, query_batch=qbatch,
    )

    qa = None
    if args.reader_size:
        # full QA loop: retrieve + generate (engine/qa.py)
        from ..engine import QAPipeline
        from ..models import config as mcfg
        from ..train.trainer import init_model_params

        presets_r = {
            "tiny": lambda: mcfg.tiny_test("causal"),
            "gpt125m": mcfg.gpt_125m_class,
            "gptneo125m": mcfg.gpt_neo_125m,
            "pythia410m": mcfg.pythia_410m_class,
            "qwen2-05b": mcfg.qwen2_05b_class,
            "bloom560m": mcfg.bloom_560m_class,
        "phogpt4b": mcfg.phogpt_4b_class,
            "tiny-s2s": lambda: mcfg.tiny_test("seq2seq"),
            "mt5small": mcfg.mt5_small_class,
        }
        rcfg = presets_r[args.reader_size]()
        import dataclasses as _dc

        if tok.vocab_size > rcfg.vocab_size:
            rcfg = _dc.replace(rcfg, vocab_size=tok.vocab_size)
        if args.reader_params:
            rparams = load_converted_params(args.reader_params, rcfg)
        else:
            rparams = init_model_params(rcfg, jax.random.key(args.seed + 1))
            dist_print("(no --reader-params: answering with RANDOM weights)")
        if not getattr(args, "keep_stacked", False):
            from ..models.families import unstack_for_decode

            new_rparams = unstack_for_decode(rparams, rcfg)
            if new_rparams is not rparams:
                dist_print("unstacked scan-layers reader blocks for decode "
                           "(--keep-stacked keeps the training layout)")
            rparams = new_rparams
        if args.reader_quantize:
            from ..models import quantize_dense_tree

            rparams = quantize_dense_tree(rparams, args.reader_quantize)
            dist_print(f"reader decodes over a {args.reader_quantize} base")
        if args.reader_strategy:
            # multi-chip serving: shard the reader across the device mesh
            # (tp = head/MLP column/row-parallel; GSPMD propagates the
            # sharding through prefill/decode_chunk — engine streams are
            # pinned bit-identical to unsharded in tests/test_continuous.py)
            if args.reader_quantize:
                raise SystemExit(
                    "--reader-strategy shards plain bf16 readers; drop "
                    "--reader-quantize (int8/nf4 packing hides the dims "
                    "the sharding rules split)"
                )
            from ..core.mesh import create_mesh
            from ..parallel.sharding import param_sharding, shard_params

            n_dev = len(jax.devices())
            axes = {"model": n_dev}
            mesh = create_mesh(axes)
            rparams = shard_params(
                rparams, param_sharding(rparams, mesh,
                                        strategy=args.reader_strategy)
            )
            dist_print(
                f"reader sharded: strategy={args.reader_strategy} over "
                f"{n_dev} devices"
            )
        reader_draft = None
        if args.speculative == "draft" and rcfg.arch == "causal":
            ddcfg = presets_r[args.reader_draft_size]()
            if ddcfg.vocab_size != rcfg.vocab_size:
                ddcfg = _dc.replace(ddcfg, vocab_size=rcfg.vocab_size)
            if args.reader_draft_params:
                ddparams = load_converted_params(
                    args.reader_draft_params, ddcfg
                )
            else:
                ddparams = init_model_params(
                    ddcfg, jax.random.key(args.seed + 7)
                )
                dist_print(
                    "(no --reader-draft-params: drafting with RANDOM weights)"
                )
            reader_draft = (ddparams, ddcfg)
        qa = QAPipeline(
            retriever, rparams, rcfg, tok,
            k=args.k, min_score=args.min_score,
            speculative=args.speculative,
            draft_tokens=args.draft_tokens,
            draft_ngram=args.draft_ngram,
            draft=reader_draft,
        )

    if args.port is not None:
        # production mode: HTTP JSON API with request micro-batching —
        # concurrent requests share one batched TPU dispatch
        # (engine/server.py) instead of the reference's one-query-one-
        # dispatch loop (heavy_ranker.py:97-115)
        from ..engine import IngestPipeline, ServingApp, make_server

        ingest = IngestPipeline(
            params, cfg, tok, store, docstore,
            batch_size=args.max_batch, max_len=args.max_len,
            lexical=lexical,
        )
        gen_engine = None
        if args.continuous_slots > 0:
            # raw LM completions via continuous batching: requests join
            # the always-running slot scheduler (engine/continuous.py);
            # causal AND seq2seq readers are slot-schedulable
            if qa is None:
                raise SystemExit(
                    "--continuous-slots needs a reader (--reader-size)"
                )
            from ..engine import ContinuousEngine

            adapters = None
            lcfg = None
            if args.adapter:
                # multi-LoRA serving: NAME=PATH adapter.npz artifacts
                # (written by `train --use-lora --checkpoint-dir`) over
                # the shared reader base
                from ..models.lora import LoraConfig, init_lora
                from ..train.checkpoint import load_pytree

                lcfg = LoraConfig(
                    r=args.adapter_r, alpha=args.adapter_alpha,
                    targets=tuple(args.adapter_targets)
                    if args.adapter_targets else LoraConfig.targets,
                )
                target = init_lora(jax.random.key(0), rparams, lcfg)
                adapters = {}
                for spec in args.adapter:
                    name, _, path = spec.partition("=")
                    if not name or not path:
                        raise SystemExit(
                            f"--adapter expects NAME=PATH, got {spec!r}"
                        )
                    adapters[name] = load_pytree(path, target)
                dist_print(
                    f"adapters loaded: {sorted(adapters)} "
                    f"(r={lcfg.r}, alpha={lcfg.alpha})"
                )
            gen_engine = ContinuousEngine(
                rparams, rcfg,
                n_slots=args.continuous_slots,
                total=min(rcfg.max_seq_len, args.gen_total),
                chunk_steps=args.gen_chunk_steps,
                eos_id=tok.eos_id,
                default_max_new=args.max_new_tokens,
                adapters=adapters,
                lora_config=lcfg,
                prefix_cache_mb=args.prefix_cache_mb,
                speculative=args.gen_speculative,
                draft_tokens=args.draft_tokens,
                draft_ngram=args.draft_ngram,
                kv_dtype=args.kv_quant,
                prefill_chunk=args.prefill_chunk,
            )
            dist_print(
                f"/generate: continuous batching, {args.continuous_slots} "
                f"slots x {gen_engine.total} cache, buckets "
                f"{gen_engine.buckets}, chunk {args.gen_chunk_steps}"
            )
        app = ServingApp(
            retriever, qa, ingest=ingest, gen=gen_engine,
            tokenizer=tok if gen_engine is not None else None,
            k=args.k, max_k=args.max_k,
            max_batch=args.max_batch,
            max_wait_s=args.batch_wait_ms / 1000.0,
        )
        httpd = make_server(app, host=args.host, port=args.port)
        dist_print(
            f"serving {store.size} vectors on "
            f"http://{httpd.server_address[0]}:{httpd.server_address[1]} "
            f"(max_batch={args.max_batch}, wait={args.batch_wait_ms}ms; "
            f"endpoints: /healthz /search /ingest"
            f"{' /qa' if qa else ''}"
            f"{' /generate' if gen_engine is not None else ''})"
        )
        # SIGTERM (the normal supervisor/container stop signal) must run
        # the same graceful path as ^C so ingested vectors get persisted
        import signal

        def _term(*_):
            # NB: must not call httpd.shutdown() here — the handler runs
            # ON the main thread inside serve_forever, and shutdown()
            # waits for serve_forever to exit: deadlock.  Raising unwinds
            # into the same except/finally as ^C.
            raise KeyboardInterrupt

        signal.signal(signal.SIGTERM, _term)
        try:
            httpd.serve_forever()
        except KeyboardInterrupt:
            pass
        finally:
            httpd.server_close()
            app.close()
            if app.dirty:
                # make /ingest writes survive a restart — the docstore is
                # already durable sqlite; vectors and BM25 are in-memory
                store.save(args.index)
                if lexical is not None:
                    lexical.save(bm25_path)
                dist_print(
                    f"index persisted -> {args.index} ({store.size} vectors)"
                )
        return 0

    dist_print(f"index: {store.size} vectors; type a query (empty line quits)")
    while True:
        try:
            query = input("query> ").strip()
        except EOFError:
            break
        if not query:
            break
        if qa is not None:
            ans = qa.answer([query])[0]
            tag = "(refused)" if ans.refused else ""
            print(f"answer{tag}> {ans.answer}")
            for rank, (doc, score) in enumerate(zip(ans.contexts, ans.scores)):
                print(f"  ctx {rank + 1}. score={score:.3f} {doc[:120]}")
            continue
        results = retriever.search([query], k=args.k)[0]
        for rank, r in enumerate(results):
            doc = (r.doc or "")[:160].replace("\n", " ")
            print(f"  {rank + 1}. [{r.id}] score={r.score:.3f} {doc}")
    return 0


# ---------------------------------------------------------------------- chat


def cmd_chat(args) -> int:
    """Interactive generation REPL (capability of the reference's DeepSpeed
    TP chat script, reference src/models/model_utils/ds_inference.py:45-60:
    load base + adapter, wrap for inference, loop on input)."""
    import numpy as np

    from ..data import RESPONSE_PREFIX, QUESTION_PREFIX, batch_encode
    from ..models import generate as gen_mod
    from ..train.trainer import init_model_params

    import jax

    model = _model_config(args)
    tok = _tokenizer(args.tokenizer)
    import dataclasses

    if tok.vocab_size > model.vocab_size:
        model = dataclasses.replace(model, vocab_size=tok.vocab_size)
    if args.init_params:
        params = load_converted_params(args.init_params, model)
    else:
        params = init_model_params(model, jax.random.key(args.seed))
        dist_print("(no --init-params given: chatting with RANDOM weights)")
    if not getattr(args, "keep_stacked", False):
        # decode never pays scan's compile-depth advantage back, and scan's
        # per-iteration weight slices stream at ~55% of HBM rate
        # (models/families.py::unstack_for_decode)
        from ..models.families import unstack_for_decode

        new_params = unstack_for_decode(params, model)
        if new_params is not params:
            dist_print("unstacked scan-layers blocks for decode "
                       "(--keep-stacked keeps the training layout)")
        params = new_params
    if args.quantize:
        # decode is weight-bandwidth-bound at small batch: int8 halves and
        # nf4 quarters the bytes streamed from HBM per generated token
        # (dequant-at-use in layers.dense — same path QLoRA training uses)
        from ..models import quantize_dense_tree

        params = quantize_dense_tree(params, args.quantize)
        dist_print(f"decoding over a {args.quantize}-quantized base")
    use_spec = (
        args.speculative != "none"
        and model.arch == "causal"
        and args.num_beams == 1
    )
    draft = None
    if use_spec and args.speculative == "draft":
        from ..models import config as mcfg

        draft_presets = {
            "tiny": lambda: mcfg.tiny_test("causal"),
            "gpt125m": mcfg.gpt_125m_class,
            "gptneo125m": mcfg.gpt_neo_125m,
            "pythia410m": mcfg.pythia_410m_class,
            "qwen2-05b": mcfg.qwen2_05b_class,
            "bloom560m": mcfg.bloom_560m_class,
        "phogpt4b": mcfg.phogpt_4b_class,
        }
        dcfg = draft_presets[args.draft_size]()
        # the only hard invariant: draft vocab == target vocab (model was
        # already widened to the tokenizer above)
        if dcfg.vocab_size != model.vocab_size:
            dcfg = dataclasses.replace(dcfg, vocab_size=model.vocab_size)
        if args.draft_params:
            dparams = load_converted_params(args.draft_params, dcfg)
        else:
            dparams = init_model_params(dcfg, jax.random.key(args.seed + 7))
            dist_print("(no --draft-params: drafting with RANDOM weights)")
        draft = (dparams, dcfg)
    dist_print("chat REPL — empty line quits")
    while True:
        try:
            text = input("user> ").strip()
        except EOFError:
            break
        if not text:
            break
        prompt = f"{QUESTION_PREFIX}\n{text}\n\n{RESPONSE_PREFIX}\n"
        # seq2seq encoders take right-padded inputs; causal decode needs
        # left padding so generation continues from the prompt's last token
        pad_side = "right" if model.arch == "seq2seq" else "left"
        ids, mask = batch_encode(tok, [prompt], args.max_len, pad_side=pad_side)
        gen = gen_mod.GenerationConfig(
            max_new_tokens=args.max_new_tokens,
            temperature=args.temperature,
            num_beams=args.num_beams,
            speculative=args.speculative if use_spec else "none",
            draft_tokens=args.draft_tokens,
            draft_ngram=args.draft_ngram,
        )
        out = gen_mod.generate_with_config(
            params, model, np.asarray(ids), np.asarray(mask), gen,
            eos_id=tok.eos_id,
            draft=draft,
        )
        # causal output includes the prompt; seq2seq output is new tokens
        new_tokens = (
            np.asarray(out)[0]
            if model.arch == "seq2seq"
            else np.asarray(out)[0, ids.shape[1]:]
        )
        completion = tok.decode(
            [t for t in new_tokens if t not in (tok.pad_id, tok.eos_id)]
        )
        print(f"model> {completion}")
    return 0


# -------------------------------------------------------------- convert-ckpt


def cmd_convert_ckpt(args) -> int:
    """Restore a training checkpoint (merging any LoRA adapter) and export
    it as an HF GPT-NeoX directory or a flat npz."""
    from ..models import LoraConfig
    from ..train import TrainConfig, Trainer

    model = _model_config(args)
    lora = (
        LoraConfig(
            r=args.lora_r,
            alpha=args.lora_alpha,
            targets=tuple(args.lora_targets) if args.lora_targets else LoraConfig.targets,
        )
        if args.use_lora
        else None
    )
    cfg = TrainConfig(
        model=model,
        lora=lora,
        optimizer=args.optimizer,
        checkpoint_dir=args.checkpoint_dir,
        resume=True,
        quantize_base=args.quantize_base,
        seed=args.seed,
        mesh_axes={"data": 1},
        log_dir=os.path.join(args.out_dir, "_logs"),
    )
    trainer = Trainer(cfg, total_steps=1)
    if trainer.start_step == 0:
        dist_print(f"no checkpoint found under {args.checkpoint_dir}", file=sys.stderr)
        return 2
    merged = trainer.merged_params()
    if args.quantize_base is not None:
        from ..models import dequantize_tree

        merged = dequantize_tree(merged)
    if args.format == "hf":
        if model.arch == "causal":
            from ..models.convert_hf import export_causal_auto

            export_causal_auto(merged, model, args.out_dir)
        elif model.arch == "seq2seq" and model.seq2seq_family == "t5":
            from ..models.convert_hf import export_t5

            # exported special-token ids must match the tokenizer the model
            # was TRAINED with (ByteTokenizer: eos=2; HF t5 default: eos=1)
            # or HF generate() stops on the wrong token
            tok = _tokenizer(args.tokenizer)
            export_t5(
                merged, model, args.out_dir,
                pad_token_id=tok.pad_id, eos_token_id=tok.eos_id,
            )
        else:
            dist_print(
                "hf export supports causal and t5-family seq2seq models",
                file=sys.stderr,
            )
            return 2
    else:
        from ..train.checkpoint import save_pytree

        os.makedirs(args.out_dir, exist_ok=True)
        save_pytree(os.path.join(args.out_dir, "params.npz"), merged)
        with open(os.path.join(args.out_dir, "config.json"), "w") as f:
            f.write(model.to_json())
    dist_print(f"exported step-{trainer.start_step} model -> {args.out_dir}")
    return 0


# --------------------------------------------------------------------- bench


def cmd_bench(args) -> int:
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(__file__))))
    import bench

    bench.main()
    return 0


# ---------------------------------------------------------------------- main


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="vqa_tpu",
        description="TPU-native Vietnamese QA framework CLI",
    )
    p.add_argument(
        "--platform",
        default=None,
        choices=["cpu", "tpu"],
        help="force the JAX backend (jax.config route — env vars can be "
        "overridden by site customizations)",
    )
    p.add_argument(
        "--cpu-devices",
        type=int,
        default=None,
        help="with --platform cpu: number of virtual CPU devices (mesh testing)",
    )
    sub = p.add_subparsers(dest="command", required=True)

    pt = sub.add_parser("train", help="fine-tune a model")
    _add_train_args(pt)
    pt.set_defaults(fn=cmd_train)

    pp = sub.add_parser("parse", help="run a dataset parser (offline ETL)")
    pp.add_argument("--parser", required=True)
    pp.add_argument("--input", required=True)
    pp.add_argument("--output-dir", required=True)
    pp.add_argument("--translate", action="store_true")
    pp.add_argument("--ctx-pool", default=None,
                    help="file of passages for random context injection")
    pp.add_argument("--seed", type=int, default=42)
    pp.set_defaults(fn=cmd_parse)

    pi = sub.add_parser("ingest", help="build the retrieval index")
    pi.add_argument("--inputs", nargs="+", required=True)
    pi.add_argument("--text-field", default="doc")
    pi.add_argument("--index", required=True)
    pi.add_argument("--db", required=True)
    pi.add_argument("--encoder", default="tiny",
                    help="preset (tiny|minilm|mpnet) or local HF BERT dir")
    pi.add_argument("--tokenizer", default="byte")
    pi.add_argument("--capacity", type=int, default=1 << 20)
    pi.add_argument("--dtype", default="bf16",
                    choices=["bf16", "int8", "int8_res"],
                    help="index compression: int8 halves memory (recall "
                    "~0.98); int8_res keeps bf16-equal memory but scans "
                    "half the bytes, two-stage re-rank restores recall")
    pi.add_argument("--shards", type=int, default=1)
    pi.add_argument("--chunk-size", type=int, default=512)
    pi.add_argument("--batch-size", type=int, default=256)
    pi.add_argument("--max-len", type=int, default=128)
    pi.add_argument("--hybrid", action="store_true",
                    help="also build a BM25 term index for hybrid retrieval "
                    "(capability of txtai hybrid=True, heavy_ranker.py:78)")
    pi.add_argument("--seed", type=int, default=42)
    pi.set_defaults(fn=cmd_ingest)

    pf = sub.add_parser(
        "build-ivf", help="cluster a flat index into an IVF ANN index"
    )
    pf.add_argument("--index", required=True, help="flat index dir (cli ingest)")
    pf.add_argument("--out", required=True, help="output IVF index dir")
    pf.add_argument("--clusters", type=int, default=None,
                    help="cluster count (default ~4*sqrt(N))")
    pf.add_argument("--nprobe", type=int, default=8)
    pf.add_argument("--cap-mult", type=float, default=1.6)
    pf.add_argument("--kmeans-iters", type=int, default=10)
    pf.add_argument("--shards", type=int, default=1)
    pf.add_argument("--seed", type=int, default=0)
    pf.set_defaults(fn=cmd_build_ivf)

    ps = sub.add_parser("serve", help="interactive retrieval REPL")
    ps.add_argument("--index", required=True)
    ps.add_argument("--ivf-index", default=None,
                    help="optional IVF directory (cli build-ivf) over the "
                    "same corpus as --index (the flat store); serve then "
                    "auto-selects per batch: IVF at interactive batch, "
                    "flat past the measured crossover")
    ps.add_argument("--index-select", default="auto",
                    choices=["auto", "flat", "ivf"],
                    help="override the automatic IVF/flat choice when "
                    "--ivf-index is given")
    ps.add_argument("--db", required=True)
    ps.add_argument("--capacity", type=int, default=0,
                    help="index slab capacity at serve time: 0 = shrink "
                    "to the stored corpus (query scans the slab, so fit "
                    "is fastest); set larger to leave headroom for "
                    "online POST /ingest growth")
    ps.add_argument("--encoder", default="tiny",
                    help="preset (tiny|minilm|mpnet) or local HF BERT dir")
    ps.add_argument("--tokenizer", default="byte")
    ps.add_argument("--k", type=int, default=5)
    ps.add_argument("--max-len", type=int, default=128)
    ps.add_argument("--seed", type=int, default=42)
    ps.add_argument("--reader-size", default=None,
                    choices=["tiny", "gpt125m", "gptneo125m", "pythia410m",
                             "qwen2-05b", "bloom560m", "phogpt4b",
                             "tiny-s2s", "mt5small"],
                    help="enable full QA: retrieve + generate with a reader "
                    "LM (tiny-s2s/mt5small serve encoder-decoder readers)")
    ps.add_argument("--reader-params", default=None)
    ps.add_argument("--reader-strategy", choices=["tp", "fsdp_tp"],
                    default=None,
                    help="shard the reader LM over ALL visible devices "
                    "(multi-chip serving; tp = column/row-parallel "
                    "heads/MLP). Streams stay bit-identical to unsharded")
    ps.add_argument("--reader-quantize",
                    choices=["int8", "int8c", "nf4", "nf4-dq"], default=None,
                    help="quantize the reader's dense weights for decode; "
                    "int8c (per-output-channel scales) decodes through "
                    "the w8 GEMM kernel — int8 streamed at byte rate, "
                    "measured 3.4x the bf16 matmul at decode shapes "
                    "(ops/w8_matmul.py). int8c has ONE scale per output "
                    "channel (coarser than blockwise int8; no LLM.int8-"
                    "style outlier split) — check quality on your "
                    "checkpoint before production (models/quantize.py)")
    ps.add_argument("--min-score", type=float, default=0.2)
    ps.add_argument("--speculative", choices=["none", "ngram", "draft"],
                    default="ngram",
                    help="speculative decoding for the reader: ngram = "
                    "prompt-lookup (RAG answers quote contexts, so drafts "
                    "hit often — default on for causal readers), draft = "
                    "small draft model (--reader-draft-size/-params)")
    ps.add_argument("--draft-tokens", type=int, default=8)
    ps.add_argument("--draft-ngram", type=int, default=3)
    ps.add_argument("--reader-draft-size", default="tiny",
                    choices=["tiny", "gpt125m", "gptneo125m", "pythia410m",
                             "qwen2-05b", "bloom560m"],
                    help="draft model preset for --speculative draft")
    ps.add_argument("--reader-draft-params", default=None,
                    help="checkpoint/npz for the reader draft model")
    ps.add_argument("--port", type=int, default=None,
                    help="serve an HTTP JSON API on this port instead of "
                    "the REPL (0 = ephemeral); micro-batches concurrent "
                    "requests into one TPU dispatch")
    ps.add_argument("--host", default="127.0.0.1")
    ps.add_argument("--max-batch", type=int, default=32,
                    help="max requests fused into one dispatch")
    ps.add_argument("--max-k", type=int, default=None,
                    help="largest per-request k the API accepts "
                    "(default: --k); one top-k program is compiled at "
                    "this value and responses are sliced")
    ps.add_argument("--batch-wait-ms", type=float, default=5.0,
                    help="how long a batch waits for co-riders after its "
                    "first request")
    ps.add_argument("--hybrid-weight", type=float, default=0.5,
                    help="dense weight in hybrid fusion; 1.0 = dense-only "
                    "(used only when the index has a bm25.json)")
    ps.add_argument("--search-mode", default="fast",
                    choices=["fast", "turbo"],
                    help="top-k kernel selection: fast = exactness-"
                    "guaranteed, turbo = recall ~0.999 at higher QPS")
    ps.add_argument("--continuous-slots", type=int, default=0,
                    help="enable POST /generate via continuous batching "
                    "with this many decode slots (needs a causal "
                    "--reader-size; 0 = off)")
    ps.add_argument("--gen-total", type=int, default=1024,
                    help="per-slot KV cache length for /generate "
                    "(capped at the reader's max_seq_len)")
    ps.add_argument("--gen-chunk-steps", type=int, default=16,
                    help="decode steps per dispatch between host "
                    "harvests on /generate")
    ps.add_argument("--max-new-tokens", type=int, default=128,
                    help="default completion budget for /generate")
    ps.add_argument("--adapter", action="append", default=None,
                    metavar="NAME=PATH",
                    help="serve a LoRA adapter.npz (from train --use-lora "
                    "--checkpoint-dir) under NAME on /generate; repeatable "
                    "— all adapters share the base and one compiled "
                    "program (multi-LoRA serving)")
    ps.add_argument("--adapter-r", type=int, default=8)
    ps.add_argument("--adapter-alpha", type=int, default=16)
    ps.add_argument("--adapter-targets", nargs="*", default=None)
    ps.add_argument("--prefix-cache-mb", type=float, default=0.0,
                    help="keep prompt KV on device and prefill only the "
                    "suffix of later /generate prompts sharing a prefix "
                    "(RAG system prompts/contexts); 0 = off")
    ps.add_argument("--gen-speculative", choices=["off", "ngram"],
                    default="ngram",
                    help="prompt-lookup speculative decoding inside the "
                    "continuous engine (greedy requests only; sampled "
                    "co-riders fall back to plain chunks automatically)")
    ps.add_argument("--kv-quant", choices=["bf16", "int8"], default="bf16",
                    help="KV-cache storage for /generate: int8 halves the "
                    "per-token HBM read and doubles resident slots at a "
                    "small logits perturbation (streams match "
                    "generate(kv_dtype='int8'), not bf16 bit-for-bit). "
                    "Pair with --reader-quantize int8c for the HBM-lean "
                    "stack (~45% of bf16 serving HBM): kv int8 is the "
                    "CAPACITY lever (2x residents at matched HBM), "
                    "int8c alone the peak-throughput config "
                    "(docs/BENCHMARKS.md round-5)")
    ps.add_argument("--keep-stacked", action="store_true",
                    help="keep scan-over-layers (stacked) reader weights "
                    "stacked at serve time; default unstacks them for "
                    "full-rate weight streaming (models/families.py)")
    ps.add_argument("--prefill-chunk", type=int, default=0,
                    help="admit long prompts in pieces of this many tokens "
                    "(must be a prompt bucket; 0 = whole-prompt prefill): "
                    "live requests keep decoding between pieces, bounding "
                    "their inter-token stall at the cost of extra "
                    "admission turns")
    ps.set_defaults(fn=cmd_serve)

    pc = sub.add_parser("chat", help="interactive generation REPL")
    pc.add_argument("--arch", choices=["causal", "seq2seq"], default="causal")
    pc.add_argument("--model-size", default="tiny",
                    choices=["tiny", "gpt125m", "gptneo125m", "pythia410m",
                             "llama1b", "qwen2-05b", "bloom560m", "phogpt4b", "mt5small",
                             "seq2seq-small"])
    pc.add_argument("--model-config", default=None)
    pc.add_argument("--scan-layers", action="store_true",
                    help="model was trained with --scan-layers (stacked "
                    "block checkpoint layout)")
    pc.add_argument("--keep-stacked", action="store_true",
                    help="decode with the stacked (scan) layout instead of "
                    "unstacking at load (slower weight streaming; see "
                    "models/families.py::unstack_for_decode)")
    pc.add_argument("--init-params", default=None)
    pc.add_argument("--tokenizer", default="byte")
    pc.add_argument("--max-len", type=int, default=256)
    pc.add_argument("--max-new-tokens", type=int, default=128)
    pc.add_argument("--temperature", type=float, default=0.0)
    pc.add_argument("--num-beams", type=int, default=1)
    pc.add_argument("--quantize",
                    choices=["int8", "int8c", "nf4", "nf4-dq"], default=None,
                    help="quantize dense weights for decode; int8c decodes "
                    "through the w8 GEMM kernel (byte-rate weight "
                    "streaming, ops/w8_matmul.py)")
    pc.add_argument("--speculative", choices=["none", "ngram", "draft"],
                    default="ngram",
                    help="speculative decoding: ngram = prompt-lookup, "
                    "draft = small draft model (needs --draft-size/"
                    "--draft-params); causal chat only, token-exact greedy "
                    "/ distribution-exact sampled")
    pc.add_argument("--draft-tokens", type=int, default=8)
    pc.add_argument("--draft-ngram", type=int, default=3)
    pc.add_argument("--draft-size", default="tiny",
                    choices=["tiny", "gpt125m", "gptneo125m", "pythia410m",
                             "qwen2-05b", "bloom560m"],
                    help="draft model preset for --speculative draft")
    pc.add_argument("--draft-params", default=None,
                    help="checkpoint/npz for the draft model")
    pc.add_argument("--seed", type=int, default=42)
    pc.set_defaults(fn=cmd_chat)

    pv = sub.add_parser(
        "convert-ckpt",
        help="checkpoint -> exported model (capability of the reference's "
        "--convert_cpkt, trainer.py:772-774; HF export instead of Hub push)",
    )
    pv.add_argument("--checkpoint-dir", required=True)
    pv.add_argument("--out-dir", required=True)
    pv.add_argument("--format", default="hf", choices=["hf", "npz"])
    pv.add_argument("--arch", choices=["causal", "seq2seq"], default="causal")
    pv.add_argument("--model-size", default="tiny",
                    choices=["tiny", "gpt125m", "gptneo125m", "pythia410m",
                             "llama1b", "qwen2-05b", "bloom560m", "phogpt4b", "mt5small",
                             "seq2seq-small"])
    pv.add_argument("--tokenizer", default="byte",
                    help="tokenizer the checkpoint was trained with; sets "
                    "the exported special-token ids (t5 export)")
    pv.add_argument("--model-config", default=None)
    pv.add_argument("--use-lora", action="store_true")
    pv.add_argument("--lora-r", type=int, default=8)
    pv.add_argument("--lora-alpha", type=int, default=16)
    pv.add_argument("--lora-targets", nargs="*", default=None)
    pv.add_argument("--quantize-base", choices=["int8", "nf4", "nf4-dq"], default=None,
                    help="the checkpoint was trained with this base "
                    "quantization; weights are dequantized for export")
    pv.add_argument("--optimizer", default="adamw",
                    choices=["adamw", "lion", "adamw8bit", "lion8bit"])
    pv.add_argument("--seed", type=int, default=42)
    pv.set_defaults(fn=cmd_convert_ckpt)

    pb = sub.add_parser("bench", help="run the headline benchmark")
    pb.set_defaults(fn=cmd_bench)

    return p


def main(argv: Optional[list[str]] = None) -> int:
    args = build_parser().parse_args(argv)
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
        if args.cpu_devices and args.platform == "cpu":
            jax.config.update("jax_num_cpu_devices", args.cpu_devices)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
