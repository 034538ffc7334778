"""Evaluation: perplexity + generative eval with prediction logging.

Capability of the reference's eval pass (reference src/models/trainer.py:
877-1110): per-epoch perplexity (fwd-only loop, gathered losses, exp(mean),
trainer.py:1056-1076) and generative eval (batched `generate` + decode +
prediction log files, trainer.py:928-949,974-998).
"""

from __future__ import annotations

import functools
import os
import time
from typing import Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models import causal_lm, generate as gen_mod, seq2seq
from ..models.config import ModelConfig


@functools.partial(jax.jit, static_argnames=("cfg",))
def _loss_causal(params, cfg, batch):
    return causal_lm.loss_fn(params, cfg, batch)


@functools.partial(jax.jit, static_argnames=("cfg",))
def _loss_seq2seq(params, cfg, batch):
    if cfg.seq2seq_family == "t5":
        from ..models import t5

        return t5.loss_fn(params, cfg, batch)
    return seq2seq.loss_fn(params, cfg, batch)


def perplexity_eval(params, cfg: ModelConfig, batches: Iterable[dict]) -> dict:
    """Token-weighted perplexity over an eval set."""
    loss_fn = _loss_causal if cfg.arch == "causal" else _loss_seq2seq
    total_nll, total_n = 0.0, 0
    for batch in batches:
        b = {k: jnp.asarray(v) for k, v in batch.items()}
        loss, n = loss_fn(params, cfg, b)
        total_nll += float(loss) * int(n)
        total_n += int(n)
    mean_nll = total_nll / max(total_n, 1)
    return {
        "eval_loss": mean_nll,
        "perplexity": float(np.exp(min(mean_nll, 80.0))),
        "eval_tokens": total_n,
    }


def generative_eval(
    params,
    cfg: ModelConfig,
    tokenizer,
    batches: Iterable[dict],
    *,
    max_new_tokens: int = 32,
    temperature: float = 0.0,
    gen_config: Optional[gen_mod.GenerationConfig] = None,
    log_dir: Optional[str] = None,
    epoch: int = 0,
    run_name: str = "model",
) -> dict:
    """Generation over prompts driven by a full GenerationConfig (beam /
    top-k/p / repetition penalty / no-repeat-ngram — capability of the
    reference threading its GenerationConfig into eval generation,
    trainer.py:390-413,942-946); logs predictions to
    `{log_dir}/log_dir_e{epoch}_{run_name}_{time}.txt` like the reference
    (trainer.py:974-998).  Batches: {"input_ids","attention_mask"} with
    LEFT-padded prompts (causal) or encoder inputs (seq2seq), optional
    "reference" strings.  ``max_new_tokens``/``temperature`` are legacy
    shorthands used when ``gen_config`` is not given."""
    if gen_config is None:
        gen_config = gen_mod.GenerationConfig(
            max_new_tokens=max_new_tokens, temperature=temperature
        )
    records = []
    t0 = time.time()
    n_tokens = 0

    def flush(pending):
        """Fetch + decode one finished batch (host work that overlaps the
        in-flight decode — jax dispatch is async, so generation of batch
        i runs while batch i-1 is fetched and detokenized here)."""
        nonlocal n_tokens
        batch, ids_np, gen = pending
        if cfg.arch == "seq2seq":
            out = np.concatenate([ids_np, np.asarray(gen)], axis=1)
        else:
            out = np.asarray(gen)
        prompt_len = ids_np.shape[1]
        # count only tokens actually generated (up to and excluding the
        # pad/eos fill after early stopping) — the fixed-width buffer size
        # would overstate tokens/s by up to max_new_tokens/actual_len
        tail = out[:, prompt_len:]
        n_tokens += int(
            ((tail != tokenizer.pad_id) & (tail != tokenizer.eos_id)).sum()
        )
        for r in range(out.shape[0]):
            prompt = tokenizer.decode(
                [t for t in ids_np[r] if t != tokenizer.pad_id]
            )
            completion = tokenizer.decode(
                [t for t in out[r, prompt_len:]
                 if t not in (tokenizer.pad_id, tokenizer.eos_id)]
            )
            rec = {"prompt": prompt, "prediction": completion}
            refs = batch.get("reference")
            if refs is not None:
                rec["reference"] = refs[r]
            records.append(rec)

    pending = None
    for batch in batches:
        ids = jnp.asarray(batch["input_ids"])
        mask = jnp.asarray(batch["attention_mask"])
        gen = gen_mod.generate_with_config(
            params, cfg, ids, mask, gen_config,
            eos_id=tokenizer.eos_id,
            # seq2seq decoder start = 0 — the shift-right convention both
            # training losses use (seq2seq.loss_fn / t5: decoder_start =
            # pad = 0); priming eval with the tokenizer's BOS would condition
            # generation on a token the decoder never saw in training
            bos_id=0 if cfg.arch == "seq2seq" else tokenizer.bos_id,
        )  # async dispatch
        if pending is not None:
            flush(pending)
        pending = (batch, np.asarray(batch["input_ids"]), gen)
    if pending is not None:
        flush(pending)
    elapsed = time.time() - t0
    if log_dir:
        os.makedirs(log_dir, exist_ok=True)
        fname = os.path.join(
            log_dir,
            f"log_dir_e{epoch}_{run_name}_{time.strftime('%Y%m%d_%H%M%S')}.txt",
        )
        with open(fname, "w") as f:
            for rec in records:
                for k, v in rec.items():
                    f.write(f"### {k}:\n{v}\n")
                f.write("\n" + "=" * 60 + "\n")
    return {
        "n_examples": len(records),
        "gen_tokens_per_s": n_tokens / max(elapsed, 1e-9),
        "records": records,
    }
