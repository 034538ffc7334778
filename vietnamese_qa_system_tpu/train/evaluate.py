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


@functools.partial(jax.jit, static_argnames=("cfg",), donate_argnums=(3,))
def _loss_accum_causal(params, cfg, batch, acc):
    loss, n = causal_lm.loss_fn(params, cfg, batch)
    return acc[0] + loss * n, acc[1] + n


@functools.partial(jax.jit, static_argnames=("cfg",), donate_argnums=(3,))
def _loss_accum_seq2seq(params, cfg, batch, acc):
    from ..models.families import s2s_module

    loss, n = s2s_module(cfg).loss_fn(params, cfg, batch)
    return acc[0] + loss * n, acc[1] + n


def perplexity_eval(
    params, cfg: ModelConfig, batches: Iterable[dict], *, mesh=None
) -> dict:
    """Token-weighted perplexity over an eval set.

    ONE host sync per eval: (sum nll, token count) accumulate on device
    across all batches (donated carry — no per-batch `float()` round
    trip, which paid the session-dependent 1.3-32 ms tunnel dispatch+sync
    floor per batch; reference fwd-only ppl loop trainer.py:1056-1076).

    Multi-device / multi-host (capability of the reference's
    `gather_for_metrics` loss gather, reference src/models/trainer.py:
    1067): with ``mesh``, each batch is sharded over the mesh's data axis
    so the forward runs data-parallel; on a multi-process runtime each
    host feeds its own shard of the eval set and the (nll, n) totals are
    summed across processes before the single fetch.
    """
    loss_fn = _loss_accum_causal if cfg.arch == "causal" else _loss_accum_seq2seq
    put = None
    if mesh is not None:
        from ..parallel.sharding import batch_sharding, replicated

        bs = batch_sharding(mesh)
        put = lambda v: jax.device_put(jnp.asarray(v), bs)  # noqa: E731
        acc = jax.device_put(
            (jnp.zeros((), jnp.float32), jnp.zeros((), jnp.float32)),
            replicated(mesh),
        )
    else:
        acc = (jnp.zeros((), jnp.float32), jnp.zeros((), jnp.float32))
    for batch in batches:
        b = {
            k: (put(v) if put is not None else jnp.asarray(v))
            for k, v in batch.items()
        }
        acc = loss_fn(params, cfg, b, acc)
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        totals = multihost_utils.process_allgather(
            jnp.stack([acc[0], acc[1]])
        ).sum(axis=0)
        total_nll, total_n = float(totals[0]), float(totals[1])
    else:
        total_nll, total_n = float(acc[0]), float(acc[1])  # the one sync
    mean_nll = total_nll / max(total_n, 1.0)
    return {
        "eval_loss": mean_nll,
        "perplexity": float(np.exp(min(mean_nll, 80.0))),
        "eval_tokens": int(total_n),
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
    mesh=None,
) -> dict:
    """Generation over prompts driven by a full GenerationConfig (beam /
    top-k/p / repetition penalty / no-repeat-ngram — capability of the
    reference threading its GenerationConfig into eval generation,
    trainer.py:390-413,942-946); logs predictions to
    `{log_dir}/log_dir_e{epoch}_{run_name}_{time}.txt` like the reference
    (trainer.py:974-998).  Batches: {"input_ids","attention_mask"} with
    LEFT-padded prompts (causal) or encoder inputs (seq2seq), optional
    "reference" strings.  ``max_new_tokens``/``temperature`` are legacy
    shorthands used when ``gen_config`` is not given.

    With ``mesh``, prompt batches are sharded over the mesh's data axis
    (data-parallel decode).  On a multi-process runtime, each host feeds
    its own shard of the eval set and every host's generated token blocks
    are all-gathered before decoding, so all hosts end with the full
    prediction log — the capability of the reference's
    ``pad_across_processes`` + ``gather_for_metrics``
    (reference src/models/trainer.py:947-948,1028-1029).  Per-host
    "reference" strings are kept local-only in that mode (strings do not
    ride the array gather)."""
    if gen_config is None:
        gen_config = gen_mod.GenerationConfig(
            max_new_tokens=max_new_tokens, temperature=temperature
        )
    records = []
    t0 = time.time()
    n_tokens = 0
    multihost = jax.process_count() > 1
    put = None
    if mesh is not None:
        from ..parallel.sharding import batch_sharding

        bs = batch_sharding(mesh)
        put = lambda v: jax.device_put(jnp.asarray(v), bs)  # noqa: E731

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
        if multihost:
            # all-gather every host's (prompt, generated) token blocks so
            # each host decodes the full eval set (same static shapes per
            # host by construction — batches are padded to fixed widths)
            from jax.experimental import multihost_utils

            ids_np = np.concatenate(
                multihost_utils.process_allgather(ids_np), axis=0
            )
            out = np.concatenate(
                multihost_utils.process_allgather(out), axis=0
            )
            batch = dict(batch)
            batch.pop("reference", None)
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
        if put is not None:
            ids = put(batch["input_ids"])
            mask = put(batch["attention_mask"])
        else:
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
