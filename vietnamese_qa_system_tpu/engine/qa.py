"""End-to-end QA: retrieve → RAG prompt → reader generation.

The reference ships the two halves separately (the retrieval pipeline in
inference_pipeline/ and the trained reader via the chat script
src/models/model_utils/ds_inference.py; src/test.py:106-147 sketches the
combined loop with an mt5 reader).  This module is the assembled system:
batched retrieval over the TPU index, prompt assembly with the template
bank's [CTX i] format (the same format training data uses, so a model
fine-tuned with this framework sees matching prompts), KV-cache batch
generation, and a score threshold that routes low-confidence retrievals to
a refusal (capability of the dual-encoder accept rule,
heavy_ranker.py:110-115 — also available directly via
engine.dual_agreement for two-retriever setups).
"""

from __future__ import annotations

import dataclasses
import random
from typing import Optional, Sequence

import numpy as np

from ..data.schemas import QAExample, QUESTION_PREFIX, RESPONSE_PREFIX
from ..data.templates import DEFAULT_BANK
from ..data.tokenizer import batch_encode
from ..models import generate as gen_mod
from .query import Retriever


@dataclasses.dataclass
class QAAnswer:
    question: str
    answer: Optional[str]
    contexts: list[str]
    scores: list[float]
    refused: bool = False


class QAPipeline:
    def __init__(
        self,
        retriever: Retriever,
        reader_params,
        reader_cfg,
        reader_tokenizer,
        *,
        k: int = 3,
        min_score: float = 0.2,
        max_prompt_len: int = 512,
        max_new_tokens: int = 128,
        temperature: float = 0.0,
        seed: int = 0,
        speculative: str = "none",
        draft_tokens: int = 8,
        draft_ngram: int = 3,
        draft=None,
    ):
        self.retriever = retriever
        self.params = reader_params
        self.cfg = reader_cfg
        self.tok = reader_tokenizer
        self.k = k
        self.min_score = min_score
        self.max_prompt_len = max_prompt_len
        self.max_new_tokens = max_new_tokens
        self.temperature = temperature
        # prompt-lookup speculative decode (token-exact greedy /
        # distribution-exact sampled; causal only).  RAG answers quote the
        # retrieved [CTX i] passages, so the drafter hits exactly where
        # this pipeline spends its decode time.
        self.speculative = (
            speculative if reader_cfg.arch == "causal" else "none"
        )
        self.draft_tokens = draft_tokens
        self.draft_ngram = draft_ngram
        # (draft_params, draft_cfg) pair for speculative="draft"
        self.draft = draft
        self.rng = random.Random(seed)

    def _build_prompt(self, question: str, contexts: Sequence[str]) -> str:
        context = QAExample.flatten_docs(list(contexts))
        body = DEFAULT_BANK.render_random(
            "prompt", self.rng, question=question, context=context
        )
        return f"{QUESTION_PREFIX}\n{body}\n\n{RESPONSE_PREFIX}\n"

    def answer(self, questions: Sequence[str]) -> list[QAAnswer]:
        prompts, metas = self.retrieve(questions)
        return self.generate_answers(prompts, metas)

    def retrieve(self, questions: Sequence[str]):
        """Stage 1 — the only part that touches (mutable) index state:
        search, refusal triage, prompt assembly.  Split from generation so
        a serving layer can hold its index lock for just this stage
        (engine/server.py::_qa_batch)."""
        hits = self.retriever.search(questions, k=self.k)
        prompts, metas = [], []
        for question, row in zip(questions, hits):
            kept = [r for r in row if r.score >= self.min_score and r.doc]
            if not kept:
                metas.append(
                    QAAnswer(
                        question,
                        DEFAULT_BANK.render_random(
                            "no_answer", self.rng, question=question
                        ),
                        [],
                        [r.score for r in row],
                        refused=True,
                    )
                )
                prompts.append(None)
                continue
            metas.append(
                QAAnswer(
                    question,
                    None,
                    [r.doc for r in kept],
                    [r.score for r in kept],
                )
            )
            prompts.append(self._build_prompt(question, [r.doc for r in kept]))
        return prompts, metas

    def generate_answers(
        self, prompts: Sequence[Optional[str]], metas: list[QAAnswer]
    ) -> list[QAAnswer]:
        """Stage 2 — pure reader generation over the assembled prompts
        (frozen params; no index state)."""
        live = [i for i, p in enumerate(prompts) if p is not None]
        if live:
            # seq2seq readers (the reference's mt5 experiments,
            # reference src/test.py:106-147) encode right-padded and emit
            # decoder-side tokens only; causal readers continue the prompt
            is_s2s = self.cfg.arch == "seq2seq"
            # pad the batch dim to the next power of two: generate is
            # jitted with batch as a static shape, so arbitrary batch
            # sizes would each compile a fresh program (minutes over the
            # axon remote-compile tunnel) — buckets cap it at log2(B)
            n = len(live)
            bucket = 1 << (n - 1).bit_length()
            texts = [prompts[i] for i in live] + [" "] * (bucket - n)
            ids, mask = batch_encode(
                self.tok,
                texts,
                self.max_prompt_len,
                pad_side="right" if is_s2s else "left",
            )
            out = gen_mod.generate_with_config(
                self.params,
                self.cfg,
                np.asarray(ids),
                np.asarray(mask),
                gen_mod.GenerationConfig(
                    max_new_tokens=self.max_new_tokens,
                    temperature=self.temperature,
                    speculative=self.speculative,
                    draft_tokens=self.draft_tokens,
                    draft_ngram=self.draft_ngram,
                ),
                eos_id=self.tok.eos_id,
                draft=self.draft,
            )
            out = np.asarray(out)
            for row_idx, i in enumerate(live):
                new_tokens = (
                    out[row_idx]
                    if is_s2s
                    else out[row_idx, ids.shape[1]:]
                )
                completion = self.tok.decode(
                    [
                        t
                        for t in new_tokens
                        if t not in (self.tok.pad_id, self.tok.eos_id)
                    ]
                )
                metas[i].answer = completion.strip()
        return metas
