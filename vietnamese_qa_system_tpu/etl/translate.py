"""Fault-tolerant parallel translation for the offline ETL pipeline.

Capability of the reference's `translate_converted`
(reference src/data/features/final_storge_converted/data_parser.py:204-318):
split work into large chunks, fan out thread-pool sub-chunks, detect failed
futures and resubmit exactly those chunks, guard over-long fields, and
survive transient connection errors.  The reference's translator backends
(googletrans / a 4-bit vinai en→vi model, data_parser.py:75-93) need
network or downloaded weights; here the backend is a pluggable protocol —
``NullTranslator`` (identity, offline default) ships in-repo, and any
callable batch translator plugs in.
"""

from __future__ import annotations

import concurrent.futures as cf
import threading
from typing import Protocol, Sequence

from ..utils.logging import get_logger

logger = get_logger("vqa_tpu.etl.translate")

MAX_FIELD_CHARS = 6000  # large-example guard (reference data_parser.py:168-170)


class Translator(Protocol):
    def translate_batch(
        self, texts: Sequence[str], src: str, dst: str
    ) -> list[str]: ...


class NullTranslator:
    """Identity translator — keeps the pipeline runnable offline."""

    def translate_batch(self, texts, src, dst):
        return list(texts)


class Seq2SeqTranslator:
    """TPU model-backed translation — the capability of the reference's
    local 4-bit vinai en→vi model path (reference
    src/data/features/final_storge_converted/data_parser.py:75-93, which
    loads a seq2seq translation model instead of calling googletrans).

    Wraps any of this framework's seq2seq families (native, T5/mT5, or
    mBART — e.g. an envit5-class or vinai-translate-class checkpoint
    imported via models/convert_hf.py::load_seq2seq_auto) and batches
    generation on device.  A ``prompt`` template can inject the language
    pair the way envit5/mt5 expect (e.g. ``"{src}: {text}"``).

    mBART checkpoints (the reference's actual en→vi model,
    data_parser.py:75-93) start the decoder at eos and force the target
    language id as the first produced token: pass ``bos_id=eos`` and
    ``forced_bos_id=<lang id>`` (HF ``tokenizer.lang_code_to_id[dst]``).
    """

    def __init__(self, params, cfg, tokenizer, *, max_len: int = 256,
                 max_new_tokens: int = 256, num_beams: int = 1,
                 prompt: str = "{text}", bos_id: int = 0,
                 forced_bos_id: int | None = None):
        self.params = params
        self.cfg = cfg
        self.tok = tokenizer
        self.max_len = max_len
        self.max_new_tokens = max_new_tokens
        self.num_beams = num_beams
        self.prompt = prompt
        self.bos_id = bos_id
        self.forced_bos_id = forced_bos_id

    def translate_batch(self, texts, src, dst):
        import numpy as np

        from ..data.tokenizer import batch_encode
        from ..models import generate as gen_mod

        rendered = [
            self.prompt.format(text=t, src=src, dst=dst) for t in texts
        ]
        ids, mask = batch_encode(self.tok, rendered, self.max_len)
        out = gen_mod.generate_with_config(
            self.params, self.cfg, np.asarray(ids), np.asarray(mask),
            gen_mod.GenerationConfig(
                max_new_tokens=self.max_new_tokens,
                num_beams=self.num_beams,
                forced_bos_token_id=self.forced_bos_id,
            ),
            eos_id=self.tok.eos_id,
            bos_id=self.bos_id,
        )
        out = np.asarray(out)
        skip = {self.tok.pad_id, self.tok.eos_id}
        if self.forced_bos_id is not None:
            skip.add(self.forced_bos_id)  # the language tag is not text
        return [
            self.tok.decode([t for t in row if t not in skip])
            for row in out
        ]


class FlakyWrapper:
    """Test helper: fails the first `fail_times` calls per chunk key to
    exercise the resubmit path."""

    def __init__(self, inner: Translator, fail_times: int = 1):
        self.inner = inner
        self.fail_times = fail_times
        self._failures: dict[int, int] = {}
        self._lock = threading.Lock()

    def translate_batch(self, texts, src, dst):
        key = hash(tuple(texts)) % (2**31)
        with self._lock:
            n = self._failures.get(key, 0)
            if n < self.fail_times:
                self._failures[key] = n + 1
                raise ConnectionError(f"simulated transient failure #{n + 1}")
        return self.inner.translate_batch(texts, src, dst)


def translate_texts(
    texts: Sequence[str],
    translator: Translator,
    *,
    src: str = "en",
    dst: str = "vi",
    chunk_size: int = 400,
    max_workers: int = 8,
    max_retries: int = 3,
) -> list[str]:
    """Translate preserving order, with per-chunk retry.

    Mirrors the reference's failed-future detection + exact-chunk
    resubmission (data_parser.py:278-291) without its unbounded restart
    recursion: after `max_retries` a chunk raises.
    """
    texts = [
        t if len(t) <= MAX_FIELD_CHARS else t[:MAX_FIELD_CHARS] for t in texts
    ]
    chunks = [
        (i, texts[i : i + chunk_size]) for i in range(0, len(texts), chunk_size)
    ]
    results: dict[int, list[str]] = {}

    def work(offset: int, chunk: list[str]) -> tuple[int, list[str]]:
        return offset, translator.translate_batch(chunk, src, dst)

    pending = chunks
    for attempt in range(max_retries + 1):
        if not pending:
            break
        failed: list[tuple[int, list[str]]] = []
        with cf.ThreadPoolExecutor(max_workers=max_workers) as pool:
            futures = {pool.submit(work, off, ch): (off, ch) for off, ch in pending}
            for fut in cf.as_completed(futures):
                off, ch = futures[fut]
                try:
                    o, translated = fut.result()
                    if len(translated) != len(ch):
                        raise ValueError(
                            f"translator returned {len(translated)} items for "
                            f"a {len(ch)}-item chunk"
                        )
                    results[o] = translated
                except Exception as e:  # noqa: BLE001 — resubmit transient failures
                    logger.warning(
                        "chunk at offset %d failed (attempt %d): %s", off, attempt, e
                    )
                    failed.append((off, ch))
        pending = failed
    if pending:
        raise RuntimeError(
            f"{len(pending)} translation chunks still failing after "
            f"{max_retries} retries (offsets {[o for o, _ in pending]})"
        )
    out: list[str] = []
    for off, _ in chunks:
        out.extend(results[off])
    return out
