"""Batched embed-and-write ingest pipeline.

Replaces the reference's index-build path (sqlite ingestion glue in
reference inference_pipeline/db_utils/setup_docs_db.py:16-50 + the txtai
`index(...)` encoder-forward/faiss build in heavy_ranker.py:78-89) with a
TPU streaming pipeline: texts → host tokenize (fixed shapes) → jitted
encoder forward (bf16 MXU) → L2-normalized vectors → sharded store write +
host doc-store insert.  Restartable: the vector shards are the checkpoint
(``VectorStore.save``), the doc store is durable sqlite.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

from ..data.tokenizer import batch_encode
from ..models.encoder import jit_sentence_embed as _embed
from .chunking import chunk_text
from .docstore import DocStore
from .store import VectorStore


class IngestPipeline:
    def __init__(
        self,
        params,
        cfg,
        tokenizer,
        store: VectorStore,
        docstore: Optional[DocStore] = None,
        *,
        batch_size: int = 256,
        max_len: int = 128,
        lexical=None,
    ):
        self.params = params
        self.cfg = cfg
        self.tok = tokenizer
        self.store = store
        self.docstore = docstore
        self.batch_size = batch_size
        self.max_len = max_len
        # optional BM25Index kept in lock-step with the vector store for
        # hybrid retrieval (txtai hybrid=True capability)
        self.lexical = lexical

    def embed_texts(self, texts: Sequence[str]) -> np.ndarray:
        """Encode texts to (N, D) unit vectors with fixed-shape batches.

        Software-pipelined: jax dispatch is async, so batch i's host
        tokenization and batch i-1's device→host fetch both overlap the
        encoder forward of the in-flight batch — the host never sits
        between tokenize and fetch (round-1 profile: ingest was
        host/device serialized and ran at half the encoder's rate)."""
        out = []
        bs = self.batch_size
        pending = None  # (device embeddings, valid rows) still in flight
        for i in range(0, len(texts), bs):
            chunk = list(texts[i : i + bs])
            n = len(chunk)
            chunk += [""] * (bs - n)  # static batch shape
            ids, mask = batch_encode(self.tok, chunk, self.max_len)
            emb = _embed(self.params, self.cfg, ids, mask)  # async
            if pending is not None:
                out.append(np.asarray(pending[0][: pending[1]], np.float32))
            pending = (emb, n)
        if pending is not None:
            out.append(np.asarray(pending[0][: pending[1]], np.float32))
        return np.concatenate(out, axis=0) if out else np.zeros((0, self.store.dim))

    def add_texts(
        self,
        texts: Sequence[str],
        sources: Optional[Sequence[str]] = None,
    ) -> np.ndarray:
        """Embed + index + persist docs.  Returns assigned global ids."""
        return self.index_vectors(self.embed_texts(texts), texts, sources)

    def index_vectors(
        self,
        vecs: np.ndarray,
        texts: Sequence[str],
        sources: Optional[Sequence[str]] = None,
    ) -> np.ndarray:
        """Stage 2 of add_texts — the index/docstore/BM25 mutation only.
        Split out so a serving layer can run the (pure, slow) embed
        outside its index lock and hold it just for this part
        (engine/server.py::add_texts).

        Write order is chosen for failure safety: ids are deterministic
        (``store.add`` assigns ``size..size+n-1``), so the docstore row
        (the slowest, most failure-prone write — sqlite type errors land
        here) commits FIRST.  A failure then leaves only doc rows without
        vectors — invisible to search — instead of live vectors whose doc
        fetch returns None on every later query."""
        vecs = np.asarray(vecs, np.float32)
        if sources is not None and len(sources) != len(texts):
            raise ValueError(
                f"sources length {len(sources)} != texts length {len(texts)}"
            )
        if vecs.ndim != 2 or vecs.shape[1] != self.store.dim:
            raise ValueError(
                f"expected (E, {self.store.dim}) vectors, got {vecs.shape}"
            )
        if vecs.shape[0] != len(texts):
            raise ValueError(
                f"vector count {vecs.shape[0]} != text count {len(texts)}"
            )
        if self.store.size + vecs.shape[0] > self.store.capacity:
            raise ValueError(
                f"store full: size={self.store.size} + {vecs.shape[0]} > "
                f"capacity={self.store.capacity}"
            )
        ids = np.arange(
            self.store.size, self.store.size + vecs.shape[0], dtype=np.int64
        )
        if self.docstore is not None:
            self.docstore.insert(ids, list(texts), sources)
        assigned = self.store.add(vecs)
        assert np.array_equal(assigned, ids)
        if self.lexical is not None:
            self.lexical.add(ids, list(texts))
        return ids

    def add_documents(
        self,
        documents: Sequence[str],
        sources: Optional[Sequence[str]] = None,
        *,
        chunk_size: int = 512,
        overlap: float = 0.1,
    ) -> np.ndarray:
        """Chunk long documents (reference setup_docs_db granularity) then
        ingest the chunks."""
        chunks, chunk_sources = [], []
        for i, doc in enumerate(documents):
            for c in chunk_text(doc, chunk_size, overlap):
                chunks.append(c)
                chunk_sources.append(sources[i] if sources else None)
        return self.add_texts(chunks, chunk_sources)
