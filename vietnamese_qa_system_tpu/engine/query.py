"""Query path: encode → sharded fused top-k → doc fetch (+ dual-encoder
agreement).

Replaces the reference's per-query Python loop over two txtai indexes
(reference inference_pipeline/db_utils/heavy_ranker.py:97-115): queries are
encoded as a batch on the MXU, scored by the fused kernel over all shards,
merged over ICI, and only then do ids resolve to text on the host.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import numpy as np

from ..data.tokenizer import batch_encode
from ..models.encoder import jit_sentence_embed as _embed
from .docstore import DocStore
from .store import VectorStore


@dataclasses.dataclass
class SearchResult:
    id: int
    score: float
    doc: Optional[str] = None
    source: Optional[str] = None


class Retriever:
    """One encoder + one vector store + optional doc store.

    With ``lexical`` (a BM25Index over the same global ids) searches run
    hybrid: dense and BM25 candidates are unioned and fused at
    ``hybrid_weight`` (capability of the reference's
    txtai.Embeddings(hybrid=True), heavy_ranker.py:78-88)."""

    def __init__(
        self,
        params,
        cfg,
        tokenizer,
        store: VectorStore,
        docstore: Optional[DocStore] = None,
        *,
        max_len: int = 128,
        query_batch: int = 256,
        lexical=None,
        hybrid_weight: float = 0.5,
        mode: str = "fast",
        rerank: int | None = None,
    ):
        self.params = params
        self.cfg = cfg
        self.tok = tokenizer
        self.store = store
        self.docstore = docstore
        self.max_len = max_len
        self.query_batch = query_batch
        self.lexical = lexical
        self.hybrid_weight = hybrid_weight
        # "fast" (default) or "turbo" kernel selection (ops/topk.py):
        # turbo trades the exactness guarantee for ~recall 0.999 at higher
        # throughput — a serving-level knob
        self.mode = mode
        # two-stage candidate count (store.topk rerank=K'); None = the
        # store's dtype default (auto 4*k on int8_res, off otherwise)
        self.rerank = rerank

    def embed_queries(self, texts: Sequence[str]) -> np.ndarray:
        bs = self.query_batch
        out = []
        for i in range(0, len(texts), bs):
            chunk = list(texts[i : i + bs])
            n = len(chunk)
            chunk += [""] * (bs - n)
            ids, mask = batch_encode(self.tok, chunk, self.max_len)
            emb = _embed(self.params, self.cfg, ids, mask)
            out.append(np.asarray(emb[:n], np.float32))
        return np.concatenate(out, axis=0)

    def search(
        self, queries: Sequence[str], k: int = 10, *, fetch_docs: bool = True
    ) -> list[list[SearchResult]]:
        # Return what exists: an index smaller than k (the normal state
        # of online-ingest-from-empty serving) yields shorter rows, not a
        # ValueError from store.topk's size < k contract.  During that
        # warmup each distinct k_eff compiles its own top-k program
        # (store._query_cache is keyed on k); once size >= k the value is
        # stable.
        k_eff = min(k, self.store.size)
        if k_eff <= 0:
            return [[] for _ in queries]
        # fast/turbo kernels keep the running top-k in one vector lane
        # (ops/topk.py LANES=128); for larger k fall back to the exact
        # full-score path instead of raising deep inside matmul_topk.
        mode = self.mode
        if mode != "exact":
            from ..ops.topk import LANES

            if k_eff > LANES:
                mode = "exact"
        qvecs = self.embed_queries(queries)
        if self.lexical is not None and self.hybrid_weight < 1.0:
            return self._hybrid_search(queries, qvecs, k_eff, fetch_docs)
        results: list[list[SearchResult]] = []
        bs = self.query_batch
        for i in range(0, len(qvecs), bs):
            block = qvecs[i : i + bs]
            n = len(block)
            if n < bs:
                block = np.pad(block, ((0, bs - n), (0, 0)))
            rr = None if self.rerank is None else max(self.rerank, k_eff)
            scores, ids = self.store.topk(block, k_eff, mode=mode, rerank=rr)
            scores = np.asarray(scores[:n])
            ids = np.asarray(ids[:n])
            for r in range(n):
                row = [
                    SearchResult(int(ids[r, j]), float(scores[r, j]))
                    for j in range(k_eff)
                ]
                if fetch_docs and self.docstore is not None:
                    fetched = self.docstore.get_rows(int(x.id) for x in row)
                    for res, got in zip(row, fetched):
                        if got is not None:
                            res.doc, res.source = got[1], got[2]
                results.append(row)
        return results


    def _hybrid_search(self, queries, qvecs, k: int, fetch_docs: bool):
        """Fuse dense and BM25 scores over the candidate union.

        Dense candidates come from the TPU top-k engine; BM25 candidates
        from the host inverted index; the union's exact dense scores are a
        tiny gather (store.get_vectors).  Dense cosine is clamped to
        [0, 1] and BM25 max-normalized so both sides fuse on one scale."""
        from .lexical import fuse_scores

        m = min(max(4 * k, 20), self.store.size)
        if self.mode != "exact":
            # fast/turbo kernels cap k at one vector lane (ops/topk.py
            # LANES=128); an uncapped 4*k candidate request would raise
            # inside matmul_topk for every search with k > 32
            from ..ops.topk import LANES

            m = min(m, LANES)
        results: list[list[SearchResult]] = []
        bs = self.query_batch
        dense_s = np.zeros((len(qvecs), m), np.float32)
        dense_i = np.zeros((len(qvecs), m), np.int64)
        for i in range(0, len(qvecs), bs):
            block = qvecs[i : i + bs]
            n = len(block)
            if n < bs:
                block = np.pad(block, ((0, bs - n), (0, 0)))
            rr = None if self.rerank is None else max(self.rerank, m)
            s, ids = self.store.topk(block, m, mode=self.mode, rerank=rr)
            dense_s[i : i + n] = np.asarray(s[:n])
            dense_i[i : i + n] = np.asarray(ids[:n])
        for r, query in enumerate(queries):
            dense = {
                int(g): max(float(s), 0.0)
                for g, s in zip(dense_i[r], dense_s[r])
                if g >= 0
            }
            sparse = dict(self.lexical.search(query, k=m))
            fused = fuse_scores(dense, sparse, self.hybrid_weight)
            # exact dense scores for BM25-only candidates
            missing = [g for g in sparse if g not in dense]
            if missing:
                vecs = self.store.get_vectors(missing)
                exact = vecs @ qvecs[r]
                for g, s in zip(missing, exact):
                    fused[g] = self.hybrid_weight * max(float(s), 0.0) + (
                        1 - self.hybrid_weight
                    ) * sparse[g]
            top = sorted(fused.items(), key=lambda kv: -kv[1])[:k]
            row = [SearchResult(int(g), float(s)) for g, s in top]
            if fetch_docs and self.docstore is not None:
                fetched = self.docstore.get_rows(int(x.id) for x in row)
                for res, got in zip(row, fetched):
                    if got is not None:
                        res.doc, res.source = got[1], got[2]
            results.append(row)
        return results


class DualRetriever:
    """Two independent encoder+index pairs queried together with the
    agreement accept rule — the reference's full query loop
    (heavy_ranker.py:97-115: MiniLM + mpnet indexes, top-1 uid agreement,
    summed-score threshold), batched."""

    def __init__(self, retriever_a: Retriever, retriever_b: Retriever,
                 *, threshold: float = 0.4):
        self.a = retriever_a
        self.b = retriever_b
        self.threshold = threshold

    def search(self, queries, k: int = 1):
        """Returns a list of Optional[SearchResult]: the agreed top hit per
        query (None when the encoders disagree or the score sum is low)."""
        res_a = self.a.search(queries, k=max(k, 1))
        res_b = self.b.search(queries, k=max(k, 1))
        return dual_agreement(res_a, res_b, self.threshold)


def dual_agreement(
    results_a: list[list[SearchResult]],
    results_b: list[list[SearchResult]],
    threshold: float = 0.4,
) -> list[Optional[SearchResult]]:
    """Two-encoder agreement heuristic: accept the top-1 hit when both
    retrievers agree on the id AND the summed scores clear the threshold.

    Capability of the reference's accept rule
    (reference inference_pipeline/db_utils/heavy_ranker.py:110-115:
    same uid AND score1+score2 > 0.4).
    """
    out = []
    for ra, rb in zip(results_a, results_b):
        if not ra or not rb:  # empty index → no hit, not an IndexError
            out.append(None)
            continue
        top_a, top_b = ra[0], rb[0]
        if top_a.id == top_b.id and (top_a.score + top_b.score) > threshold:
            merged = SearchResult(
                top_a.id, top_a.score + top_b.score, top_a.doc, top_a.source
            )
            out.append(merged)
        else:
            out.append(None)
    return out
