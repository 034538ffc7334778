from .store import VectorStore
from .ivf import (IVFIndex, ivf_crossover_batch, load_index,
                  select_serving_index)
from .docstore import DocStore
from .chunking import chunk_text
from .ingest import IngestPipeline
from .lexical import BM25Index, fuse_scores
from .query import DualRetriever, Retriever, SearchResult, dual_agreement
from .qa import QAAnswer, QAPipeline
from .server import MicroBatcher, ServingApp, make_server
from .continuous import ContinuousEngine

__all__ = [
    "ContinuousEngine",
    "MicroBatcher",
    "ServingApp",
    "make_server",
    "VectorStore",
    "IVFIndex",
    "load_index",
    "ivf_crossover_batch",
    "select_serving_index",
    "BM25Index",
    "fuse_scores",
    "DocStore",
    "chunk_text",
    "IngestPipeline",
    "Retriever",
    "DualRetriever",
    "SearchResult",
    "dual_agreement",
    "QAPipeline",
    "QAAnswer",
]
