from .store import VectorStore
from .docstore import DocStore
from .chunking import chunk_text
from .ingest import IngestPipeline
from .query import DualRetriever, Retriever, SearchResult, dual_agreement
from .qa import QAAnswer, QAPipeline

__all__ = [
    "VectorStore",
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
