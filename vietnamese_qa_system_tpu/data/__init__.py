from .tokenizer import ByteTokenizer, HFTokenizer, Tokenizer, batch_encode
from .templates import DEFAULT_BANK, TemplateBank
from .schemas import (
    InstructExample,
    QAExample,
    QUESTION_PREFIX,
    RESPONSE_PREFIX,
    generate_id,
    parse_record,
)
from .loader import DataFileSpec, QADataLoader, IGNORE_INDEX

__all__ = [
    "ByteTokenizer",
    "HFTokenizer",
    "Tokenizer",
    "batch_encode",
    "TemplateBank",
    "DEFAULT_BANK",
    "QAExample",
    "InstructExample",
    "QUESTION_PREFIX",
    "RESPONSE_PREFIX",
    "generate_id",
    "parse_record",
    "DataFileSpec",
    "QADataLoader",
    "IGNORE_INDEX",
]
