"""Content filters for the offline ETL pipeline.

Capability of the reference's code filter
(`code_likelihood_score` / `have_code`, reference
src/data/features/filters/code_filters.py:5-41): score text for code-like
markers so code-bearing examples are skipped by machine translation
(translating code corrupts it).  This implementation groups markers by
category and compiles ONE alternation regex instead of running ~100
separate finditer passes — same decision surface, ~50x less regex work.
"""

from __future__ import annotations

import re
from typing import Tuple

_KEYWORDS = [
    # statement/declaration keywords across mainstream languages
    "function", "class", "def", "return", "import", "lambda", "struct",
    "typedef", "enum", "interface", "namespace", "template", "void",
    "public", "private", "protected", "static", "abstract", "final",
    "extends", "implements", "instanceof", "async", "await", "yield",
    "const", "var", "let", "val", "elif", "switch", "case", "break",
    "continue", "while", "try", "catch", "finally", "throw", "raise",
    "self", "super", "println", "printf", "console",
    # language / format names that flag code discussions
    "python", "javascript", "typescript", "java", "csharp", "golang",
    "rust", "kotlin", "sql", "html", "css", "json", "xml", "regex",
    "numpy", "pytorch", "tensorflow",
    # sql verbs
    "select", "insert", "update", "delete", "union",
]
_SYMBOLS = [
    r"```", r"\{", r"\}", r";", r"=>", r"->", r"==", r"!=", r"\(\)",
    r"\[\]", r"</", r"/>", r"#include", r"//", r"\$\(", r"&&", r"\|\|",
]

_PATTERN = re.compile(
    "|".join(
        [rf"\b(?:{'|'.join(map(re.escape, _KEYWORDS))})\b"] + _SYMBOLS
    ),
    re.IGNORECASE,
)


def code_likelihood_score(text: str) -> Tuple[int, list[str]]:
    """Number of code-marker hits + the matched substrings."""
    found = _PATTERN.findall(text)
    return len(found), found


def have_code(text: str, threshold: int = 5) -> Tuple[bool, int, list[str]]:
    """True when the marker count reaches `threshold` (reference default 5,
    code_filters.py:35)."""
    score, found = code_likelihood_score(text)
    return score >= threshold, score, found
