"""Typo autocorrect that preserves technical tokens and code blocks.

Behavioral contract (reference: oscillink/preprocess/autocorrect.py):
  * only words in the curated typo map are corrected (case-insensitive);
  * acronyms, snake_case, camelCase, digit-bearing and code-like tokens are
    left untouched, as are URLs / emails / non-ASCII tokens;
  * original casing (UPPER / Title / lower) is preserved in the replacement;
  * Markdown ``` code fences toggle a no-touch region.
"""

from __future__ import annotations

import re
from typing import Iterable, List, Optional

__all__ = ["smart_correct", "COMMON_TYPOS"]

# Curated common-typo map (data parity with the reference list).
COMMON_TYPOS: dict[str, str] = {
    "teh": "the",
    "recieve": "receive",
    "seperate": "separate",
    "definately": "definitely",
    "occured": "occurred",
    "accomodate": "accommodate",
    "acheive": "achieve",
    "adress": "address",
    "becuase": "because",
    "comming": "coming",
    "enviroment": "environment",
    "goverment": "government",
    "independant": "independent",
    "occuring": "occurring",
    "occurence": "occurrence",
    "publically": "publicly",
    "seperately": "separately",
    "wich": "which",
}

_SKIP_RES = (
    re.compile(r"^[A-Z]{2,}$"),  # acronyms
    re.compile(r"^[A-Za-z]+_[A-Za-z0-9_]+$"),  # snake_case
    re.compile(r"^[A-Za-z]+[A-Z][A-Za-z0-9]+$"),  # camelCase / PascalCase
    re.compile(r".*[0-9].*"),  # digits
    re.compile(r".*[()\[\]{}<>`].*"),  # code-like
)

_DEFAULT_PRESERVE = {
    "Oscillink",
    "lamG",
    "lamC",
    "lamQ",
    "SPD",
    "kNN",
    "k-NN",
    "API",
    "LLM",
    "FFT",
}

_PUNCT = ",.!?;:\"'’”()[]{}"


def _recase(template: str, word: str) -> str:
    if template.isupper():
        return word.upper()
    if template.istitle():
        return word.title()
    return word


def _skip(core: str, preserve) -> bool:
    if not core or core in preserve:
        return True
    if "://" in core or "@" in core:
        return True
    if not core.isascii():
        return True
    return any(p.match(core) for p in _SKIP_RES)


def _correct_token(tok: str, preserve: Iterable[str]) -> str:
    if not tok:
        return tok
    lead, core, trail = "", tok, ""
    while core and core[0] in _PUNCT:
        lead += core[0]
        core = core[1:]
    while core and core[-1] in _PUNCT:
        trail = core[-1] + trail
        core = core[:-1]
    if _skip(core, preserve):
        return tok
    repl = COMMON_TYPOS.get(core.lower())
    if repl is None:
        return tok
    return f"{lead}{_recase(core, repl)}{trail}"


def smart_correct(text: str, custom_preserve: Optional[List[str]] = None) -> str:
    """Correct common typos while preserving technical terms and code."""
    preserve = set(_DEFAULT_PRESERVE)
    if custom_preserve:
        preserve.update(custom_preserve)

    out: List[str] = []
    in_code = False
    for line in text.splitlines():
        if line.strip().startswith("```"):
            in_code = not in_code
            out.append(line)
            continue
        if in_code:
            out.append(line)
            continue
        out.append(" ".join(_correct_token(t, preserve) for t in line.split(" ")))
    return "\n".join(out)
