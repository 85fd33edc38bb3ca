"""ICU-style Unicode folding — the ``ICUFoldingFilter`` /
``ICUNormalizer2Filter`` analog
(``lucene/analysis/icu/src/java/org/apache/lucene/analysis/icu/
ICUFoldingFilter.java``, which applies the UTR#30 ``utr30`` transform:
NFKC compatibility decomposition + accent removal + case folding).

Real multilingual corpora mix normalization forms constantly — the
same word appears as ``café`` (precomposed), ``café`` (combining
acute), ``CAFÉ``, or full-width ``ｃａｆé`` — and without folding each
spelling is a distinct term with split statistics.

Implemented with the stdlib ``unicodedata`` (no ICU dependency in the
container), as the published UTR#30 pipeline:

1. NFKD compatibility decomposition (full-width forms, ligatures,
   circled chars decompose — ``ﬁ`` -> ``fi``, ``Ａ`` -> ``A``);
2. remove combining marks (category Mn — the accent-removal fold);
3. Unicode case fold (``str.casefold()`` — handles ß -> ss, final
   sigma, Cherokee, beyond plain lower());
4. NFKC recomposition so equal-looking outputs are binary-equal.

Documented deviation: UTR#30 includes a handful of extra singleton
folds (Hangul jamo width, some symbol folds) beyond this pipeline;
the NFKD + strip-Mn + casefold + NFKC core covers the cases that
dominate real text (width, ligature, accent, case, normalization-form
mixes).

Registered as analyzer ``icu_fold`` (StandardTokenizer + this fold in
place of LowerCaseFilter) — the ICUFoldingFilter chain shape.
"""

from __future__ import annotations

import unicodedata
from dataclasses import dataclass, field

from lucene_1_spark.analysis.standard import TOKEN_RE


def icu_fold(text: str) -> str:
    """NFKD -> strip combining marks -> casefold -> NFKC (the UTR#30
    folding pipeline on stdlib primitives)."""
    d = unicodedata.normalize("NFKD", text)
    stripped = "".join(ch for ch in d
                       if unicodedata.category(ch) != "Mn")
    return unicodedata.normalize("NFKC", stripped.casefold())


@dataclass(frozen=True)
class ICUFoldingAnalyzer:
    """StandardTokenizer + ICU-style folding (replacing the lowercase
    filter) + optional stop set applied AFTER folding, as the
    reference chains StopFilter after ICUFoldingFilter."""

    stop_words: frozenset = field(default_factory=frozenset)
    max_token_length: int = 255

    def tokens(self, text: str) -> list[str]:
        return [t for t, _ in self.tokens_with_positions(text)]

    def tokens_with_positions(self, text: str) -> list[tuple[str, int]]:
        if not text:
            return []
        out: list[tuple[str, int]] = []
        pos = -1
        for m in TOKEN_RE.finditer(text):
            t = m.group()
            pos += 1
            if len(t) > self.max_token_length:
                continue
            t = icu_fold(t)
            if t and t not in self.stop_words:
                out.append((t, pos))
        return out
