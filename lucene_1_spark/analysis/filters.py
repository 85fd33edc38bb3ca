"""Composable token-filter analyzers — shingles, character n-grams, and
synonym injection (the reference's ``analysis/shingle/ShingleFilter.java``,
``analysis/ngram/NGramTokenFilter.java``,
``analysis/synonym/SynonymGraphFilter.java`` as batch operations over a
base analyzer's token stream).

Shingle/NGram analyzers are resolvable from a NAME SPEC
(``shingle:<base>:<min>:<max>``, ``ngram:<base>:<min>:<max>``,
``edge_ngram:<base>:<min>:<max>``) so index
kernels running in Python workers can reconstruct them from the
manifest's analyzer string alone.  SynonymAnalyzer carries an arbitrary
map, so it is built programmatically (driver-side pipelines, query
expansion); index builds should bake synonyms at query time via
:class:`SynonymQuery` instead — the reference's recommended
query-time-synonyms practice."""

from __future__ import annotations

from dataclasses import dataclass

from lucene_1_spark.analysis.standard import get_analyzer as _base_analyzer


@dataclass(frozen=True)
class ShingleAnalyzer:
    """Token n-grams ("word shingles", ShingleFilter.java): emits each
    run of min_n..max_n consecutive base tokens joined by a space; a
    shingle takes the position of its first member.  Unigrams are kept
    when ``output_unigrams`` (the filter's default)."""

    base: str = "standard"
    min_n: int = 2
    max_n: int = 2
    output_unigrams: bool = True

    def tokens(self, text: str) -> list[str]:
        return [t for t, _ in self.tokens_with_positions(text)]

    def tokens_with_positions(self, text: str) -> list[tuple[str, int]]:
        base = _base_analyzer(self.base).tokens_with_positions(text)
        out = []
        for i, (t, p) in enumerate(base):
            if self.output_unigrams:
                out.append((t, p))
            for n in range(self.min_n, self.max_n + 1):
                if i + n <= len(base):
                    out.append((" ".join(w for w, _ in base[i:i + n]), p))
        return out


@dataclass(frozen=True)
class NGramAnalyzer:
    """Character n-grams per base token (NGramTokenFilter.java); every
    gram keeps the source token's position."""

    base: str = "standard"
    min_n: int = 3
    max_n: int = 3

    def tokens(self, text: str) -> list[str]:
        return [t for t, _ in self.tokens_with_positions(text)]

    def tokens_with_positions(self, text: str) -> list[tuple[str, int]]:
        out = []
        for t, p in _base_analyzer(self.base).tokens_with_positions(text):
            for n in range(self.min_n, self.max_n + 1):
                if len(t) < n:
                    continue
                out.extend((t[j:j + n], p) for j in range(len(t) - n + 1))
        return out


@dataclass(frozen=True)
class EdgeNGramAnalyzer:
    """Leading-edge n-grams per base token
    (``analysis/ngram/EdgeNGramTokenFilter.java``) — the classic
    search-as-you-type index shape: 'spark' with 2..4 grams emits
    sp/spa/spar, each at the source token's position.
    ``keep_original`` mirrors preserveOriginal (the full token is
    emitted too, so exact matches still hit)."""

    base: str = "standard"
    min_n: int = 2
    max_n: int = 4
    keep_original: bool = True

    def tokens(self, text: str) -> list[str]:
        return [t for t, _ in self.tokens_with_positions(text)]

    def tokens_with_positions(self, text: str) -> list[tuple[str, int]]:
        out = []
        for t, p in _base_analyzer(self.base).tokens_with_positions(text):
            for n in range(self.min_n, min(self.max_n, len(t)) + 1):
                out.append((t[:n], p))
            if self.keep_original and len(t) > self.max_n:
                out.append((t, p))
            elif self.keep_original and len(t) < self.min_n:
                out.append((t, p))  # shorter than min_n: original only
        return out


_NO_DECOMP = {"ø": "o", "Ø": "o", "ß": "ss", "æ": "ae", "Æ": "ae",
              "œ": "oe", "Œ": "oe", "đ": "d", "Đ": "d", "ł": "l",
              "Ł": "l", "þ": "th", "Þ": "th", "ð": "d", "Ð": "d",
              "ħ": "h", "ı": "i"}


def ascii_fold(t: str) -> str:
    """ASCIIFoldingFilter analog (``analysis/miscellaneous/
    ASCIIFoldingFilter.java``): NFD-decompose and drop combining marks
    (covers the accent table), plus the handful of Latin letters with
    no decomposition (ø ß æ œ đ ł þ ð ...)."""
    import unicodedata
    t = "".join(_NO_DECOMP.get(c, c) for c in t)
    return "".join(c for c in unicodedata.normalize("NFD", t)
                   if not unicodedata.combining(c))


@dataclass(frozen=True)
class FoldingAnalyzer:
    """Base chain + ASCII folding on every emitted token — the
    ``folded:<base>`` name spec."""

    base: str = "standard"

    def tokens(self, text: str) -> list[str]:
        return [t for t, _ in self.tokens_with_positions(text)]

    def tokens_with_positions(self, text: str) -> list[tuple[str, int]]:
        return [(ascii_fold(t), p) for t, p
                in _base_analyzer(self.base).tokens_with_positions(text)]


@dataclass(frozen=True)
class SynonymAnalyzer:
    """Map-based synonym injection: each mapped term additionally emits
    its synonyms AT THE SAME POSITION (posInc=0, the SynonymGraphFilter
    flat-graph case)."""

    base: str = "standard"
    synonyms: tuple[tuple[str, tuple[str, ...]], ...] = ()

    def _map(self) -> dict:
        return {k: v for k, v in self.synonyms}

    def tokens(self, text: str) -> list[str]:
        return [t for t, _ in self.tokens_with_positions(text)]

    def tokens_with_positions(self, text: str) -> list[tuple[str, int]]:
        m = self._map()
        out = []
        for t, p in _base_analyzer(self.base).tokens_with_positions(text):
            out.append((t, p))
            for syn in m.get(t, ()):
                out.append((syn, p))
        return out


def resolve_spec(name: str):
    """Parse ``shingle:<base>:<min>:<max>`` / ``ngram:<base>:<min>:<max>``
    analyzer name specs (worker-reconstructible)."""
    parts = name.split(":")
    if parts[0] == "shingle" and len(parts) == 4:
        return ShingleAnalyzer(parts[1], int(parts[2]), int(parts[3]))
    if parts[0] == "ngram" and len(parts) == 4:
        return NGramAnalyzer(parts[1], int(parts[2]), int(parts[3]))
    if parts[0] == "edge_ngram" and len(parts) == 4:
        return EdgeNGramAnalyzer(parts[1], int(parts[2]), int(parts[3]))
    if parts[0] == "folded" and len(parts) == 2:
        return FoldingAnalyzer(parts[1])
    return None
