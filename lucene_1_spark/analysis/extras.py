"""The reference's non-language analysis/common machinery as batch
analyzers — compound-word decomposition, HTML stripping, path
hierarchy, pattern tokenization, string reversal, and common grams.

All are worker-reconstructible NAME SPECS (the same contract as
``shingle:`` / ``dictseg:``), so index kernels rebuild them from the
manifest's analyzer string alone:

    ``compound:<base>:<dict-file>[:longest]``  DictionaryCompoundWordTokenFilter
    ``html:<base>``                            HTMLStripCharFilter + base chain
    ``path``                                   PathHierarchyTokenizer
    ``pattern:<regex>``                        PatternTokenizer (group 0)
    ``reverse:<base>``                         ReverseStringFilter
    ``commongrams:<base>``                     CommonGramsFilter (classic stop set)

Reference citations (all into /root/reference):

- ``analysis/common/.../compound/DictionaryCompoundWordTokenFilter.java:38``
  + ``CompoundWordTokenFilterBase.java``: tokens >= min_word_size keep
  the ORIGINAL and additionally emit every dictionary subword of
  min_subword_size..max_subword_size found at any offset, at the SAME
  position (posInc 0); ``onlyLongestMatch`` keeps only the longest
  subword per start offset.
- ``analysis/common/.../charfilter/HTMLStripCharFilter.java`` (a
  generated scanner): script/style element CONTENT dropped, comments
  and tags dropped, character entities decoded.  Light version:
  regex-staged strip + Python's html.unescape (the published HTML5
  entity table); offset correction is not preserved (documented — the
  engine highlights against the stripped text).
- ``analysis/common/.../path/PathHierarchyTokenizer.java:31``: one
  token per path prefix (/a, /a/b, /a/b/c), all at one position.
- ``analysis/common/.../pattern/PatternTokenizer.java:43`` with
  group=0 (match mode).
- ``analysis/common/.../reverse/ReverseStringFilter.java:36`` — the
  leading-wildcard trick: index reversed terms, rewrite ``*suffix``
  into a PREFIX query on the reversed field.
- ``analysis/common/.../commongrams/CommonGramsFilter.java:42``: a
  token adjacent to a common word additionally emits the joined
  bigram ("the_value") as a posInc-0 twin, making stopword-containing
  phrases one-term lookups.
"""

from __future__ import annotations

import html
import re
from dataclasses import dataclass, field

from lucene_1_spark.analysis.standard import get_analyzer as _base_analyzer

# the classic English stop set (StandardAnalyzer's historical
# ENGLISH_STOP_WORDS_SET, EnglishAnalyzer.java:46) — CommonGrams'
# conventional common-word set
CLASSIC_STOP = frozenset("""a an and are as at be but by for if in into is
it no not of on or such that the their then there these they this to was
will with""".split())


# ---------------------------------------------------------------------------
# compound-word decomposition
# ---------------------------------------------------------------------------

def decompound(token: str, words: frozenset[str], min_word_size: int = 5,
               min_subword_size: int = 2, max_subword_size: int = 15,
               only_longest: bool = False) -> list[str]:
    """Subwords of ``token`` found in the dictionary —
    ``DictionaryCompoundWordTokenFilter.decompose`` semantics: every
    offset is tried; per offset, candidate lengths min..max ascending;
    ``only_longest`` keeps the single longest match per offset."""
    n = len(token)
    if n < min_word_size:
        return []
    out = []
    for i in range(n):
        best = None
        for ln in range(min_subword_size, min(max_subword_size, n - i) + 1):
            cand = token[i:i + ln]
            if cand in words:
                if only_longest:
                    best = cand
                else:
                    out.append(cand)
        if only_longest and best is not None:
            out.append(best)
    return out


@dataclass(frozen=True)
class CompoundAnalyzer:
    """Base chain + dictionary decompounding: originals kept, subwords
    appended at the same position (posInc 0)."""

    base: str = "standard"
    dict_path: str | None = None
    only_longest: bool = False
    min_word_size: int = 5
    min_subword_size: int = 2
    max_subword_size: int = 15

    @property
    def words(self) -> frozenset[str]:
        from lucene_1_spark.analysis.segment import load_dictionary
        return load_dictionary(self.dict_path)

    def tokens(self, text: str) -> list[str]:
        return [t for t, _ in self.tokens_with_positions(text)]

    def tokens_with_positions(self, text: str) -> list[tuple[str, int]]:
        words = self.words
        out = []
        for t, p in _base_analyzer(self.base).tokens_with_positions(text):
            out.append((t, p))
            for sub in decompound(t, words, self.min_word_size,
                                  self.min_subword_size,
                                  self.max_subword_size, self.only_longest):
                out.append((sub, p))
        return out


# ---------------------------------------------------------------------------
# HTML strip
# ---------------------------------------------------------------------------

_SCRIPT_RE = re.compile(r"<(script|style)\b[^>]*>.*?</\1\s*>",
                        re.IGNORECASE | re.DOTALL)
_COMMENT_RE = re.compile(r"<!--.*?-->", re.DOTALL)
_TAG_RE = re.compile(r"</?[a-zA-Z!][^>]*>")


def html_strip(text: str) -> str:
    """Tags/comments/script+style content -> spaces; entities decoded
    (order matters: entity decode LAST so ``&lt;b&gt;`` cannot become
    a strippable tag, matching the reference's scanner)."""
    text = _SCRIPT_RE.sub(" ", text)
    text = _COMMENT_RE.sub(" ", text)
    text = _TAG_RE.sub(" ", text)
    return html.unescape(text)


@dataclass(frozen=True)
class HtmlStripAnalyzer:
    base: str = "standard"

    def tokens(self, text: str) -> list[str]:
        return _base_analyzer(self.base).tokens(html_strip(text))

    def tokens_with_positions(self, text: str) -> list[tuple[str, int]]:
        return _base_analyzer(self.base).tokens_with_positions(
            html_strip(text))


# ---------------------------------------------------------------------------
# path hierarchy
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class PathHierarchyAnalyzer:
    """'/a/b/c' -> /a, /a/b, /a/b/c (leading-slash normalized), all at
    position 0 — the drill-down shape for path facets."""

    delimiter: str = "/"

    def tokens(self, text: str) -> list[str]:
        return [t for t, _ in self.tokens_with_positions(text)]

    def tokens_with_positions(self, text: str) -> list[tuple[str, int]]:
        if not text:
            return []
        parts = [p for p in text.strip().split(self.delimiter) if p]
        out = []
        acc = ""
        for p in parts:
            acc += self.delimiter + p
            out.append((acc, 0))
        return out


# ---------------------------------------------------------------------------
# pattern tokenizer
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class PatternAnalyzer:
    """Regex match-mode tokenizer (group 0) + lowercase."""

    pattern: str = r"\w+"
    _re: re.Pattern = field(init=False, compare=False, repr=False,
                            default=None)

    def __post_init__(self):
        object.__setattr__(self, "_re", re.compile(self.pattern))

    def tokens(self, text: str) -> list[str]:
        return [t for t, _ in self.tokens_with_positions(text)]

    def tokens_with_positions(self, text: str) -> list[tuple[str, int]]:
        if not text:
            return []
        return [(m.group().lower(), i)
                for i, m in enumerate(self._re.finditer(text))]


# ---------------------------------------------------------------------------
# reverse filter
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class ReverseAnalyzer:
    """Every base token reversed — index-side of the leading-wildcard
    rewrite (``*suffix`` becomes prefix ``xiffus*`` here)."""

    base: str = "standard"

    def tokens(self, text: str) -> list[str]:
        return [t[::-1] for t in _base_analyzer(self.base).tokens(text)]

    def tokens_with_positions(self, text: str) -> list[tuple[str, int]]:
        return [(t[::-1], p) for t, p
                in _base_analyzer(self.base).tokens_with_positions(text)]


# ---------------------------------------------------------------------------
# common grams
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class CommonGramsAnalyzer:
    """Unigrams + joined bigrams for pairs touching a common word, the
    bigram a posInc-0 twin of its FIRST member
    (CommonGramsFilter.java:42 output shape)."""

    base: str = "standard"
    common_words: frozenset = field(default_factory=lambda: CLASSIC_STOP)

    def tokens(self, text: str) -> list[str]:
        return [t for t, _ in self.tokens_with_positions(text)]

    def tokens_with_positions(self, text: str) -> list[tuple[str, int]]:
        base = _base_analyzer(self.base).tokens_with_positions(text)
        out = []
        for i, (t, p) in enumerate(base):
            out.append((t, p))
            if i + 1 < len(base):
                nt, np_ = base[i + 1]
                # adjacent positions only; either side common
                if np_ == p + 1 and (t in self.common_words
                                     or nt in self.common_words):
                    out.append((f"{t}_{nt}", p))
        return out


# ---------------------------------------------------------------------------
# spec resolution
# ---------------------------------------------------------------------------

def resolve_extra(name: str):
    if name == "path":
        return PathHierarchyAnalyzer()
    if name.startswith("pattern:"):
        return PatternAnalyzer(name.split(":", 1)[1])
    parts = name.split(":")
    if parts[0] == "html" and len(parts) == 2:
        return HtmlStripAnalyzer(parts[1])
    if parts[0] == "reverse" and len(parts) == 2:
        return ReverseAnalyzer(parts[1])
    if parts[0] == "commongrams" and len(parts) == 2:
        return CommonGramsAnalyzer(parts[1])
    if parts[0] == "compound" and len(parts) in (3, 4):
        return CompoundAnalyzer(parts[1], parts[2],
                                only_longest=(len(parts) == 4
                                              and parts[3] == "longest"))
    return None
