"""StandardAnalyzer re-expressed as a vectorized batch operation.

Reference semantics (all citations into /root/reference):

- ``StandardTokenizer`` is a UAX#29 word-break tokenizer
  (``analysis/standard/StandardTokenizer.java:38-114``).  We implement
  the word-break rules that matter for source-code/ASCII text with a
  single regex over the relevant UAX#29 classes:
  ALetter=`[^\\W\\d_]`, Numeric=`\\d`, ExtendNumLet=`_` (joins inside
  `\\w+` runs), MidNumLet=`['.']` between two letters or two digits,
  MidNum=`,` between two digits.  Golden-locked by tests (E5 fixture):
  ``a1b2 3.14 foo_bar foo-bar x+y`` -> ``a1b2, 3.14, foo_bar, foo,
  bar, x, y``.
- tokens longer than ``max_token_length`` (default 255,
  ``StandardAnalyzer.java:37``) are DROPPED but still count as a
  position increment (``StandardTokenizer.java:163-173``); they do NOT
  contribute to field length / norms (they never reach the indexing
  chain).
- ``LowerCaseFilter`` lowercases per code point
  (``analysis/LowerCaseFilter.java:36-40``) — ``str.lower()`` matches
  for ASCII and nearly all of Unicode.
- the default StandardAnalyzer STOP SET IS EMPTY
  (``analysis/standard/StandardAnalyzer.java:51-53``); stop filtering
  accumulates skipped positions into the next token's increment
  (``analysis/FilteringTokenFilter.java:49-58``).

The analyzer is exposed three ways: a plain-Python batch function (used
by the oracle so index and oracle share one tokenizer), a pandas-UDF
factory for DataFrame pipelines, and a registry for pluggable analyzers
(the reference's ``Analyzer.createComponents`` extension point,
``analysis/Analyzer.java:85``).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

import pandas as pd

# UAX#29-for-ASCII word regex. Segments of \w (letters/digits/underscore;
# underscore is ExtendNumLet so it glues), joined across MidNumLet/MidNum
# when flanked by the right classes.
_L = r"[^\W\d_]"  # unicode letter
_D = r"\d"
TOKEN_RE = re.compile(
    rf"\w+(?:(?:(?<={_L})['.](?={_L})|(?<={_D})['.,](?={_D}))\w+)*",
    re.UNICODE,
)


@dataclass(frozen=True)
class StandardAnalyzer:
    """StandardTokenizer -> LowerCaseFilter -> StopFilter chain."""

    max_token_length: int = 255
    stop_words: frozenset[str] = field(default_factory=frozenset)
    lowercase: bool = True

    def tokens(self, text: str) -> list[str]:
        """Analyzed terms for one document (no positions)."""
        if not text:
            return []
        raw = TOKEN_RE.findall(text)
        out = []
        for t in raw:
            if len(t) > self.max_token_length:
                continue  # dropped, still a position increment
            if self.lowercase:
                t = t.lower()
            if t in self.stop_words:
                continue
            out.append(t)
        return out

    def tokens_with_positions(self, text: str) -> list[tuple[str, int]]:
        """(term, position) pairs; skipped tokens leave position gaps."""
        if not text:
            return []
        out = []
        pos = -1
        for t in TOKEN_RE.findall(text):
            pos += 1  # every matched token advances the position
            if len(t) > self.max_token_length:
                continue
            if self.lowercase:
                t = t.lower()
            if t in self.stop_words:
                continue
            out.append((t, pos))
        return out

    def tokens_with_offsets(self, text: str) \
            -> list[tuple[str, int, int, int]]:
        """(term, position, start_char, end_char) — the OffsetAttribute
        analog (``analysis/tokenattributes/OffsetAttribute.java``):
        character spans index the ORIGINAL text, so consumers (e.g. the
        highlighter) can wrap exact source spans."""
        if not text:
            return []
        out = []
        pos = -1
        for m in TOKEN_RE.finditer(text):
            pos += 1
            t = m.group()
            if len(t) > self.max_token_length:
                continue
            if self.lowercase:
                t = t.lower()
            if t in self.stop_words:
                continue
            out.append((t, pos, m.start(), m.end()))
        return out


WHITESPACE = "whitespace"
STANDARD = "standard"


@dataclass(frozen=True)
class WhitespaceAnalyzer:
    """Split on whitespace + lowercase; SQL-parity analyzer whose exact
    behavior is expressible in ANSI SQL (used by the driver-facing
    oracle-checked queries)."""

    lowercase: bool = True

    def tokens(self, text: str) -> list[str]:
        if not text:
            return []
        toks = text.split()
        return [t.lower() for t in toks] if self.lowercase else toks

    def tokens_with_positions(self, text: str) -> list[tuple[str, int]]:
        return list(zip(self.tokens(text), range(10**9)))

    def tokens_with_offsets(self, text: str) \
            -> list[tuple[str, int, int, int]]:
        """(term, position, start_char, end_char) over \\S+ runs."""
        if not text:
            return []
        return [((m.group().lower() if self.lowercase else m.group()),
                 pos, m.start(), m.end())
                for pos, m in enumerate(re.finditer(r"\S+", text))]


_REGISTRY = {
    STANDARD: StandardAnalyzer(),
    WHITESPACE: WhitespaceAnalyzer(),
}


def get_analyzer(name: str):
    """Analyzer registry (Analyzer.createComponents extension point).
    Built-ins: ``standard``, ``whitespace``, ``english`` (Porter chain),
    plus name specs ``shingle:<base>:<min>:<max>`` /
    ``ngram:<base>:<min>:<max>`` — every name is reconstructible inside
    Python workers from the manifest string alone."""
    hit = _REGISTRY.get(name)
    if hit is not None:
        return hit
    if name == "english":
        from lucene_1_spark.analysis.english import EnglishAnalyzer
        _REGISTRY[name] = EnglishAnalyzer()
        return _REGISTRY[name]
    if name == "icu_fold":
        from lucene_1_spark.analysis.icu import ICUFoldingAnalyzer
        _REGISTRY[name] = ICUFoldingAnalyzer()
        return _REGISTRY[name]
    if name in ("cjk", "cjk_unigram"):
        from lucene_1_spark.analysis.cjk import CJKAnalyzer
        _REGISTRY[name] = CJKAnalyzer(
            output_unigrams=(name == "cjk_unigram"))
        return _REGISTRY[name]
    from lucene_1_spark.analysis.languages import make_analyzer
    lang = make_analyzer(name)
    if lang is not None:
        _REGISTRY[name] = lang
        return lang
    if name in ("thai", "japanese", "korean"):
        # ThaiAnalyzer / JapaneseAnalyzer / KoreanAnalyzer convenience
        # names: the dictionary segmenter with seed dictionary (+ Thai
        # stop set); pass dictseg:<script>:<path> for a real dictionary
        from lucene_1_spark.analysis.segment import resolve_dictseg
        _REGISTRY[name] = resolve_dictseg(f"dictseg:{name}")
        return _REGISTRY[name]
    if name == "path" or name.split(":", 1)[0] in (
            "pattern", "html", "reverse", "commongrams", "compound"):
        from lucene_1_spark.analysis.extras import resolve_extra
        an = resolve_extra(name)
        if an is not None:
            _REGISTRY[name] = an
            return an
    if name.split(":", 1)[0] in ("phonetic", "phonetic_inject"):
        from lucene_1_spark.analysis.phonetic import resolve_phonetic
        an = resolve_phonetic(name)
        if an is not None:
            _REGISTRY[name] = an
            return an
    if name.startswith("dictseg:"):
        from lucene_1_spark.analysis.segment import resolve_dictseg
        an = resolve_dictseg(name)
        if an is not None:
            _REGISTRY[name] = an
            return an
    if ":" in name:
        from lucene_1_spark.analysis.filters import resolve_spec
        an = resolve_spec(name)
        if an is not None:
            _REGISTRY[name] = an
            return an
    raise KeyError(f"unknown analyzer '{name}'")


def analyze_batch(texts: pd.Series, analyzer_name: str = STANDARD) -> pd.Series:
    """Vectorized batch tokenize: Series[str] -> Series[list[str]]."""
    an = get_analyzer(analyzer_name)
    return texts.fillna("").map(an.tokens)


def tokenize_udf_factory(analyzer_name: str = STANDARD):
    """Build a pandas UDF Series[str] -> Series[array<string>]."""
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import ArrayType, StringType

    @pandas_udf(ArrayType(StringType()))
    def tokenize(texts: pd.Series) -> pd.Series:
        return analyze_batch(texts, analyzer_name)

    return tokenize
