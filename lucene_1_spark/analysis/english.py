"""EnglishAnalyzer chain — the reference's
``analysis/common/src/java/org/apache/lucene/analysis/en/EnglishAnalyzer.java:43-68``
re-expressed for the batch kernels:

StandardTokenizer -> EnglishPossessiveFilter ('s removal,
``en/EnglishPossessiveFilter.java``) -> LowerCaseFilter -> StopFilter
(the classic 33-word English stop set, ``EnglishAnalyzer.java:46``) ->
PorterStemFilter (``en/PorterStemFilter.java`` wrapping the published
Porter 1980 algorithm).

The stemmer below is implemented from the public algorithm description
(M.F. Porter, "An algorithm for suffix stripping", Program 14(3) 1980),
not ported from the reference source."""

from __future__ import annotations

from dataclasses import dataclass, field

from lucene_1_spark.analysis.standard import TOKEN_RE

# EnglishAnalyzer.ENGLISH_STOP_WORDS_SET (StandardAnalyzer.java's classic
# English stop list — public, stable since Lucene 1.x)
ENGLISH_STOP_WORDS = frozenset((
    "a", "an", "and", "are", "as", "at", "be", "but", "by", "for", "if",
    "in", "into", "is", "it", "no", "not", "of", "on", "or", "such",
    "that", "the", "their", "then", "there", "these", "they", "this",
    "to", "was", "will", "with",
))

_VOWELS = "aeiou"


def _is_cons(w: str, i: int) -> bool:
    c = w[i]
    if c in _VOWELS:
        return False
    if c == "y":
        return i == 0 or not _is_cons(w, i - 1)
    return True


def _measure(w: str) -> int:
    """m in [C](VC)^m[V]."""
    m, i, n = 0, 0, len(w)
    while i < n and _is_cons(w, i):
        i += 1
    while i < n:
        while i < n and not _is_cons(w, i):
            i += 1
        if i >= n:
            break
        m += 1
        while i < n and _is_cons(w, i):
            i += 1
    return m


def _has_vowel(w: str) -> bool:
    return any(not _is_cons(w, i) for i in range(len(w)))


def _double_cons(w: str) -> bool:
    return len(w) >= 2 and w[-1] == w[-2] and _is_cons(w, len(w) - 1)


def _cvc(w: str) -> bool:
    """*o: stem ends cvc where the final c is not w, x or y."""
    if len(w) < 3:
        return False
    return (_is_cons(w, len(w) - 3) and not _is_cons(w, len(w) - 2)
            and _is_cons(w, len(w) - 1) and w[-1] not in "wxy")


def porter_stem(w: str) -> str:
    """The Porter (1980) stemmer, steps 1a-5b."""
    if len(w) <= 2:
        return w

    # step 1a
    if w.endswith("sses"):
        w = w[:-2]
    elif w.endswith("ies"):
        w = w[:-2]
    elif w.endswith("ss"):
        pass
    elif w.endswith("s"):
        w = w[:-1]

    # step 1b
    if w.endswith("eed"):
        if _measure(w[:-3]) > 0:
            w = w[:-1]
    else:
        flag = False
        if w.endswith("ed") and _has_vowel(w[:-2]):
            w, flag = w[:-2], True
        elif w.endswith("ing") and _has_vowel(w[:-3]):
            w, flag = w[:-3], True
        if flag:
            if w.endswith(("at", "bl", "iz")):
                w += "e"
            elif _double_cons(w) and not w.endswith(("l", "s", "z")):
                w = w[:-1]
            elif _measure(w) == 1 and _cvc(w):
                w += "e"

    # step 1c
    if w.endswith("y") and _has_vowel(w[:-1]):
        w = w[:-1] + "i"

    # step 2 (m>0 suffix rewrites)
    for suf, rep in (("ational", "ate"), ("tional", "tion"), ("enci", "ence"),
                     ("anci", "ance"), ("izer", "ize"), ("abli", "able"),
                     ("alli", "al"), ("entli", "ent"), ("eli", "e"),
                     ("ousli", "ous"), ("ization", "ize"), ("ation", "ate"),
                     ("ator", "ate"), ("alism", "al"), ("iveness", "ive"),
                     ("fulness", "ful"), ("ousness", "ous"), ("aliti", "al"),
                     ("iviti", "ive"), ("biliti", "ble")):
        if w.endswith(suf):
            if _measure(w[:-len(suf)]) > 0:
                w = w[:-len(suf)] + rep
            break

    # step 3
    for suf, rep in (("icate", "ic"), ("ative", ""), ("alize", "al"),
                     ("iciti", "ic"), ("ical", "ic"), ("ful", ""),
                     ("ness", "")):
        if w.endswith(suf):
            if _measure(w[:-len(suf)]) > 0:
                w = w[:-len(suf)] + rep
            break

    # step 4 (m>1 suffix removal)
    for suf in ("al", "ance", "ence", "er", "ic", "able", "ible", "ant",
                "ement", "ment", "ent", "ion", "ou", "ism", "ate", "iti",
                "ous", "ive", "ize"):
        if w.endswith(suf):
            stem = w[:-len(suf)]
            if suf == "ion" and not stem.endswith(("s", "t")):
                break
            if _measure(stem) > 1:
                w = stem
            break

    # step 5a
    if w.endswith("e"):
        m = _measure(w[:-1])
        if m > 1 or (m == 1 and not _cvc(w[:-1])):
            w = w[:-1]
    # step 5b
    if _measure(w) > 1 and _double_cons(w) and w.endswith("l"):
        w = w[:-1]
    return w


def _strip_possessive(t: str) -> str:
    """EnglishPossessiveFilter: drop trailing 's / ’s."""
    if len(t) >= 2 and t[-1] in "sS" and t[-2] in "'’＇":
        return t[:-2]
    return t


@dataclass(frozen=True)
class EnglishAnalyzer:
    """StandardTokenizer -> possessive -> lowercase -> stop -> Porter."""

    max_token_length: int = 255
    stop_words: frozenset = field(default_factory=lambda: ENGLISH_STOP_WORDS)

    def tokens(self, text: str) -> list[str]:
        return [t for t, _ in self.tokens_with_positions(text)] \
            if text else []

    def tokens_with_positions(self, text: str) -> list[tuple[str, int]]:
        if not text:
            return []
        out = []
        pos = -1
        for t in TOKEN_RE.findall(text):
            pos += 1
            if len(t) > self.max_token_length:
                continue
            t = _strip_possessive(t).lower()
            if not t or t in self.stop_words:
                continue
            out.append((porter_stem(t), pos))
        return out
