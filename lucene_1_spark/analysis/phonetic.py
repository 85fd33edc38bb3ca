"""Phonetic analysis — the ``lucene/analysis/phonetic`` module analog
(``PhoneticFilter.java``, which wraps a commons-codec encoder and
either REPLACES each token with its phonetic code or INJECTS the code
as a same-position twin so exact and phonetic matching coexist).

Encoder implemented: American Soundex, clean-room from the published
algorithm (the classic Russell/Odell 1918 code as standardized by the
U.S. National Archives and implemented by commons-codec's
``Soundex.US_ENGLISH``):

1. keep the first letter;
2. drop H and W entirely from the remainder (they neither code nor
   separate — 'Ashcraft' -> A261);
3. map B F P V->1, C G J K Q S X Z->2, D T->3, L->4, M N->5, R->6,
   vowels (A E I O U Y)->0;
4. collapse adjacent equal codes (the first letter's code
   participates, so 'Pfister' -> P236);
5. drop the vowel 0s (vowels separate, so 'Tymczak' -> T522), take
   three code digits, zero-pad: LETTER + 3 digits.

Every step is a string-algebra operation, so the identical pipeline is
expressible in ANSI SQL (translate + regexp_replace) — the driver
oracle cross-checks the ENCODER itself, not just the search results
(:func:`soundex_sql` generates that twin from the same constants).

BeiderMorse / DoubleMetaphone / Caverphone are documented
out-of-scope (large rule tables, same filter plumbing).
"""

from __future__ import annotations

import re
from dataclasses import dataclass

# letter -> code digit for A..Z (H and W never reach this map except
# as the kept first letter, where their 0 merely separates nothing)
_SOUNDEX_MAP = "01230120022455012623010202"
_NON_ALPHA = re.compile(r"[^A-Za-z]")
_HW = re.compile(r"[HW]")


def soundex(word: str) -> str:
    """American Soundex code (LETTER + 3 digits) of ``word``; tokens
    with no letters at all come back unchanged (the pass-through the
    filter needs so numeric tokens stay searchable)."""
    clean = _NON_ALPHA.sub("", word).upper()
    if not clean:
        return word
    first = clean[0]
    rest = _HW.sub("", clean[1:])
    digits = "".join(_SOUNDEX_MAP[ord(c) - 65] for c in first + rest)
    collapsed = []
    for d in digits:
        if not collapsed or collapsed[-1] != d:
            collapsed.append(d)
    body = "".join(collapsed[1:]).replace("0", "")
    return first + (body + "000")[:3]


def soundex_sql(expr: str) -> str:
    """The SAME pipeline as :func:`soundex` as one ANSI-SQL expression
    over ``expr`` (a column or literal) — translate + regexp algebra,
    DuckDB/Spark compatible.  Generated from the same constants so the
    oracle validates the encoder itself."""
    clean = f"upper(regexp_replace({expr}, '[^A-Za-z]', '', 'g'))"
    first = f"substr({clean}, 1, 1)"
    resthw = f"regexp_replace(substr({clean}, 2), '[HW]', '', 'g')"
    digits = (f"translate({first} || {resthw}, "
              f"'ABCDEFGHIJKLMNOPQRSTUVWXYZ', '{_SOUNDEX_MAP}')")
    # collapse runs per digit (RE2 has no backreferences, so '(.)\1+'
    # is unavailable — seven single-digit run collapses are equivalent)
    collapsed = digits
    for d in "0123456":
        collapsed = f"regexp_replace({collapsed}, '{d}+', '{d}', 'g')"
    body = f"replace(substr({collapsed}, 2), '0', '')"
    return (f"(CASE WHEN {clean} = '' THEN {expr} "
            f"ELSE {first} || substr({body} || '000', 1, 3) END)")


@dataclass(frozen=True)
class PhoneticAnalyzer:
    """``PhoneticFilter`` over a base analyzer.  ``inject=False``
    replaces each token with its code; ``inject=True`` emits the
    original AND the code as a same-position twin (posInc=0,
    ``PhoneticFilter.java:36-49`` default), so phrases and exact terms
    keep working alongside phonetic recall."""

    base: str = "standard"
    inject: bool = False

    def _base(self):
        from lucene_1_spark.analysis.standard import get_analyzer
        return get_analyzer(self.base)

    def tokens(self, text: str) -> list[str]:
        return [t for t, _ in self.tokens_with_positions(text)]

    def tokens_with_positions(self, text: str) -> list[tuple[str, int]]:
        out: list[tuple[str, int]] = []
        for tok, pos in self._base().tokens_with_positions(text):
            code = soundex(tok)
            if self.inject:
                out.append((tok, pos))
                if code != tok:
                    out.append((code, pos))
            else:
                out.append((code, pos))
        return out


def resolve_phonetic(name: str):
    """``phonetic:<base>`` (replace) / ``phonetic_inject:<base>``."""
    head, _, base = name.partition(":")
    if head == "phonetic":
        return PhoneticAnalyzer(base or "standard", inject=False)
    if head == "phonetic_inject":
        return PhoneticAnalyzer(base or "standard", inject=True)
    return None
