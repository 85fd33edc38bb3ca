"""CJK bigram analyzer — the reference's ``CJKAnalyzer`` chain
(``lucene/analysis/common/src/java/org/apache/lucene/analysis/cjk/
CJKAnalyzer.java:92-99``): StandardTokenizer -> CJKWidthFilter ->
LowerCaseFilter -> CJKBigramFilter -> StopFilter, re-expressed as one
vectorized batch function so a Spark index build tokenizes CJK text in
an Arrow kernel with no per-row Python beyond the regex scan.

Semantics implemented (citations into /root/reference):

- **Width folding** (``cjk/CJKWidthFilter.java:36-64``): fullwidth
  ASCII variants (U+FF01-FF5E) fold to ASCII; halfwidth Katakana
  variants (U+FF65-FF9F) fold to their kana equivalents, with the
  halfwidth voiced/semi-voiced sound marks combining into the
  preceding kana (``CJKWidthFilter.combine``).  Both are exactly the
  NFKC mapping restricted to that block, so the fold is implemented as
  NFKC over U+FF01-FF9F runs only (the filter is documented as "a
  practical subset of NFKC", ``CJKWidthFilter.java:33``).  Deviation:
  we fold the TEXT before tokenizing (Lucene folds tokens), so
  reported offsets index the folded text.
- **Tokenizer script classes** (``standard/StandardTokenizer.java``,
  UAX#29): Han ideographs and Hiragana emit one token per codepoint
  (IDEOGRAPHIC / HIRAGANA types); Katakana and Hangul emit runs
  (KATAKANA / HANGUL); everything else tokenizes with the engine's
  UAX#29-for-ASCII word rules.  Hangul syllables are WB:ALetter, so a
  MIXED Hangul+Latin/digit run like ``한국abc`` joins into ONE word
  token typed <ALPHANUM> and passes through un-bigrammed
  (``cjk/CJKBigramFilter.java:44-49`` doTokenTypes;
  ``standard/StandardTokenizerImpl.jflex:219-221`` marks the HANGUL
  rule "subset of the below for typing purposes only") — a run types
  <HANGUL> (and bigrams) only when it is entirely Hangul.
- **Bigramming** (``cjk/CJKBigramFilter.java:154-236``): adjacent CJK
  codepoints (across tokens, when offsets are contiguous —
  ``lastEndOffset`` check at ``CJKBigramFilter.java:189``) form
  overlapping bigrams, each advancing one position; a lone CJK
  codepoint (isolated by spacing, punctuation, or non-CJK text) emits
  a unigram (``flushUnigram``, ``CJKBigramFilter.java:330-339``).
  With ``output_unigrams=True`` every codepoint ALSO emits its unigram
  and bigrams become posInc-0 synonyms spanning two positions
  (``flushBigram``, ``CJKBigramFilter.java:320-326``) — the combined
  unigram+bigram mode.  Per-script ``flags`` select which scripts
  bigram (``HAN | HIRAGANA | KATAKANA | HANGUL``), non-selected CJK
  scripts pass through as-is.
- **Stop filtering** (``cjk/CJKAnalyzer.java:47``,
  ``cjk/stopwords.txt``): the default CJK stop set (common English
  function words — double-byte interpunction never survives the
  tokenizer), removed AFTER bigramming with accumulated position gaps
  (``analysis/FilteringTokenFilter.java:49-58``).
"""

from __future__ import annotations

import re
import unicodedata
from dataclasses import dataclass, field

# ---------------------------------------------------------------------------
# script classes (regex char-class bodies, Python codepoint semantics)
# ---------------------------------------------------------------------------

_HAN = (
    "一-鿿"            # CJK Unified Ideographs
    "㐀-䶿"            # Extension A
    "豈-﫿"            # Compatibility Ideographs
    "\U00020000-\U0002EBEF"    # Extensions B-F (supplementary plane)
)
_HIRA = "ぁ-ゖゝゞ"
_KATA = "ァ-ヺー-ヾㇰ-ㇿ"
_HANG = "가-힣ᄀ-ᇿꥠ-꥿ힰ-퟿"
_CJK_ALL = _HAN + _HIRA + _KATA + _HANG + "゙゚"

# non-CJK word char: the standard analyzer's \w minus every CJK class.
# Hangul is NOT excluded: Hangul syllables are WB:ALetter, so a mixed
# run like 한국abc matches the LONGER UAX#29 word rule and types
# <ALPHANUM> (un-bigrammed); the jflex grammar marks ``{HangulEx}+`` as
# "subset of the below for typing purposes only"
# (``standard/StandardTokenizerImpl.jflex:219-221``) — a pure-Hangul
# run types <HANGUL> only because equal-length matches pick the
# earlier rule.  The scanner mirrors that with a post-classification:
# word matches that are entirely Hangul re-type as hang.  Han,
# Hiragana and Katakana are WB:Other/Katakana — never joined into a
# word run — so they keep their own alternatives.
_W = rf"(?:(?![{_HAN}{_HIRA}{_KATA}゙゚])\w)"
_PURE_HANG_RE = re.compile(rf"[{_HANG}]+\Z")
# UAX#29 Extend (common nonspacing-mark blocks): transparent inside a
# word run — Python's \w excludes Mn, so e.g. Arabic "رُوبرت" would
# otherwise split at the damma (reference golden
# TestCJKAnalyzer.testNonIdeographicNonLetter)
_EXT = ("̀-ͯ҃-҉֑-ׇؐ-ؚ"
        "ً-ٰٟۖ-ۜ۟-ۤۧۨ"
        "۪-ۭऀ-ः़ा-्ั"
        "ิ-ฺ็-๎")
_WRUN = rf"{_W}(?:{_W}|[{_EXT}])*"
_L = r"[^\W\d_]"   # any unicode letter (lookarounds only — see below)
_D = r"\d"

# The word alternative reuses the engine's UAX#29-for-ASCII rules
# (``analysis/standard.py`` TOKEN_RE) with CJK excluded from the run
# class; the lookbehinds inspect characters already matched by _W, so
# they never see a CJK codepoint.
_SCAN_RE = re.compile(
    rf"(?P<word>{_WRUN}(?:(?:(?<={_L})['.](?={_L})"
    rf"|(?<={_D})['.,](?={_D})){_WRUN})*)"
    rf"|(?P<han>[{_HAN}])"
    rf"|(?P<hira>[{_HIRA}][゙゚]?)"
    rf"|(?P<kata>[{_KATA}][゙゚]?)",
    re.UNICODE,
)

# NFKC restricted to the width-variant block == CJKWidthFilter's fold
_WIDTH_RE = re.compile(r"[！-ﾟ]+")


def cjk_width_fold(text: str) -> str:
    """Fullwidth ASCII -> ASCII, halfwidth Katakana -> kana (voiced
    marks combined) — ``CJKWidthFilter.java:55-64`` as targeted NFKC."""
    return _WIDTH_RE.sub(
        lambda m: unicodedata.normalize("NFKC", m.group()), text)


# flags — CJKBigramFilter.java:55-66
HAN = 1
HIRAGANA = 2
KATAKANA = 4
HANGUL = 8
ALL_SCRIPTS = HAN | HIRAGANA | KATAKANA | HANGUL

_GROUP_FLAG = {"han": HAN, "hira": HIRAGANA, "kata": KATAKANA,
               "hang": HANGUL}

# the default stop set — cjk/stopwords.txt (the double-byte
# interpunctions in that file never survive tokenization, so only the
# word entries matter)
CJK_STOP = frozenset("""a and are as at be but by for if in into is it no
not of on or s such t that the their then there these they this to was
will with www""".split())


@dataclass(frozen=True)
class CJKAnalyzer:
    """StandardTokenizer -> width fold -> lowercase -> CJK bigrams ->
    stop filter; registered as ``cjk`` (and ``cjk_unigram`` for the
    combined unigram+bigram mode)."""

    flags: int = ALL_SCRIPTS
    output_unigrams: bool = False
    stop_words: frozenset = field(default_factory=lambda: CJK_STOP)
    max_token_length: int = 255

    # -- raw scan: (text, kind, start, end) ---------------------------------
    def _scan(self, text: str):
        for m in _SCAN_RE.finditer(text):
            kind = m.lastgroup
            # the HANGUL-vs-ALPHANUM typing rule (see _W above): a word
            # run that is ENTIRELY Hangul types HANGUL and bigrams;
            # any mixed Hangul+Latin/digit run stays one un-bigrammed
            # ALPHANUM token (CJKBigramFilter.java:44-49 doTokenTypes)
            if kind == "word" and _PURE_HANG_RE.fullmatch(m.group()):
                kind = "hang"
            yield m.group(), kind, m.start(), m.end()

    def _stream(self, text: str):
        """(term, start, end, pos_inc) after width fold + lowercase +
        bigram — the pre-stop-filter token stream.  CJK runs buffer
        codepoints; contiguous buffers emit overlapping bigrams,
        isolated codepoints emit unigrams (CJKBigramFilter.java:
        154-236).  In ``output_unigrams`` mode each bigram follows its
        first unigram with pos_inc 0 (the posInc-0 synonym shape of
        ``flushBigram``, CJKBigramFilter.java:320-326)."""
        if not text:
            return []
        text = cjk_width_fold(text)
        out: list[tuple[str, int, int, int]] = []
        buf: list[tuple[str, int, int]] = []    # (codepoint, start, end)
        last_end = -1
        uni = self.output_unigrams

        def flush():
            nonlocal buf
            n = len(buf)
            if uni:
                # A + AB(posInc 0) + B + BC(posInc 0) + C
                for i in range(n):
                    out.append((buf[i][0], buf[i][1], buf[i][2], 1))
                    if i + 1 < n:
                        out.append((buf[i][0] + buf[i + 1][0],
                                    buf[i][1], buf[i + 1][2], 0))
            elif n >= 2:
                for i in range(n - 1):
                    out.append((buf[i][0] + buf[i + 1][0],
                                buf[i][1], buf[i + 1][2], 1))
            elif n == 1:
                out.append((buf[0][0], buf[0][1], buf[0][2], 1))
            buf = []

        for tok, kind, s, e in self._scan(text):
            fl = _GROUP_FLAG.get(kind)
            if fl is not None and (self.flags & fl):
                if buf and s != last_end:   # unaligned: no cross-gap bigram
                    flush()
                j = 0
                for ch in tok:
                    # combining voice marks glue to the previous kana
                    if ch in "゙゚" and buf:
                        c0, s0, _ = buf.pop()
                        comp = unicodedata.normalize("NFC", c0 + ch)
                        buf.append((comp, s0, s + j + 1))
                    else:
                        buf.append((ch, s + j, s + j + 1))
                    j += 1
                last_end = e
            else:
                flush()
                if len(tok) <= self.max_token_length:
                    out.append((tok.lower(), s, e, 1))
                else:
                    out.append((None, s, e, 1))  # dropped, still a position
        flush()
        return out

    # -- public surface (same contract as StandardAnalyzer) -----------------
    def tokens(self, text: str) -> list[str]:
        return [t for t, _ in self.tokens_with_positions(text)]

    def tokens_with_positions(self, text: str) -> list[tuple[str, int]]:
        out = []
        pos = -1
        for t, _, _, inc in self._stream(text):
            pos += inc
            if t is None or t in self.stop_words:
                continue
            out.append((t, pos))
        return out

    def tokens_with_offsets(self, text: str) \
            -> list[tuple[str, int, int, int]]:
        """(term, position, start, end) — offsets index the WIDTH-FOLDED
        text (documented deviation; fold is length-preserving except
        for combined voice marks)."""
        out = []
        pos = -1
        for t, s, e, inc in self._stream(text):
            pos += inc
            if t is None or t in self.stop_words:
                continue
            out.append((t, pos, s, e))
        return out
