"""Dictionary-driven word segmentation for unsegmented scripts —
Japanese / Korean / Thai (the reference's Kuromoji
``analysis/kuromoji/src/java/org/apache/lucene/analysis/ja/
JapaneseAnalyzer.java:43,109`` / Nori ``analysis/nori/src/java/org/
apache/lucene/analysis/ko/KoreanAnalyzer.java:36`` / Thai
``analysis/common/src/java/org/apache/lucene/analysis/th/
ThaiAnalyzer.java:38`` + ``ThaiTokenizer.java``).

The reference segments Japanese and Korean with a minimum-cost Viterbi
lattice over a compiled mecab-format dictionary, and Thai with an ICU
dictionary-based ``BreakIterator``.  Shipping a mecab dictionary and
its connection-cost matrix is out of scope here (SURVEY §7); this
module implements the dictionary-driven core those tokenizers share —
**greedy longest-match segmentation over a word dictionary**, with
unknown-character runs grouped per script (the Kuromoji
``UnknownDictionary`` character-category grouping analog,
``analysis/kuromoji/.../dict/UnknownDictionary.java``) — behind the
same worker-reconstructible name-spec contract as every other analyzer:

    ``dictseg:<script>``          built-in common-word seed dictionary
    ``dictseg:<script>:<path>``   one word per line, loaded lazily in
                                  each executor (the Kuromoji
                                  dictionary-resource deployment shape)

``<script>`` is ``thai`` | ``japanese`` | ``korean``.  Text outside the
target script tokenizes with the engine's standard word rules, so mixed
``hello สวัสดี`` documents work.

Segmentation algorithms:

- ``viterbi`` (DEFAULT for japanese/korean): minimum-cost dynamic
  programming over the word lattice — the Kuromoji/Nori shape
  (``ja/JapaneseTokenizer.java:62-120`` least-cost path) with a
  UNIGRAM cost model instead of mecab's per-word + connection costs
  (which need the compiled dictionary this repo doesn't ship): every
  dictionary word costs 1 (minus a tiny length bonus for
  deterministic longest-preference on ties) and every unknown char
  costs 2.5.  This fixes greedy's classic ambiguous-compound failure:
  with dict {学, 学生, 生活}, greedy splits 学生活 as [学生, 活†]
  (stranding an unknown), the lattice finds [学, 生活].
- ``greedy`` (DEFAULT for thai): longest leftmost dictionary word —
  "maximal matching", the published baseline closest to ICU's
  dictionary ``BreakIterator`` used by ``ThaiTokenizer.java``.

Documented deviations from the reference:

- the viterbi cost model is unigram (no part-of-speech connection
  matrix) — ties that mecab resolves by POS context resolve here by
  word length;
- the built-in seed dictionaries are tiny common-word seeds so the
  analyzers work out of the box and in tests; real deployments pass a
  dictionary file every executor can read.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from functools import cached_property

from lucene_1_spark.analysis.standard import TOKEN_RE

# ---------------------------------------------------------------------------
# script run classes
# ---------------------------------------------------------------------------

# Thai block letters: consonants, vowels (incl. combining signs), tone
# marks — excluding Thai digits and ฿ so numbers tokenize numerically
_THAI = "ก-๎"
# Japanese: Han + Hiragana + Katakana (+ prolonged sound mark) — one
# run class, as Kuromoji lattices over mixed kanji/kana words
_JA = ("一-鿿㐀-䶿豈-﫿ぁ-ゖゝゞァ-ヺー-ヾ")
_KO = "가-힣"

_SCRIPT_RE = {
    "thai": re.compile(f"[{_THAI}]+"),
    "japanese": re.compile(f"[{_JA}]+"),
    "korean": re.compile(f"[{_KO}]+"),
}

# ---------------------------------------------------------------------------
# seed dictionaries (common-vocabulary words; tests + out-of-the-box)
# ---------------------------------------------------------------------------

SEED_WORDS = {
    "thai": (
        "สวัสดี ประเทศ ไทย คน น้ำ รัก ภาษา เมือง ใหญ่ ดี มา ไป กิน ข้าว "
        "บ้าน รถ หนังสือ เรียน ทำงาน วันนี้ พรุ่งนี้ เวลา ปี เดือน วัน"
    ).split(),
    "japanese": (
        "日本 東京 語 学校 学生 先生 時間 今日 明日 これ それ する いる "
        "ある 私 本 水 食べる 行く 見る 大きい 小さい 新しい 年 月 日"
    ).split(),
    "korean": (
        "한국 사람 학교 학생 시간 오늘 내일 하다 있다 없다 물 밥 사랑 "
        "언어 나라 서울 책 크다 작다 새롭다 년 월 일 보다 가다"
    ).split(),
}

# Thai stop words (ThaiAnalyzer.java:38 default stop set lineage —
# common function words, abbreviated)
THAI_STOP = frozenset("""ที่ และ เป็น ใน ของ มี ได้ ให้ จะ ไม่ ว่า แต่ ก็
การ ความ กับ หรือ โดย แล้ว จาก ถ้า อยู่ คือ นี้ นั้น""".split())

STOP_SETS = {"thai": THAI_STOP, "japanese": frozenset(),
             "korean": frozenset()}

_DICT_CACHE: dict[str, frozenset[str]] = {}


def load_dictionary(path: str) -> frozenset[str]:
    """One word per line; blank lines and ``#`` comments skipped.
    Cached per path — each executor process reads the file once (the
    Kuromoji per-JVM dictionary-load shape)."""
    hit = _DICT_CACHE.get(path)
    if hit is None:
        with open(path, encoding="utf-8") as fh:
            hit = frozenset(
                w for w in (line.strip() for line in fh)
                if w and not w.startswith("#"))
        _DICT_CACHE[path] = hit
    return hit


# ---------------------------------------------------------------------------
# the segmentation kernel
# ---------------------------------------------------------------------------

def segment_run(run: str, words: frozenset[str], max_len: int) -> list[str]:
    """Greedy longest-match over one same-script run.  At each position
    the longest dictionary word wins; positions with no match group
    into one unknown token until the next match (UnknownDictionary
    character-category grouping analog)."""
    out: list[str] = []
    n = len(run)
    i = 0
    unk_start = -1
    while i < n:
        best = None
        for ln in range(min(max_len, n - i), 0, -1):
            cand = run[i:i + ln]
            if cand in words:
                best = cand
                break
        if best is None:
            if unk_start < 0:
                unk_start = i
            i += 1
            continue
        if unk_start >= 0:
            out.append(run[unk_start:i])
            unk_start = -1
        out.append(best)
        i += len(best)
    if unk_start >= 0:
        out.append(run[unk_start:])
    return out


# unigram lattice costs: a dictionary word beats up to two unknown
# chars; the epsilon length bonus makes equal-cost paths prefer longer
# words deterministically (greedy-compatible tie-break)
_WORD_COST = 1.0
_LEN_BONUS = 1e-3
_UNK_CHAR_COST = 2.5


def segment_run_viterbi(run: str, words: frozenset[str],
                        max_len: int) -> list[str]:
    """Minimum-cost lattice segmentation of one same-script run — the
    Kuromoji/Nori Viterbi shape (``ja/JapaneseTokenizer.java:62-120``)
    with unigram costs: dp[i] = cheapest segmentation of run[:i],
    edges = dictionary words ending at i (longest tried first, strict
    improvement required, so ties keep the longer word) or one unknown
    char.  Adjacent unknown chars on the best path merge into one
    token (UnknownDictionary character-category grouping analog)."""
    n = len(run)
    if n == 0:
        return []
    inf = float("inf")
    dp = [0.0] + [inf] * n
    back: list[tuple[int, bool] | None] = [None] * (n + 1)
    for i in range(1, n + 1):
        for ln in range(min(max_len, i), 0, -1):
            w = run[i - ln:i]
            if w in words:
                c = dp[i - ln] + _WORD_COST - _LEN_BONUS * ln
                if c < dp[i]:
                    dp[i] = c
                    back[i] = (i - ln, False)
        c = dp[i - 1] + _UNK_CHAR_COST
        if c < dp[i]:
            dp[i] = c
            back[i] = (i - 1, True)
    segs: list[tuple[str, bool]] = []
    i = n
    while i > 0:
        j, unk = back[i]  # type: ignore[misc]
        segs.append((run[j:i], unk))
        i = j
    segs.reverse()
    out: list[str] = []
    last_unk = False
    for t, unk in segs:
        if unk and last_unk:
            out[-1] += t
        else:
            out.append(t)
        last_unk = unk
    return out


@dataclass(frozen=True)
class DictSegAnalyzer:
    """Target-script runs segment by dictionary longest-match; all
    other text tokenizes with the engine's standard word rules +
    lowercase.  Every emitted token advances one position."""

    script: str = "thai"
    dict_path: str | None = None
    stop_words: frozenset = field(default_factory=frozenset)
    max_token_length: int = 255
    algo: str = "greedy"  # "viterbi" (ja/ko default) | "greedy" (thai)

    @cached_property
    def words(self) -> frozenset[str]:
        if self.dict_path:
            return load_dictionary(self.dict_path)
        return frozenset(SEED_WORDS[self.script])

    @cached_property
    def _max_word_len(self) -> int:
        return max((len(w) for w in self.words), default=1)

    @cached_property
    def _scan_re(self) -> re.Pattern:
        # one pass: target-script runs | standard word tokens
        return re.compile(
            f"(?P<seg>{_SCRIPT_RE[self.script].pattern})"
            f"|(?P<word>{TOKEN_RE.pattern})")

    def tokens(self, text: str) -> list[str]:
        return [t for t, _ in self.tokens_with_positions(text)]

    def tokens_with_positions(self, text: str) -> list[tuple[str, int]]:
        if not text:
            return []
        out: list[tuple[str, int]] = []
        pos = -1
        words, mx = self.words, self._max_word_len
        seg_fn = (segment_run_viterbi if self.algo == "viterbi"
                  else segment_run)
        for m in self._scan_re.finditer(text):
            if m.lastgroup == "seg":
                for w in seg_fn(m.group(), words, mx):
                    pos += 1
                    if w not in self.stop_words:
                        out.append((w, pos))
            else:
                pos += 1
                t = m.group()
                if len(t) > self.max_token_length:
                    continue
                t = t.lower()
                if t not in self.stop_words:
                    out.append((t, pos))
        return out


def resolve_dictseg(name: str) -> DictSegAnalyzer | None:
    """``dictseg:<script>[:<path>]`` name-spec resolution (the path may
    itself contain colons — split at most twice)."""
    parts = name.split(":", 2)
    if parts[0] != "dictseg" or len(parts) < 2:
        return None
    script = parts[1]
    if script not in _SCRIPT_RE:
        raise KeyError(f"dictseg script must be one of {sorted(_SCRIPT_RE)}, "
                       f"got {script!r}")
    return DictSegAnalyzer(
        script=script,
        dict_path=parts[2] if len(parts) == 3 else None,
        stop_words=STOP_SETS.get(script, frozenset()),
        # ja/ko lattice like the reference's Kuromoji/Nori; thai stays
        # maximal-matching like ICU's dictionary BreakIterator
        algo="viterbi" if script in ("japanese", "korean") else "greedy")
