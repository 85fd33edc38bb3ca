"""Snowball stemmers — exact ports of the published algorithms
(snowballstem.org, Snowball 2.2.0) for the languages whose reference
analyzer defaults to a Snowball stemmer rather than a light stemmer:

- Russian  (``ru/RussianAnalyzer.java:114`` -> ``org.tartarus.snowball
  .ext.RussianStemmer``)
- Swedish  (``sv/SwedishAnalyzer.java`` -> ``SwedishStemmer``)
- Norwegian (``no/NorwegianAnalyzer.java`` -> ``NorwegianStemmer``)
- Danish   (``da/DanishAnalyzer.java`` -> ``DanishStemmer``)

Suffix tables and control flow were verified entry-by-entry against
the reference's generated sources
(``org/tartarus/snowball/ext/{Russian,Swedish,Norwegian,Danish}Stemmer
.java``); the code below is a clean re-expression of the algorithm,
not a translation of the generated state machine.

Semantics shared by all four (the Snowball runtime contract):

- ``find_among_b`` picks the LONGEST suffix that fits entirely inside
  the backward window (the restricting region); if that entry's
  condition then fails, the whole routine fails — there is NO
  fallback to a shorter suffix.
- Region R1 = after the first non-vowel following a vowel; R2 = R1's
  rule applied inside R1; RV (Russian) = after the first vowel.  The
  Scandinavian languages clamp R1 to start no earlier than char 3.
"""

from __future__ import annotations

# ---------------------------------------------------------------------------
# shared helpers


def _longest_suffix(word: str, sufs, window_start: int):
    """Longest suffix of ``word`` lying entirely at or after
    ``window_start`` (find_among_b within limit_backward); None if no
    entry fits."""
    best = None
    for s in sufs:
        if (best is None or len(s) > len(best)) \
                and word.endswith(s) and len(word) - len(s) >= window_start:
            best = s
    return best


# ---------------------------------------------------------------------------
# Russian (all steps confined to RV; derivational additionally in R2)

_RU_V = frozenset("аеиоуыэюя")

# group-1 entries require a preceding а/я (which itself must sit
# inside RV); the preceding vowel is kept
_RU_PG1 = ("в", "вши", "вшись")
_RU_PG2 = ("ив", "ивши", "ившись", "ыв", "ывши", "ывшись")
_RU_ADJ = ("ее", "ие", "ое", "ые", "ими", "ыми", "ей", "ий", "ой", "ый",
           "ем", "им", "ом", "ым", "его", "ого", "ему", "ому", "их", "ых",
           "ею", "ою", "ую", "юю", "ая", "яя")
_RU_PART1 = ("ем", "нн", "вш", "щ", "ющ")
_RU_PART2 = ("ивш", "ывш", "ующ")
_RU_VERB1 = ("ла", "на", "ете", "йте", "ли", "й", "л", "ем", "н", "ло",
             "но", "ет", "ют", "ны", "ть", "ешь", "нно")
_RU_VERB2 = ("ила", "ыла", "ена", "ите", "ейте", "уйте", "или", "ыли",
             "ей", "уй", "ил", "ыл", "им", "ым", "ен", "ило", "ыло",
             "ено", "ует", "ит", "ыт", "уют", "ят", "ены", "ить", "ыть",
             "ишь", "ю", "ую")
_RU_NOUN = ("а", "ев", "ов", "е", "ие", "ье", "и", "еи", "ии", "ами",
            "ями", "иями", "й", "ей", "ией", "ий", "ой", "ам", "ем",
            "ием", "ом", "ям", "иям", "о", "у", "ах", "ях", "иях", "ы",
            "ь", "ю", "ию", "ью", "я", "ия", "ья")


def _ru_regions(w: str) -> tuple[int, int]:
    n = len(w)
    pv = n
    for i, ch in enumerate(w):
        if ch in _RU_V:
            pv = i + 1
            break
    # p1 then p2 (standard R1/R2 over the full word)
    # R1: first non-vowel at/after pV (everything from pV on follows
    # a vowel)
    i = pv
    p1 = n
    while i < n:
        if w[i] not in _RU_V:
            p1 = i + 1
            break
        i += 1
    p2 = n
    i = p1
    while i < n and w[i] not in _RU_V:
        i += 1
    while i < n:
        if w[i] not in _RU_V:
            p2 = i + 1
            break
        i += 1
    return pv, p2


def _ru_grouped(w: str, pv: int, g1, g2):
    """find_among_b over g1|g2 where g1 entries require a preceding
    а/я inside RV.  Returns the stemmed word, or None when the class
    fails (longest match's condition failing fails the class)."""
    best = _longest_suffix(w, tuple(g1) + tuple(g2), pv)
    if best is None:
        return None
    pos = len(w) - len(best)
    if best in g2:
        return w[:pos]
    # group 1: preceding а/я, itself within RV
    if pos - 1 >= pv and w[pos - 1] in ("а", "я"):
        return w[:pos]
    return None


def russian_snowball_stem(word: str) -> str:
    """Snowball Russian (``snowball_russian.sbl``; tables verified vs
    ``org/tartarus/snowball/ext/RussianStemmer.java:18-173``)."""
    w = word.replace("ё", "е")
    pv, p2 = _ru_regions(w)
    if pv >= len(w):
        return w

    # -- step 1: perfective gerund, else [reflexive] + one of
    #    adjectival / verb / noun
    out = _ru_grouped(w, pv, _RU_PG1, _RU_PG2)
    if out is not None:
        w = out
    else:
        refl = _longest_suffix(w, ("ся", "сь"), pv)
        if refl is not None:
            w = w[:len(w) - len(refl)]
        adj = _longest_suffix(w, _RU_ADJ, pv)
        if adj is not None:
            w = w[:len(w) - len(adj)]
            part = _ru_grouped(w, pv, _RU_PART1, _RU_PART2)
            if part is not None:
                w = part
        else:
            out = _ru_grouped(w, pv, _RU_VERB1, _RU_VERB2)
            if out is not None:
                w = out
            else:
                noun = _longest_suffix(w, _RU_NOUN, pv)
                if noun is not None:
                    w = w[:len(w) - len(noun)]

    # -- step 2: drop a final и (within RV)
    if w.endswith("и") and len(w) - 1 >= pv:
        w = w[:-1]

    # -- step 3: derivational ост/ость, ending must lie in R2
    der = _longest_suffix(w, ("ост", "ость"), pv)
    if der is not None and len(w) - len(der) >= p2:
        w = w[:len(w) - len(der)]

    # -- step 4: tidy up (longest of ейше/ейш/н/ь within RV)
    tidy = _longest_suffix(w, ("ейше", "ейш", "н", "ь"), pv)
    if tidy in ("ейше", "ейш"):
        w = w[:len(w) - len(tidy)]
        if w.endswith("нн") and len(w) - 2 >= pv:  # both н inside RV
            w = w[:-1]
    elif tidy == "н":
        if w.endswith("нн") and len(w) - 2 >= pv:
            w = w[:-1]
    elif tidy == "ь":
        w = w[:-1]
    return w


# ---------------------------------------------------------------------------
# Scandinavian trio (R1 with the 3-char clamp)

_SV_V = frozenset("aeiouyäåö")
_SV_MAIN = ("a", "arna", "erna", "heterna", "orna", "ad", "e", "ade",
            "ande", "arne", "are", "aste", "en", "anden", "aren", "heten",
            "ern", "ar", "er", "heter", "or", "as", "arnas", "ernas",
            "ornas", "es", "ades", "andes", "ens", "arens", "hetens",
            "erns", "at", "andet", "het", "ast")
_SV_S_END = frozenset("bcdfghjklmnoprtvy")
_SV_PAIRS = ("dd", "gd", "nn", "dt", "gt", "kt", "tt")
_SV_OST_END = frozenset("iklnprtuv")


def _scand_r1(w: str, vowels) -> int:
    n = len(w)
    i = 0
    while i < n and w[i] not in vowels:
        i += 1
    while i < n and w[i] in vowels:
        i += 1
    p1 = i + 1 if i < n else n
    return min(max(p1, 3), n)


def _consonant_pair_del(w: str, p1: int, pairs) -> str:
    """If the word ends with one of ``pairs`` entirely inside R1,
    delete the LAST letter."""
    best = _longest_suffix(w, pairs, p1)
    return w[:-1] if best is not None else w


def swedish_snowball_stem(word: str) -> str:
    """Snowball Swedish (tables verified vs
    ``org/tartarus/snowball/ext/SwedishStemmer.java``)."""
    w = word
    p1 = _scand_r1(w, _SV_V)
    # main suffix (longest in R1; 's' needs a valid s-ending before it,
    # checked OUTSIDE the R1 window — limit restored before the test)
    best = _longest_suffix(w, _SV_MAIN + ("s",), p1)
    if best == "s":
        if len(w) >= 2 and w[-2] in _SV_S_END:
            w = w[:-1]
    elif best is not None:
        w = w[:len(w) - len(best)]
    w = _consonant_pair_del(w, p1, _SV_PAIRS)
    # other suffix (in R1): delete lig/ig/els; öst->ös after ost-ending;
    # fullt->full
    best = _longest_suffix(w, ("ig", "lig", "els", "fullt", "öst"), p1)
    if best in ("ig", "lig", "els"):
        w = w[:len(w) - len(best)]
    elif best == "fullt":
        w = w[:-5] + "full"
    elif best == "öst":
        if len(w) >= 4 and w[-4] in _SV_OST_END:
            w = w[:-3] + "ös"
    return w


_NO_V = frozenset("aeiouyæåø")
_NO_MAIN = ("a", "e", "ede", "ande", "ende", "ane", "ene", "hetene",
            "en", "heten", "ar", "er", "heter", "as", "es", "edes",
            "endes", "enes", "hetenes", "ens", "hetens", "ers", "ets",
            "et", "het", "ast")
_NO_ERT = ("erte", "ert")
_NO_S_END = frozenset("bcdfghjlmnoprtvyz")
_NO_PAIRS = ("dt", "vt")
_NO_OTHER = ("leg", "eleg", "ig", "eig", "lig", "elig", "els", "lov",
             "elov", "slov", "hetslov")


def norwegian_snowball_stem(word: str) -> str:
    """Snowball Norwegian (tables verified vs
    ``org/tartarus/snowball/ext/NorwegianStemmer.java``)."""
    w = word
    p1 = _scand_r1(w, _NO_V)
    best = _longest_suffix(w, _NO_MAIN + _NO_ERT + ("s",), p1)
    if best == "s":
        # valid s-ending, or k not preceded by a vowel (tested outside
        # the R1 window)
        if len(w) >= 2 and (w[-2] in _NO_S_END
                            or (w[-2] == "k" and len(w) >= 3
                                and w[-3] not in _NO_V)):
            w = w[:-1]
    elif best in _NO_ERT:
        w = w[:len(w) - len(best)] + "er"
    elif best is not None:
        w = w[:len(w) - len(best)]
    w = _consonant_pair_del(w, p1, _NO_PAIRS)
    best = _longest_suffix(w, _NO_OTHER, p1)
    if best is not None:
        w = w[:len(w) - len(best)]
    return w


_DA_V = frozenset("aeiouyæåø")
_DA_MAIN = ("hed", "ethed", "ered", "e", "erede", "ende", "erende",
            "ene", "erne", "ere", "en", "heden", "eren", "er", "heder",
            "erer", "heds", "es", "endes", "erendes", "enes", "ernes",
            "eres", "ens", "hedens", "erens", "ers", "ets", "erets",
            "et", "eret")
_DA_S_END = frozenset("abcdfghjklmnoprtvyzå")
_DA_PAIRS = ("gd", "dt", "gt", "kt")
_DA_CONS = frozenset("bcdfghjklmnpqrstvwxz")


def danish_snowball_stem(word: str) -> str:
    """Snowball Danish (tables verified vs
    ``org/tartarus/snowball/ext/DanishStemmer.java``)."""
    w = word
    p1 = _scand_r1(w, _DA_V)
    best = _longest_suffix(w, _DA_MAIN + ("s",), p1)
    if best == "s":
        if len(w) >= 2 and w[-2] in _DA_S_END:
            w = w[:-1]
    elif best is not None:
        w = w[:len(w) - len(best)]
    w = _consonant_pair_del(w, p1, _DA_PAIRS)
    # other suffix: first strip st after ig (anywhere — the igst test
    # runs before the R1-limited among), then ig/lig/elig/els in R1
    # (+ consonant pair again), or løst -> løs
    if w.endswith("igst"):
        w = w[:-2]
    best = _longest_suffix(w, ("ig", "lig", "elig", "els", "løst"), p1)
    if best == "løst":
        w = w[:-1]
    elif best is not None:
        w = w[:len(w) - len(best)]
        w = _consonant_pair_del(w, p1, _DA_PAIRS)
    # undouble: final consonant in R1 equal to the char before it
    if (len(w) >= 2 and len(w) - 1 >= p1 and w[-1] in _DA_CONS
            and w[-2] == w[-1]):
        w = w[:-1]
    return w
