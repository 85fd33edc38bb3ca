"""Language analyzer chains beyond English — the role of the per-
language analyzers under
``lucene/analysis/common/src/java/org/apache/lucene/analysis/``
(FrenchAnalyzer.java, GermanAnalyzer.java, SpanishAnalyzer.java, ...):
StandardTokenizer -> LowerCaseFilter -> StopFilter (position gaps) ->
a LIGHT stemmer.

The light stemmers below are compact implementations in the spirit of
the published light-stemming family (J. Savoy, "Light stemming
approaches for the French, Portuguese, German and Hungarian
languages", SAC 2006 — the same lineage as Lucene's
``*LightStemmer.java`` classes): longest-matching plural/gender/
derivational suffix stripped once, guarded by a minimum stem length,
after folding language diacritics.  They are DOCUMENTED
SIMPLIFICATIONS, not ports — rule sets are smaller than Lucene's and
golden-locked by tests/test_analysis_languages.py so behavior is
stable.  Stop lists are the common high-frequency function words of
each language (public domain Snowball-style lists, abbreviated).

Every analyzer registers in :func:`lucene_1_spark.analysis.get_analyzer`
by name (``french``, ``german``, ``spanish``, ``italian``,
``portuguese``, ``dutch``) so a worker can reconstruct it from the
manifest string alone — the Analyzer.createComponents extension point
(``analysis/Analyzer.java:85``)."""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable

from lucene_1_spark.analysis.standard import TOKEN_RE

_DEACCENT = str.maketrans(
    "áàâäãåéèêëíìîïóòôöõúùûüçñýÿ",
    "aaaaaaeeeeiiiiooooouuuucnyy")


def _fold(t: str) -> str:
    return t.translate(_DEACCENT)


def _strip_longest(t: str, suffixes: tuple[str, ...], min_stem: int) -> str:
    """Strip the longest matching suffix once, if the remaining stem
    keeps at least ``min_stem`` characters."""
    for suf in suffixes:  # caller orders longest-first
        if t.endswith(suf) and len(t) - len(suf) >= min_stem:
            return t[:-len(suf)]
    return t


# -- per-language rules -----------------------------------------------------

FRENCH_STOP = frozenset("""au aux avec ce ces dans de des du elle en et eux
il ils je la le les leur lui ma mais me meme mes moi mon ne nos notre nous
on ou par pas pour qu que qui sa se ses son sur ta te tes toi ton tu un une
vos votre vous c d j l m n s t y été étée étées étés étant suis es est
sommes êtes sont serai seras sera serons serez seront aurai auras aura
ai as avons avez ont eu cette""".split())

_FR_SUF = ("issements", "issement", "ements", "ement", "ations", "ation",
           "ité", "ités", "ives", "ive", "eaux", "aux", "euses", "euse",
           "ées", "ée", "és", "é", "ers", "er", "ions", "ion",
           "ies", "ie", "es", "e", "s", "x")


def french_stem(t: str) -> str:
    if t.endswith("aux") and len(t) >= 5:
        return _fold(t[:-3] + "al")
    return _fold(_strip_longest(t, _FR_SUF, 4))


GERMAN_STOP = frozenset("""aber alle als also am an auch auf aus bei bin bis
da damit dann der den des dem die das dass du durch ein eine einem einen
einer eines er es für hat hatte haben ich ihr ihre im in ist ja kann kein
mich mir mit nach nicht noch nun nur oder sehr sich sie sind so über um und
uns unter vom von vor war waren was weiter wie wieder will wir wird zu zum
zur""".split())


def german_stem(t: str) -> str:
    t = _fold(t.replace("ß", "ss"))
    # iterative light stripping of inflectional endings (max 2 passes)
    for _ in range(2):
        out = _strip_longest(t, ("ern", "em", "en", "er", "es", "e", "s",
                                 "n"), 4)
        if out == t:
            break
        t = out
    return t


SPANISH_STOP = frozenset("""a al algo como con de del desde donde dos el
ella ellas ellos en entre era eres es esa ese eso esta este esto fue ha
han hasta hay la las le les lo los mas me mi mis muy nada ni no nos
nosotros o os otra otro para pero poco por porque que quien se ser si sin
sobre son soy su sus te tiene todo tu tus un una uno unos y ya yo""".split())

_ES_SUF = ("amientos", "amiento", "aciones", "acion", "idades", "idad",
           "mente", "ismos", "ismo", "istas", "ista", "ancias", "ancia",
           "osos", "osas", "oso", "osa", "icos", "icas", "ico", "ica",
           "es", "os", "as", "o", "a", "e")


def spanish_stem(t: str) -> str:
    return _strip_longest(_fold(t), _ES_SUF, 3)


ITALIAN_STOP = frozenset("""a ad agli ai al alla alle allo anche che chi ci
come con cui da dal dalla degli dei del della delle dello di dove e ed era
gli ha hanno i il in io la le lei lo loro lui ma mi nel nella noi non o
per piu quale quando questa queste questi questo se si sono su sua sue sui
suo tra tu un una uno voi""".split())


def italian_stem(t: str) -> str:
    t = _strip_longest(t, ("zione", "zioni", "mente", "ità"), 4)
    t = _fold(t)
    # final-vowel stripping for plural/gender (light rule)
    while len(t) > 4 and t[-1] in "aeio":
        t = t[:-1]
    return t


PORTUGUESE_STOP = frozenset("""a ao aos as até com como da das de dela dele
deles dem do dos e ela elas ele eles em entre era essa esse esta este eu
foi há isso isto já la lhe mais mas me mesmo meu minha muito na nao não
nas nem no nos nós o os ou para pela pelo por qual quando que quem se sem
ser seu sua são só também te tem tu tua um uma você""".split())

_PT_SUF = ("amentos", "amento", "ações", "ação", "idades", "idade",
           "mente", "ões", "ão", "es", "os", "as", "o", "a", "e", "s")


def portuguese_stem(t: str) -> str:
    # strip on the RAW token (suffixes like 'ões'/'ação' carry
    # diacritics), fold afterwards
    return _fold(_strip_longest(t, _PT_SUF, 3))


DUTCH_STOP = frozenset("""aan al alles als altijd andere ben bij daar dan
dat de der deze die dit doch doen door dus een en er ge geen geweest haar
had heb hebben heeft hem het hier hij hoe hun iemand iets ik in is ja je
kan kon kunnen maar me meer men met mij mijn moet na naar niet niets nog
nu of om omdat onder ons ook op over reeds te tegen toch toen tot u uit
uw van veel voor want waren was wat werd wezen wie wil worden wordt zal ze
zelf zich zij zijn zo zonder zou""".split())


def dutch_stem(t: str) -> str:
    t = _fold(t)
    # NB deliberately no 'ingen' rule: 'koningen' -> 'koning' via -en
    return _strip_longest(t, ("heden", "ing", "en", "e", "s"), 3)


# -- generic chain ----------------------------------------------------------

@dataclass(frozen=True)
class LanguageAnalyzer:
    """StandardTokenizer -> lowercase -> stop (position gaps) -> light
    stemmer; one instance per language, reconstructible by name."""

    name: str
    stop_words: frozenset
    stemmer: Callable[[str], str] = field(compare=False)
    max_token_length: int = 255

    def tokens(self, text: str) -> list[str]:
        return [t for t, _ in self.tokens_with_positions(text)]

    def tokens_with_positions(self, text: str) -> list[tuple[str, int]]:
        if not text:
            return []
        out = []
        pos = -1
        stem = self.stemmer
        for t in TOKEN_RE.findall(text):
            pos += 1
            if len(t) > self.max_token_length:
                continue
            t = t.lower()
            if t in self.stop_words:
                continue
            out.append((stem(t), pos))
        return out


LANGUAGE_ANALYZERS = {
    "french": ("french", FRENCH_STOP, french_stem),
    "german": ("german", GERMAN_STOP, german_stem),
    "spanish": ("spanish", SPANISH_STOP, spanish_stem),
    "italian": ("italian", ITALIAN_STOP, italian_stem),
    "portuguese": ("portuguese", PORTUGUESE_STOP, portuguese_stem),
    "dutch": ("dutch", DUTCH_STOP, dutch_stem),
}


def make_analyzer(name: str) -> LanguageAnalyzer | None:
    spec = LANGUAGE_ANALYZERS.get(name)
    if spec is None:
        return None
    return LanguageAnalyzer(*spec)
