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
``portuguese``, ``dutch``, ``russian``, ``swedish``, ``norwegian``,
``danish``, ``finnish``, ``hungarian``, ``czech``, ``romanian``,
``indonesian``, ``turkish``, ``arabic``) so a worker can reconstruct it
from the manifest string alone — the Analyzer.createComponents
extension point (``analysis/Analyzer.java:85``).  Turkish plugs a
language-specific casing step (İ→i, I→ı —
``TurkishLowerCaseFilter.java``) into the chain; Arabic normalizes
before stemming (``ArabicNormalizationFilter.java`` + light10-family
stemming, Larkey, Ballesteros & Connell 2002)."""

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


RUSSIAN_STOP = frozenset("""и в во не что он на я с со как а то все она так
его но да ты к у же вы за бы по только ее мне было вот от меня еще нет о из
ему теперь когда даже ну ли если уже или ни быть был него до вас нибудь
вам сказал себя ей может они есть надо ней для мы тебя их чем была сам чтоб
без будто чего раз тоже себе под будет же тогда кто этот того потому этого
какой ним здесь этом один почти мой тем чтобы нее были куда зачем всех
можно при об хотя""".split())

# adjectival + nominal endings, longest-first — the ending classes the
# published Russian light stemmers strip (RussianLightStemmer.java
# lineage); ё is folded to е first
_RU_SUF = ("иями", "ями", "ами", "иях", "иям", "ием", "ией", "ого", "его",
           "ому", "ему", "ыми", "ими", "ует", "уют", "ях", "ям", "ах", "ам",
           "ов", "ев", "ие", "ые", "ое", "ый", "ий", "ой", "ым", "им", "ом",
           "ем", "их", "ых", "ую", "юю", "ая", "яя", "ою", "ею", "ей", "ии",
           "и", "ы", "а", "я", "о", "е", "у", "ю", "й", "ь")


def russian_stem(t: str) -> str:
    return _strip_longest(t.replace("ё", "е"), _RU_SUF, 3)


SWEDISH_STOP = frozenset("""och det att i en jag hon som han på den med var
sig för så till är men ett om hade de av icke mig du henne då sin nu har
inte hans honom skulle hennes där min man ej vid kunde något från ut när
efter upp vi dem vara vad över än dig kan sina här ha mot alla under någon
eller allt mycket sedan ju denna själv detta åt utan varit hur ingen mitt
ni bli blev oss din dessa några deras blir mina samma vilken er sådan vår
blivit dess inom mellan sådant varför varje vilka ditt vem vilket sitta
sådana vart dina vars vårt våra ert era vilkas""".split())

_SV_SUF = ("heterna", "hetens", "heter", "heten", "andet", "arnas",
           "ernas", "ornas", "andes", "arna", "erna", "orna", "ande",
           "arne", "aste", "aren", "ades", "erns", "ade", "are", "ern",
           "ens", "ast", "het", "ad", "en", "ar", "er", "or", "as", "es",
           "at", "a", "e", "s", "t")


def swedish_stem(t: str) -> str:
    return _strip_longest(t, _SV_SUF, 3)


NORWEGIAN_STOP = frozenset("""og i jeg det at en et den til er som på de
med han av ikke ikkje der så var meg seg men ett har om vi min mitt ha
hadde hun nå over da ved fra du ut sin dem oss opp man kan hans hvor eller
hva skal selv sjøl her alle vil bli ble blei bli´ blitt kunne inn når være
kom noen noe ville dere som deres kun ja etter ned skulle denne for deg si
sine sitt mot å meget hvorfor dette disse uten hvordan ingen din ditt blir
samme hvilken hvilke sånn inni mellom vår hver hvem vors hvis både bare
enn fordi før mange også slik vært""".split())

_NO_SUF = ("hetenes", "hetene", "hetens", "heter", "heten", "endes",
           "ande", "ende", "edes", "enes", "erte", "ede", "ane", "ene",
           "ens", "ers", "ets", "het", "ast", "ert", "en", "ar", "er",
           "as", "es", "et", "a", "e", "s")


def norwegian_stem(t: str) -> str:
    return _strip_longest(t, _NO_SUF, 3)


DANISH_STOP = frozenset("""og i jeg det at en den til er som på de med han
af for ikke der var mig sig men et har om vi min havde ham hun nu over da
fra du ud sin dem os op man hans hvor eller hvad skal selv her alle vil
blev kunne ind når være dog noget ville jo deres efter ned skulle denne
end dette mit også under have dig anden hende mine alt meget sit sine vor
mod disse hvis din nogle hos blive mange ad bliver hendes været thi jer
sådan""".split())

_DA_SUF = ("erendes", "erende", "hedens", "ernes", "erens", "heden",
           "heder", "erne", "eres", "eren", "erer", "ende", "enes", "eds",
           "ene", "ens", "ers", "ets", "hed", "en", "er", "es", "et", "e",
           "s")


def danish_stem(t: str) -> str:
    return _strip_longest(t, _DA_SUF, 3)


FINNISH_STOP = frozenset("""olla olen olet on olemme olette ovat ole oli
olisi olisit olisin olisimme olisitte olisivat olit olin olimme olitte
olivat ollut olleet en et ei emme ette eivät minä minun minut minua
minussa minusta minuun minulla minulta minulle sinä sinun hän hänen se sen
sitä siinä siitä siihen sillä siltä sille me te he tämä tuo nämä nuo ja
jos koska kun niin nyt sekä mutta vaan vai eli tai myös vielä jo kuin
kanssa mistä mitä missä miksi kuka mikä kaikki joka jotka että""".split())

# possessive suffixes then case endings — two light passes over the
# agglutinative tail (FinnishLightStemmer lineage); ä/ö kept (no fold)
_FI_POSS = ("nsa", "nsä", "mme", "nne", "ni", "si")
_FI_CASE = ("ssa", "ssä", "sta", "stä", "lla", "llä", "lta", "ltä",
            "lle", "ksi", "tta", "ttä", "ina", "inä", "iin", "han", "hän",
            "den", "tten", "ien", "in", "an", "än", "en", "on", "ön",
            "un", "yn", "a", "ä", "n", "t")


def finnish_stem(t: str) -> str:
    t = _strip_longest(t, _FI_POSS, 4)
    t = _strip_longest(t, _FI_CASE, 3)
    return t


HUNGARIAN_STOP = frozenset("""a az és vagy hogy van volt lesz nem igen ez
azt ezt egy itt ott el le fel ki be meg is mint csak már még mindig soha
mi ti ők én te ő mert ha de hát majd most aztán akkor így úgy nagyon
jól rossz minden semmi valami akármi bármi és azonban tehát ezért amely
amelyek aki akik ami amik után előtt alatt felett között által nélkül
óta ellen felé körül mellett""".split())

_HU_SUF = ("okkal", "ekkel", "akkal", "ökkel", "aknak", "eknek", "unkat",
           "ünket", "nak", "nek", "val", "vel", "ban", "ben", "ból",
           "ből", "ról", "ről", "tól", "től", "hoz", "hez", "höz", "ra",
           "re", "ba", "be", "on", "en", "ön", "at", "et", "ot", "öt",
           "ok", "ek", "ak", "ik", "t", "n", "k")

_HU_DEACCENT = str.maketrans("áéíóöőúüű", "aeiooouuu")


def hungarian_stem(t: str) -> str:
    # two passes over the agglutinative tail (case ending then plural:
    # házakban -> házak -> ház), like the German chain
    for _ in range(2):
        out = _strip_longest(t, _HU_SUF, 3)
        if out == t:
            break
        t = out
    return t.translate(_HU_DEACCENT)


CZECH_STOP = frozenset("""a aby ale ani aniž až bez bude budem budeš by byl
byla byli bylo být co což cz či další dnes do ho i jak jake jaké je jeho
jej její jejich jen ještě ji jiné již jsem jseš jsme jsou jste k kam kde
kdo když ke která které kterou který kteří ku ma má mají máte mezi mi mít
mně mnou můj může my na nad nám námi naši ne nebo nebyl není nejsou než
ní nic nové nový o od ode on ona oni ono ony pak po pod podle pokud pouze
práve pro proč proto protože při s se si sice spolu sve svůj svých svým
svými ta tak také tato te tě tedy ten tento této tím tímto to tohle toho
tomto tomu tu tuto ty tyto u už v vám váš ve více však všech vy z za zde
ze že""".split())

_CZ_SUF = ("atech", "ětem", "atům", "ými", "ach", "ech", "ich", "ách",
           "ích", "ého", "ěmi", "emi", "ému", "ete", "eti", "iho", "ího",
           "ími", "imu", "ata", "aty", "ých", "ama", "ami", "ové", "ovi",
           "em", "es", "ém", "ím", "ům", "at", "ám", "os", "us", "ým",
           "mi", "ou", "e", "i", "í", "ě", "u", "y", "ů", "a", "o", "á",
           "é", "ý")

_CZ_DEACCENT = str.maketrans("áčďéěíňóřšťúůýž", "acdeeinorstuuyz")


def czech_stem(t: str) -> str:
    return _strip_longest(t, _CZ_SUF, 3).translate(_CZ_DEACCENT)


ROMANIAN_STOP = frozenset("""si și în de la a ale cu pe este sunt care o un
una unui unei lor lui ei el ea noi voi ele dar sau nu se ce mai pentru din
fi fost am ai are avea dacă după până când cum unde aici acolo acest
această aceste acesta aceasta prin fără între asupra către sub peste
atunci deci insa însă ca să îi îl ne vă mă te""".split())

_RO_SUF = ("urilor", "ărilor", "iilor", "ilor", "elor", "ului", "iile",
           "atei", "ația", "aţia", "uri", "ule", "ea", "le", "ii", "ul",
           "ă", "a", "e", "i")

_RO_DEACCENT = str.maketrans("ăâîșşțţ", "aaisstt")


def romanian_stem(t: str) -> str:
    return _strip_longest(t, _RO_SUF, 3).translate(_RO_DEACCENT)


INDONESIAN_STOP = frozenset("""yang dan di ke dari ini itu dengan untuk
pada adalah sebagai juga tidak atau oleh akan telah sudah bisa ada mereka
kami kita saya anda dia ia nya para lebih karena jika maka namun tetapi
saat ketika hanya masih harus dapat dalam antara setelah sebelum bahwa
seperti secara tersebut begitu yaitu bagi""".split())

_ID_PART = ("lah", "kah", "pun")
_ID_POSS = ("nya", "ku", "mu")
_ID_DSUF = ("kan", "an", "i")
_ID_PREF = ("menge", "penge", "meng", "peng", "meny", "peny", "men",
            "pen", "mem", "pem", "ber", "per", "ter", "me", "pe", "di",
            "ke", "se", "be")


def indonesian_stem(t: str) -> str:
    """One particle, one possessive, one derivational suffix, one
    derivational prefix — the light subset of the reference's
    IndonesianStemmer (Asian, Williams & Tahaghoghi lineage)."""
    t = _strip_longest(t, _ID_PART, 3)
    t = _strip_longest(t, _ID_POSS, 3)
    t = _strip_longest(t, _ID_DSUF, 3)
    for p in _ID_PREF:
        if t.startswith(p) and len(t) - len(p) >= 3:
            t = t[len(p):]
            break
    return t


TURKISH_STOP = frozenset("""ve bir bu da de için ile olarak daha çok en
gibi kadar sonra önce ama fakat ancak veya ya ki mi mı mu mü ne o şu ben
sen biz siz onlar her hiç çünkü eğer yani ise değil var yok olan olduğu
üzere göre dolayı beri başka diğer aynı tüm bütün bazı birkaç""".split())

_TR_SUF = ("larının", "lerinin", "larında", "lerinde", "larından",
           "lerinden", "ların", "lerin", "lara", "lere", "ları", "leri",
           "dan", "den", "tan", "ten", "nın", "nin", "nun", "nün", "lar",
           "ler", "da", "de", "ta", "te", "ya", "ye", "sı", "si", "su",
           "sü", "ın", "in", "un", "ün", "ı", "i", "u", "ü", "a", "e")


def turkish_lower(t: str) -> str:
    """Turkish casing (TurkishLowerCaseFilter.java): İ→i and I→ı BEFORE
    the generic lowercase, preserving the dotted/dotless distinction."""
    return t.replace("İ", "i").replace("I", "ı").lower()


def turkish_stem(t: str) -> str:
    return _strip_longest(t, _TR_SUF, 3)


ARABIC_STOP = frozenset("""في من على إلى عن أن إن كان كانت هذا هذه ذلك تلك
التي الذي الذين ما لا لم لن هو هي هم أو ثم بل قد كل بعض غير بين حتى إذا
لكن كما له لها لهم فيه فيها منه منها عند أي كيف أين متى هل نحن أنا أنت
ليس ليست ألا إلا و يا""".split())

_AR_DIACRITICS = dict.fromkeys(map(ord, "ًٌٍَُ"
                                        "ِّْـ"))
_AR_NORM = str.maketrans({"أ": "ا", "إ": "ا", "آ": "ا", "ى": "ي",
                          "ة": "ه"})

_AR_PREF = ("وال", "بال", "كال", "فال", "ال", "لل", "و")
_AR_SUF = ("ها", "ان", "ات", "ون", "ين", "يه", "يه", "ية", "ه", "ه",
           "ي", "ا")


def arabic_normalize(t: str) -> str:
    """ArabicNormalizationFilter: strip tatweel + harakat, fold alef
    variants to bare alef, alef-maqsura to ya, ta-marbuta to ha."""
    return t.translate(_AR_DIACRITICS).translate(_AR_NORM)


def arabic_stem(t: str) -> str:
    """Light10-style stemming (Larkey, Ballesteros & Connell 2002 —
    the algorithm family behind ArabicStemmer.java): one definite-
    article/conjunction prefix, one suffix, each guarded by stem
    length."""
    t = arabic_normalize(t)
    for p in _AR_PREF:
        if t.startswith(p) and len(t) - len(p) >= 2:
            t = t[len(p):]
            break
    return _strip_longest(t, _AR_SUF, 2)


# -- generic chain ----------------------------------------------------------

@dataclass(frozen=True)
class LanguageAnalyzer:
    """StandardTokenizer -> lowercase -> stop (position gaps) -> light
    stemmer; one instance per language, reconstructible by name."""

    name: str
    stop_words: frozenset
    stemmer: Callable[[str], str] = field(compare=False)
    max_token_length: int = 255
    # language-specific casing (TurkishLowerCaseFilter analog); the
    # default is the generic LowerCaseFilter
    lowercase: Callable[[str], str] = field(compare=False, default=str.lower)

    def tokens(self, text: str) -> list[str]:
        return [t for t, _ in self.tokens_with_positions(text)]

    def tokens_with_positions(self, text: str) -> list[tuple[str, int]]:
        if not text:
            return []
        out = []
        pos = -1
        stem = self.stemmer
        lower = self.lowercase
        for t in TOKEN_RE.findall(text):
            pos += 1
            if len(t) > self.max_token_length:
                continue
            t = lower(t)
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
    "russian": ("russian", RUSSIAN_STOP, russian_stem),
    "swedish": ("swedish", SWEDISH_STOP, swedish_stem),
    "norwegian": ("norwegian", NORWEGIAN_STOP, norwegian_stem),
    "danish": ("danish", DANISH_STOP, danish_stem),
    "finnish": ("finnish", FINNISH_STOP, finnish_stem),
    "hungarian": ("hungarian", HUNGARIAN_STOP, hungarian_stem),
    "czech": ("czech", CZECH_STOP, czech_stem),
    "romanian": ("romanian", ROMANIAN_STOP, romanian_stem),
    "indonesian": ("indonesian", INDONESIAN_STOP, indonesian_stem),
    "turkish": ("turkish", TURKISH_STOP, turkish_stem, 255, turkish_lower),
    "arabic": ("arabic", ARABIC_STOP, arabic_stem),
}


def make_analyzer(name: str) -> LanguageAnalyzer | None:
    spec = LANGUAGE_ANALYZERS.get(name)
    if spec is None:
        return None
    return LanguageAnalyzer(*spec)
