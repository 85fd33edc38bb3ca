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
``indonesian``, ``turkish``, ``arabic``, ``greek``, ``persian``,
``hindi``, ``bulgarian``) so a worker can reconstruct it
from the manifest string alone — the Analyzer.createComponents
extension point (``analysis/Analyzer.java:85``).  Turkish plugs a
language-specific casing step (İ→i, I→ı —
``TurkishLowerCaseFilter.java``) into the chain; Arabic normalizes
before stemming (``ArabicNormalizationFilter.java`` + light10-family
stemming, Larkey, Ballesteros & Connell 2002)."""

from __future__ import annotations

from lucene_1_spark.analysis import snowball as _snow

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


# -- Greek (el) -------------------------------------------------------------
# GreekAnalyzer.java: StandardTokenizer -> GreekLowerCaseFilter ->
# StopFilter -> GreekStemFilter.  The lowercase filter is implemented
# EXACTLY (``el/GreekLowerCaseFilter.java:49-107``): final sigma and
# tonos/dialytika variants fold to the bare lowercase base.  The
# stemmer is a documented light simplification of the full Ntais
# algorithm (``el/GreekStemmer.java``, 957 lines): longest inflectional
# suffix stripped once over σ-folded lowercase text.

GREEK_STOP = frozenset("""ο η το οι τα του τησ των τον την και κι κ ειμαι
εισαι ειναι ειμαστε ειστε στο στον στη στην μα αλλα απο για προσ με σε ωσ
παρα αντι κατα μετα θα να δε δεν μη μην επι ενω εαν αν τοτε που πωσ ποιοσ
ποια ποιο ποιοι ποιεσ ποιων ποιουσ αυτοσ αυτη αυτο αυτοι αυτων αυτουσ
αυτεσ αυτα εκεινοσ εκεινη εκεινο εκεινοι εκεινεσ εκεινα εκεινων εκεινουσ
οπωσ ομωσ ισωσ οσο οτι""".split())

_EL_FOLD = str.maketrans({
    "ς": "σ",            # final sigma -> sigma
    "ά": "α", "έ": "ε", "ή": "η", "ό": "ο", "ώ": "ω",
    "ί": "ι", "ϊ": "ι", "ΐ": "ι",
    "ύ": "υ", "ϋ": "υ", "ΰ": "υ",
})


def greek_lower(t: str) -> str:
    """GreekLowerCaseFilter.java:49-107 — lowercase + final-sigma fold
    + tonos/dialytika removal."""
    return t.lower().translate(_EL_FOLD)


_EL_SUF = ("ουδεσ", "ουδων", "ματων", "ματοσ", "ματα", "τεροσ", "τερη",
           "τερο", "τερα", "τατοσ", "τατη", "τατο", "ικοσ", "ικη", "ικο",
           "ικα", "ειο", "ειου", "ειων", "ιων", "εων", "ουσ", "εισ",
           "εσ", "ων", "οσ", "ησ", "ασ", "οι", "αι", "ου", "α", "η",
           "ο", "ι", "ε", "υ")


def greek_stem(t: str) -> str:
    return _strip_longest(t, _EL_SUF, 3)


# -- Persian (fa) -----------------------------------------------------------
# PersianAnalyzer.java: char filter (ZWNJ -> space; our tokenizer
# splits on ZWNJ naturally) -> LowerCase -> ArabicNormalizationFilter
# -> PersianNormalizationFilter -> StopFilter -> PersianStemFilter.
# Normalization (``fa/PersianNormalizer.java:36-77``): farsi yeh /
# yeh-barree -> arabic yeh, keheh -> kaf, heh+yeh / heh-goal -> heh,
# hamza-above deleted — applied AFTER the Arabic fold, exactly the
# reference stack.  Stemming (``fa/PersianStemmer.java:33-62``): the
# suffix list is applied IN SEQUENCE (not longest-only), each strip
# guarded by >= 2 remaining characters.

PERSIAN_STOP = frozenset("""انان نداشته سراسر ايشان وي تاكنون بيشتري دوم پس
ناشي يا داشتند سپس هنگام هرگز پنج نشان امسال ديگر گروهي شدند چطور ده و دو
نخستين ولي چرا چه وسط ه كدام قابل يك رفت هفت همچنين در هزار بله بلي شايد
اما شناسي گرفته دهد داشته دانست داشتن خواهيم اين كه را با هم براي از تا
انها بود شد است هستند بايد شود مي ما او خود دارد هاي نيز اگر ان نه هر من
ديگري رو روي گفت ويژه اند بار بخش بين""".split())

_FA_MAP = str.maketrans({
    "ی": "ي", "ے": "ي",   # FARSI YEH / YEH BARREE -> YEH
    "ک": "ك",             # KEHEH -> KAF
    "ۀ": "ه", "ہ": "ه",   # HEH WITH YEH / HEH GOAL -> HEH
})


def persian_normalize(t: str) -> str:
    return arabic_normalize(t).translate(_FA_MAP).replace("ٔ", "")


def persian_lower(t: str) -> str:
    return persian_normalize(t.lower())


_FA_SUF = ("ات", "ان", "ترين", "تر", "يي", "ي", "ها", "‌")


def persian_stem(t: str) -> str:
    for suf in _FA_SUF:
        if len(t) >= len(suf) + 2 and t.endswith(suf):
            t = t[:-len(suf)]
    return t


# -- Hindi (hi) -------------------------------------------------------------
# HindiAnalyzer.java: StandardTokenizer -> LowerCase ->
# IndicNormalization -> HindiNormalization -> StopFilter ->
# HindiStemFilter.  The normalizer (``hi/HindiNormalizer.java:43-150``,
# Ljiljana Dolamic & Jacques Savoy, "Indexing and Searching Strategies
# for the Russian ... Hindi Languages") folds nukta forms, candrabindu
# -> bindu, dead-n -> bindu, deletes virama/ZWJ/ZWNJ, and shortens
# long vowels; the stemmer (``hi/HindiStemmer.java``, A. Ramanathan &
# D. Rao, "A Lightweight Stemmer for Hindi") strips the published
# 1-5-character suffix table, longest first, keeping >= 2 characters.
# The separate Indic canonicalization pass is a documented
# simplification (composed input assumed).

HINDI_STOP = frozenset("""अंदर अत अपना अपनी अपने अभी आदि आप इन इस इसका इसकी
इसके इसमें इसी इसे उन उनका उनकी उनके उस एक एवं ऐसे और कई कर करता करते करना
करने का कि किया किस किसी की कुछ के को कोई गया जब जा जैसे जो तक तब तो था थी
थे दो न ना नहीं ने पर फिर बाद बन बहुत भी मे में यदि यह यहाँ या ये रहा रहे
लिए वह वाले वे सब सकता से ही हुआ हुई हुए है हैं हो होता होती होने""".split())

# Devanagari combining signs are UAX#29 Extend: they stay INSIDE a
# word run (candrabindu/anusvara/visarga, nukta, dependent vowel
# signs, virama, stress marks, vocalic signs) along with ZWNJ/ZWJ,
# which the normalizer later deletes — without this the default \\w
# runs would split every conjunct at its matra.
import re as _re2

_HI_EXT = ("\u0900-\u0903\u093A-\u093C\u093E-\u094F"
           "\u0951-\u0957\u0962-\u0963\u200C\u200D")
_HI_TOKEN_RE = _re2.compile(rf"\w[\w{_HI_EXT}]*")

_HI_DELETE = dict.fromkeys(
    [0x093C, 0x094D, 0x200C, 0x200D])  # nukta, virama, ZWNJ, ZWJ
_HI_MAP = str.maketrans({
    "\u0901": "\u0902",                     # candrabindu -> bindu
    "\u0929": "\u0928", "\u0931": "\u0930",  # nukta consonants
    "\u0934": "\u0933",
    "\u0958": "\u0915", "\u0959": "\u0916", "\u095A": "\u0917",
    "\u095B": "\u091C", "\u095C": "\u0921", "\u095D": "\u0922",
    "\u095E": "\u092B", "\u095F": "\u092F",
    "\u0945": "\u0947", "\u0946": "\u0947",  # chandra/short e signs
    "\u0949": "\u094B", "\u094A": "\u094B",  # chandra/short o signs
    "\u090D": "\u090F", "\u090E": "\u090F",
    "\u0911": "\u0913", "\u0912": "\u0913", "\u0972": "\u0905",
    "\u0906": "\u0905", "\u0908": "\u0907",  # long -> short vowels
    "\u090A": "\u0909", "\u0960": "\u090B", "\u0961": "\u090C",
    "\u0910": "\u090F", "\u0914": "\u0913",
    "\u0940": "\u093F", "\u0942": "\u0941",  # dependent long -> short
    "\u0944": "\u0943", "\u0963": "\u0962",
    "\u0948": "\u0947", "\u094C": "\u094B",
})


def hindi_normalize(t: str) -> str:
    # dead n (न + virama) -> bindu, before the blanket virama delete
    return (t.replace("न्", "ं")
            .translate(_HI_MAP).translate(_HI_DELETE))


def hindi_lower(t: str) -> str:
    return hindi_normalize(t.lower())


_HI_SUF = (
    (5, ("ाएंगी", "ाएंगे", "ाऊंगी", "ाऊंगा", "ाइयाँ", "ाइयों", "ाइयां")),
    (4, ("ाएगी", "ाएगा", "ाओगी", "ाओगे", "एंगी", "ेंगी", "एंगे", "ेंगे",
         "ूंगी", "ूंगा", "ातीं", "नाओं", "नाएं", "ताओं", "ताएं", "ियाँ",
         "ियों", "ियां")),
    (3, ("ाकर", "ाइए", "ाईं", "ाया", "ेगी", "ेगा", "ोगी", "ोगे", "ाने",
         "ाना", "ाते", "ाती", "ाता", "तीं", "ाओं", "ाएं", "ुओं", "ुएं",
         "ुआं")),
    (2, ("कर", "ाओ", "िए", "ाई", "ाए", "ने", "नी", "ना", "ते", "ीं", "ती",
         "ता", "ाँ", "ां", "ों", "ें")),
    (1, ("ो", "े", "ू", "ु", "ी", "ि", "ा")),
)


def hindi_stem(t: str) -> str:
    for k, sufs in _HI_SUF:
        if len(t) > k + 1 and t.endswith(sufs):
            return t[:-k]
    return t


# -- Bulgarian (bg) ---------------------------------------------------------
# BulgarianAnalyzer.java: StandardTokenizer -> LowerCase -> StopFilter
# -> BulgarianStemFilter.  The stemmer implements the published light
# algorithm (J. Savoy, "Searching Strategies for the Bulgarian
# Language"; ``bg/BulgarianStemmer.java:33-170``): definite article,
# plural forms (with the к/г/х and е->я alternations), final vowels,
# ен -> н, and the fleeting ъ.

BULGARIAN_STOP = frozenset("""а аз ако ала без беше би бил била били било
близо бъдат бъде бяха в вас ваш вече ви вие винаги все всеки всички всичко
всяка във върху г ги го д да дали до докато дори досега доста е едва един
за зад заедно затова защо защото и из или им има имат иска й как каква
какво както какъв като кога когато което които кой който колко която къде
където към ли м ме между мен ми мога могат може му н на над най нас не
него нея ни ние никой нито но някои някой няма около освен от отново още
пак по повече под поне порaди после почти пред преди през при пък първо с
са само се сега си след сме според сред срещу сте съм със също т тази така
такива такъв там те тези ти то това тогава този той толкова точно трябва
тук тъй тя тях у харесва ч че често чрез ще щом я""".split())


def _bg_article(t: str) -> str:
    n = len(t)
    if n > 6 and t.endswith("ият"):
        return t[:-3]
    if n > 5 and t.endswith(("ът", "то", "те", "та", "ия")):
        return t[:-2]
    if n > 4 and t.endswith("ят"):
        return t[:-2]
    return t


def _bg_plural(t: str) -> str:
    n = len(t)
    if n > 6:
        if t.endswith("овци"):
            return t[:-3]            # -> ...о
        if t.endswith("ове"):
            return t[:-3]
        if t.endswith("еве"):
            return t[:-3] + "й"
    if n > 5:
        if t.endswith("ища"):
            return t[:-3]
        if t.endswith("та"):
            return t[:-2]
        if t.endswith("ци"):
            return t[:-2] + "к"
        if t.endswith("зи"):
            return t[:-2] + "г"
        if t[-3] == "е" and t[-1] == "и":
            return t[:-3] + "я" + t[-2]   # е -> я, drop и
    if n > 4:
        if t.endswith("си"):
            return t[:-2] + "х"
        if t.endswith("и"):
            return t[:-1]
    return t


def bulgarian_stem(t: str) -> str:
    if len(t) < 4:
        return t
    if len(t) > 5 and t.endswith("ища"):
        return t[:-3]
    t = _bg_article(t)
    t = _bg_plural(t)
    if len(t) > 3:
        if t.endswith("я"):
            t = t[:-1]
        if t.endswith(("а", "о", "е")):
            t = t[:-1]
    if len(t) > 4 and t.endswith("ен"):
        t = t[:-2] + "н"
    if len(t) > 5 and t[-2] == "ъ":
        t = t[:-2] + t[-1]
    return t


# -- Catalan (ca) -----------------------------------------------------------
# CatalanAnalyzer.java: ElisionFilter(d l m n s t) -> StandardTokenizer
# -> LowerCase -> Stop -> Snowball(Catalan).  The tokenizer's
# MidNumLet rule keeps "l'aigua" as ONE token, so elision strips the
# article + apostrophe inside the casing hook (same observable chain
# order); the stemmer is a light suffix stripper in the Snowball
# Catalan lineage (documented simplification).

CATALAN_STOP = frozenset("""a abans amb al als la les el els i o un una uns
unes de del dels que es en per pero no si ja ho hi som es seu seva sevas
aquest aquesta aquests aquestes com mes molt tot tots tambe quan on qui
ens us li hem han ser es era fou te sense fins entre contra cap""".split())

_CA_ELIDE = ("d", "l", "m", "n", "s", "t")


def _elide(t: str, articles: tuple[str, ...]) -> str:
    for ap in ("'", "’"):
        i = t.find(ap)
        if 0 < i <= 2 and t[:i] in articles and len(t) > i + 1:
            return t[i + 1:]
    return t


def catalan_lower(t: str) -> str:
    return _elide(t.lower(), _CA_ELIDE)


_CA_SUF = ("aments", "ament", "acions", "acio", "ística", "ístiques",
           "itats", "itat", "ments", "ment", "ismes", "isme", "istes",
           "ista", "itzar", "ció", "cions", "ors", "ora", "ores", "or",
           "ants", "ant", "ança", "ances", "es", "os", "is", "s", "a",
           "e", "o", "í")


def catalan_stem(t: str) -> str:
    return _strip_longest(_fold(t), _CA_SUF, 3)


# -- Galician (gl) ----------------------------------------------------------
# GalicianAnalyzer.java: StandardTokenizer -> LowerCase -> Stop ->
# GalicianStemFilter (``gl/GalicianStemmer.java``, the RSLP-derived
# algorithm) — here a light plural/derivational stripper of the same
# lineage (-ns -> -n denasalization, -ción family, gender/number).

GALICIAN_STOP = frozenset("""a o as os un unha uns unhas e de do da dos das
en no na nos nas que non con por para se lle o seu sua seus suas como mais
pero xa ou cando onde quen ao aos ben moi foi son ser estar ten""".split())


def galician_stem(t: str) -> str:
    t = _fold(t)
    if t.endswith("ns") and len(t) > 4:
        t = t[:-2] + "n"   # denasalize, then keep stripping
    for suf in ("cions", "cion", "zons", "zon"):
        if t.endswith(suf) and len(t) - len(suf) >= 2:
            return t[:-len(suf)]
    return _strip_longest(t, ("amentos", "amento", "idades", "idade",
                              "mente", "ismos", "ismo", "istas", "ista",
                              "es", "as", "os", "a", "o", "e"), 3)


# -- Basque (eu) ------------------------------------------------------------
# BasqueAnalyzer.java: StandardTokenizer -> LowerCase -> Stop ->
# Snowball(Basque) — light version: the agglutinated case endings
# (locative/genitive/ergative/...) stripped longest-first.

BASQUE_STOP = frozenset("""eta edo bat batzuk da dira zen ziren du dute ez
bai hau hori horiek honek hauek ere baina nik zuk guk haiek bere nire zure
gure al ala baino ez dago egon izan ukan nahi behar""".split())

_EU_SUF = ("etako", "etatik", "etara", "aren", "arekin", "aretik", "etan",
           "ekin", "tzat", "tik", "ari", "ak", "ek", "en", "an", "ra",
           "az", "a", "k")


def basque_stem(t: str) -> str:
    return _strip_longest(t, _EU_SUF, 3)


# -- Armenian (hy) ----------------------------------------------------------
# ArmenianAnalyzer.java: StandardTokenizer -> LowerCase -> Stop ->
# Snowball(Armenian) — light version over the plural/case endings.

ARMENIAN_STOP = frozenset("""և եւ ու է են էր էին եմ ես ենք եք չի չեն այս այդ
այն որ որը ինչ երբ մի նա մենք դուք իր նրա նրանք ամեն բայց կամ միայն նաև
պետք լինել ունի ունեն""".split())

_HY_SUF = ("ությունների", "ություններ", "ության", "ություն", "ներում",
           "ներին", "ների", "ներն", "ներ", "երում", "երին", "երի", "երն",
           "եր", "ում", "ով", "ին", "ից", "ն", "ը", "ի", "ս")


def armenian_stem(t: str) -> str:
    return _strip_longest(t, _HY_SUF, 3)


# -- Bengali (bn) -----------------------------------------------------------
# BengaliAnalyzer.java: StandardTokenizer -> LowerCase ->
# IndicNormalization -> BengaliNormalization -> Stop ->
# BengaliStemFilter.  Normalization (``bn/BengaliNormalizer.java``):
# candrabindu deletion, nukta-form folding (ড়/ঢ়/য় compose), visarga
# handling — implemented as the composed-form folds; the stemmer strips
# the published light suffix table (case markers, classifiers,
# plurals), longest first.

BENGALI_STOP = frozenset("""এবং ও এই যে সে তার আমি তুমি আমরা তারা কি না হয়
ছিল করে থেকে জন্য সঙ্গে এক আর এর তা কিন্তু হবে ছিলেন করা হয়েছে দিয়ে পরে
আগে সব কোনো কেউ নিয়ে""".split())

_BN_EXT = ("ঀ-ঃ়া-ৄেৈ"
           "ো-্ৗৢৣ‌‍")
_BN_TOKEN_RE = _re2.compile(rf"\w[\w{_BN_EXT}]*")

_BN_MAP = str.maketrans({
    "ড়": "ড",   # ড় -> ড (nukta fold)
    "ঢ়": "ঢ",   # ঢ় -> ঢ
    "য়": "য",   # য় -> য
})
_BN_DELETE = dict.fromkeys([0x0981, 0x09BC, 0x200C, 0x200D])


def bengali_normalize(t: str) -> str:
    return t.translate(_BN_MAP).translate(_BN_DELETE)


def bengali_lower(t: str) -> str:
    return bengali_normalize(t.lower())


_BN_SUF = ("গুলোতে", "গুলিতে", "গুলোর", "গুলির", "গুলো", "গুলি", "দেরকে",
           "দের", "রা", "কে", "ের", "েতে", "তে", "টির", "টি",
           "টার", "টা", "খানা", "ে", "র", "ও")


def bengali_stem(t: str) -> str:
    return _strip_longest(t, _BN_SUF, 2)


# -- Latvian (lv) -----------------------------------------------------------
# LatvianAnalyzer.java: StandardTokenizer -> LowerCase -> Stop ->
# LatvianStemFilter (``lv/LatvianStemmer.java``, "light stemmer for
# Latvian" — noun/adjective inflection with palatalization unwinding).
# Light version: longest declension ending stripped, the common
# palatalized stem finals restored (š->s, ž->z, č->c).

LATVIAN_STOP = frozenset("""un ir es tu viņš viņa mēs jūs tie tās šis šī
tas tā kas ko ar uz no par pēc pie bet vai ne jau kā arī kad tad vēl tikai
gan pat kur šeit tur būt bija tika""".split())

_LV_SUF = ("ajiem", "ajām", "ajos", "ajās", "iem", "ajam", "ajai", "ām",
           "ās", "os", "am", "em", "īm", "ēm", "ij", "ie", "as", "es",
           "is", "us", "a", "e", "i", "u", "s", "š", "ā", "ē", "ī", "ū",
           "o")
_LV_UNPAL = str.maketrans({"š": "s", "ž": "z", "č": "c"})


def latvian_stem(t: str) -> str:
    t = _strip_longest(t, _LV_SUF, 3)
    if t and t[-1] in "šžč":
        t = t[:-1] + t[-1].translate(_LV_UNPAL)
    return t


# -- Lithuanian (lt) --------------------------------------------------------
# LithuanianAnalyzer.java: StandardTokenizer -> LowerCase -> Stop ->
# Snowball(Lithuanian) — light version over the declension endings.

LITHUANIAN_STOP = frozenset("""ir yra aš tu jis ji mes jūs jie jos šis ši
tas ta kas su iš į ant po bet ar ne nėra jau kaip taip pat dar tik kad
kur kada buvo bus būti savo man tau jam jai""".split())

_LT_SUF = ("iausias", "iausia", "uosius", "iesiems", "uose", "iams",
           "iems", "ams", "ais", "iai", "iais", "ioms", "oms", "ose",
           "umas", "ai", "as", "os", "is", "ys", "us", "ų", "ė", "ės", "ei",
           "į", "ui", "u", "o", "a", "e", "i", "y")


def lithuanian_stem(t: str) -> str:
    return _strip_longest(t, _LT_SUF, 3)


# -- Estonian (et) ----------------------------------------------------------
# EstonianAnalyzer.java: StandardTokenizer -> LowerCase -> Stop ->
# Snowball(Estonian) — light version over the 14-case endings.

ESTONIAN_STOP = frozenset("""ja on ei ma sa ta me te nad see mis kes ka kui
aga või oma oli ning siis üle veel juba ainult nii väga kus siin seal olla
olen oled oleme olete kas mitte""".split())

_ET_SUF = ("dele", "dest", "dega", "deks", "deni", "dena", "tele", "test",
           "tega", "teks", "sse", "st", "ga", "ks", "le", "lt", "l", "na",
           "ta", "ni", "id", "de", "te", "d", "t", "s", "e")


def estonian_stem(t: str) -> str:
    return _strip_longest(t, _ET_SUF, 3)


# -- Irish (ga) -------------------------------------------------------------
# IrishAnalyzer.java: StopFilter(HYPHENATIONS h,n,t) -> Elision(d m b)
# -> IrishLowerCaseFilter -> Stop -> Snowball(Irish).  The special
# casing (``ga/IrishLowerCaseFilter.java:39-72``): an initial mutation
# prefix t/n before an uppercase vowel lowercases as "t-"/"n-"
# ("tUachtarán" -> "t-uachtarán") so it can't collide with real
# t…/n…-initial words; elision strips d'/m'/b'.  The stemmer is a
# light version of the Snowball Irish endings.

IRISH_STOP = frozenset("""agus an na is i ar le go do de ag ní sé sí mé tú
muid sibh siad seo sin a ach bhí tá chun nach mar ó faoi trí gan bheith
raibh níl aon dá cé t-a n-a h""".split())

# the HYPHENATIONS set: bare prefix tokens the tokenizer splits off
# hyphenated mutations ("n-athair" -> "n", "athair")
IRISH_STOP = IRISH_STOP | frozenset(["h", "n", "t"])

_GA_ELIDE = ("d", "m", "b")
_GA_VOWELS = "AEIOUÁÉÍÓÚ"


def irish_lower(t: str) -> str:
    if len(t) > 1 and t[0] in "tn" and t[1] in _GA_VOWELS:
        return t[0] + "-" + t[1:].lower()
    return _elide(t.lower(), _GA_ELIDE)


_GA_SUF = ("eachta", "eacht", "acht", "aíocht", "íocht", "anna", "acha",
           "tha", "the", "ta", "te", "a", "e", "í", "aí")


def irish_stem(t: str) -> str:
    return _strip_longest(t, _GA_SUF, 3)


# -- Sorani Kurdish (ckb) ---------------------------------------------------
# SoraniAnalyzer.java: StandardTokenizer -> SoraniNormalizationFilter
# -> LowerCase -> Stop -> SoraniStemFilter.  Normalization
# (``ckb/SoraniNormalizer.java:38-110``): arabic yeh/kaf -> farsi
# yeh/keheh, heh variants -> ە/ه forms, ZWNJ and arabic diacritics
# removed.  The stemmer (``ckb/SoraniStemmer.java:27-76``) strips the
# definite/indefinite/plural/ezafe endings in sequence.

SORANI_STOP = frozenset("""و لە بە بۆ کە ئەو ئەم من تۆ ئێمە ئەوان هەیە
نییە بوو دە لەگەڵ بەڵام یان هەر چی کرد دەکات بکات ناو سەر دوای پێش ئەگەر
چونکە هەموو هیچ""".split())

_CKB_MAP = str.maketrans({
    "ي": "ی", "ى": "ی",   # arabic/alef-maksura yeh -> farsi yeh
    "ك": "ک",             # arabic kaf -> keheh
})
_CKB_DIACRITICS = dict.fromkeys(
    [0x064B, 0x064C, 0x064D, 0x064E, 0x064F, 0x0650, 0x0651, 0x0652,
     0x200C])


def sorani_normalize(t: str) -> str:
    t = t.replace("ه‌", "ە").replace("هـ", "ه")
    return t.translate(_CKB_MAP).translate(_CKB_DIACRITICS)


def sorani_lower(t: str) -> str:
    return sorani_normalize(t.lower())


_CKB_SUF = ("ەکانەوە", "ەکانی", "ەکان", "ەکەوە", "ەکەی", "ەکە", "کان",
            "ێکی", "ێک", "ەوە", "ان", "ی")


def sorani_stem(t: str) -> str:
    return _strip_longest(t, _CKB_SUF, 2)


# -- Brazilian Portuguese (br) ----------------------------------------------
# BrazilianAnalyzer.java: StandardTokenizer -> LowerCase -> Stop ->
# BrazilianStemFilter (``br/BrazilianStemmer.java``, the RSLP
# algorithm, Orengo & Huyck 2001) — light version: -ões/-ães -> -ão
# denasalized plural, diminutives, then the pt-style suffix strip.

BRAZILIAN_STOP = frozenset("""a o as os um uma uns umas e de do da dos das
em no na nos nas que não com por para se lhe seu sua seus suas como mas
já ou quando onde quem ao aos à às foi são ser estar tem você ele ela
eles elas nós isso isto aquilo pelo pela""".split())

_BR_SUF = ("amentos", "amento", "adores", "adora", "ador", "antes",
           "ante", "ações", "ação", "idades", "idade", "mente", "issimo",
           "issima", "íssimo", "íssima", "inhos", "inhas", "inho", "inha",
           "ezas", "eza", "es", "as", "os", "a", "o", "e")


def brazilian_stem(t: str) -> str:
    if t.endswith(("ões", "ães")) and len(t) > 5:
        return _fold(t[:-3])   # -ões/-ães plural == -ão singular stem
    if t.endswith("ão") and len(t) > 4:
        return _fold(t[:-2])
    return _strip_longest(_fold(t), _BR_SUF, 3)


# -- Nepali (ne) ------------------------------------------------------------
# NepaliAnalyzer.java: StandardTokenizer -> LowerCase ->
# DecimalDigitFilter -> IndicNormalization -> Stop ->
# Snowball(Nepali) — Devanagari script, so the Hindi matra-aware token
# rule and nukta/ZWNJ normalization apply; light version of the
# Snowball Nepali case/plural endings.

NEPALI_STOP = frozenset("""र छ छन् हो होइन मा को का की ले लाई बाट पनि यो
त्यो म तिमी हामी उनी के कुन तर अनि भने गरी सम्म यस उस आफ्नो भएको गर्न
गरेको हुन थियो छु""".split())

def nepali_normalize(t: str) -> str:
    return t.translate(_HI_MAP).translate(_HI_DELETE)


# the stemmer sees NORMALIZED tokens (the chain runs the Indic
# normalizer first), so the suffix table is stored normalized too
_NE_SUF = tuple(nepali_normalize(s) for s in (
    "हरूलाई", "हरूले", "हरूको", "हरूका", "हरूकी", "हरूमा", "हरू",
    "लाई", "ले", "को", "का", "की", "मा", "बाट", "देखि",
    "सँग", "संग", "मै", "ता"))


def nepali_lower(t: str) -> str:
    return nepali_normalize(t.lower())


def nepali_stem(t: str) -> str:
    return _strip_longest(t, _NE_SUF, 2)


# -- Serbian (sr) -----------------------------------------------------------
# SerbianAnalyzer.java: StandardTokenizer -> LowerCase -> Stop ->
# Snowball(Serbian) -> SerbianNormalizationFilter.  The normalization
# (``sr/SerbianNormalizationFilter.java:48-160``) folds BOTH scripts
# to "bald" Latin (а->a, ђ/đ->dj, љ->lj, њ->nj, џ->dz, ж/ž->z,
# ч/č/ћ/ć->c, ш/š->s) so Cyrillic and Latin spellings of the same
# word index identically; a light stemmer runs first, with suffix
# variants for both scripts, matching the reference's stem-then-
# normalize order.

SERBIAN_STOP = frozenset("""и у на се да је су за са од ко што не био
била било они оне ми ви он она оно мој твој свој овај тај али или кад
где како зато јер i u na se da je su za sa od ko što ne ali ili""".split())

_SR_FOLD = {
    "а": "a", "б": "b", "в": "v", "г": "g", "д": "d", "ђ": "dj",
    "е": "e", "ж": "z", "з": "z", "и": "i", "ј": "j", "к": "k",
    "л": "l", "љ": "lj", "м": "m", "н": "n", "њ": "nj", "о": "o",
    "п": "p", "р": "r", "с": "s", "т": "t", "ћ": "c", "у": "u",
    "ф": "f", "х": "h", "ц": "c", "ч": "c", "џ": "dz", "ш": "s",
    "đ": "dj", "ž": "z", "č": "c", "ć": "c", "š": "s",
}


def serbian_normalize(t: str) -> str:
    return "".join(_SR_FOLD.get(c, c) for c in t)


_SR_SUF = ("овима", "евима", "ovima", "evima", "ama", "има", "ама",
           "ови", "еви", "ovi", "evi", "ом", "ем", "om", "em", "а",
           "е", "и", "о", "у", "a", "e", "i", "o", "u")


def serbian_stem(t: str) -> str:
    return serbian_normalize(_strip_longest(t, _SR_SUF, 3))


# -- Tamil (ta) -------------------------------------------------------------
# TamilAnalyzer.java: StandardTokenizer -> LowerCase ->
# DecimalDigitFilter -> IndicNormalization -> Stop ->
# Snowball(Tamil) — light version over the case/plural endings; the
# Tamil vowel signs and virama are UAX#29 Extend, so the token rule
# keeps them inside word runs.

TAMIL_STOP = frozenset("""மற்றும் ஒரு இந்த அந்த என்று என அது இது நான்
நீ அவன் அவள் அவர் நாம் இல்லை உள்ள என்ன ஆனால் அல்லது மிக மேலும் பல
தான் போன்ற வரை""".split())

_TA_EXT = "ா-ூெ-ைொ-்ௗ‌‍"
_TA_TOKEN_RE = _re2.compile(rf"\w[\w{_TA_EXT}]*")

_TA_SUF = ("களுக்கு", "களில்", "களின்", "களை", "கள்", "த்தில்", "த்தின்",
           "த்தை", "ுக்கு", "க்கு", "ில்", "ின்", "ால்", "ுடன்", "ோடு",
           "ிலிருந்து", "ும்", "ை", "ாக")


def tamil_stem(t: str) -> str:
    out = _strip_longest(t, _TA_SUF, 2)
    # plural sandhi reversal: புத்தகம் -> புத்தகங்(கள்) — a stripped
    # plural's final ங் is the singular's ம்
    if out is not t and out.endswith("ங்"):
        out = out[:-2] + "ம்"
    return out


# -- Telugu (te) ------------------------------------------------------------
# TeluguAnalyzer.java: StandardTokenizer -> LowerCase ->
# TeluguNormalizationFilter -> Stop -> TeluguStemFilter.  Normalizer
# (``te/TeluguNormalizer.java:37-114``) and stemmer
# (``te/TeluguStemmer.java:27-62``) are small published tables,
# implemented exactly: candrabindu -> bindu, visarga/ZWJ/ZWNJ deleted,
# long -> short vowels and matras, decomposed diphthongs composed;
# stem strips ళ్ళు/డ్లు (len>5), the 15 two-char case endings (len>3),
# then a single vowel matra (len>2).

TELUGU_STOP = frozenset("""మరియు ఒక ఈ ఆ అని అది ఇది నేను నీవు అతను ఆమె
మేము వారు కాదు ఉంది ఏమి కానీ లేదా చాలా కూడా తన వంటి వరకు""".split())

_TE_EXT = "ఀ-ఃా-ౄె-ైొ-్ౕౖ‌‍"
_TE_TOKEN_RE = _re2.compile(rf"\w[\w{_TE_EXT}]*")

_TE_CHAR_MAP = {
    "ఀ": "ం", "ఁ": "ం",   # candrabindu -> bindu
    "ఔ": "ఓ", "ఐ": "ఏ",   # long -> short vowels
    "ఆ": "అ", "ఈ": "ఇ", "ఊ": "ఉ",
    "ీ": "ి", "ూ": "ు",   # long -> short matras
    "ే": "ె", "ో": "ొ",
}
_TE_DELETE = {"ః", "‌", "‍"}   # visarga, ZWNJ, ZWJ


def telugu_normalize(t: str) -> str:
    """Single-pass port of ``TeluguNormalizer.normalize``: the
    composed-pair rules fire on the ORIGINAL character at each
    position (a vowel produced by an earlier rewrite is not
    re-folded), exactly like the reference's one-pass switch."""
    out = []
    i, n = 0, len(t)
    while i < n:
        c = t[i]
        if c in _TE_DELETE:
            i += 1
            continue
        if c == "ె" and i + 1 < n and t[i + 1] == "ౖ":
            out.append("ై")          # ె + ౖ -> ై
            i += 2
            continue
        if c == "ఒ" and i + 1 < n and t[i + 1] == "ౕ":
            out.append("ఓ")          # ఒ + ౕ -> ఓ
            i += 2
            continue
        if c == "ఒ" and i + 1 < n and t[i + 1] == "ౌ":
            out.append("ఔ")          # ఒ + ౌ -> ఔ
            i += 2
            continue
        out.append(_TE_CHAR_MAP.get(c, c))
        i += 1
    return "".join(out)


def telugu_lower(t: str) -> str:
    return telugu_normalize(t.lower())


_TE_SUF_2 = ("డు", "ము", "వు", "లు", "ని", "ను", "చే", "కై", "లో", "ది",
             "కి", "సు", "వై", "పై")
_TE_SUF_1 = ("ి", "ీ", "ు", "ూ", "ె", "ే", "ొ", "ో", "ా")


def telugu_stem(t: str) -> str:
    if len(t) > 5 and t.endswith(("ళ్ళు", "డ్లు")):
        return t[:-4]
    if len(t) > 3 and t.endswith(_TE_SUF_2):
        return t[:-2]
    if len(t) > 2 and t.endswith(_TE_SUF_1):
        return t[:-1]
    return t


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
    # tokenizer override for scripts whose word runs need UAX#29
    # Extend marks (Devanagari matras etc.); default = the engine's
    # standard word rule
    token_re: "object" = field(compare=False, default=None)

    def tokens(self, text: str) -> list[str]:
        return [t for t, _ in self.tokens_with_positions(text)]

    def tokens_with_positions(self, text: str) -> list[tuple[str, int]]:
        if not text:
            return []
        out = []
        pos = -1
        stem = self.stemmer
        lower = self.lowercase
        for t in (self.token_re or TOKEN_RE).findall(text):
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
    # ru/sv/no/da default to SNOWBALL stemmers, matching the reference
    # analyzers' defaults (ru/RussianAnalyzer.java:114 ->
    # org.tartarus.snowball.ext.RussianStemmer, likewise sv/no/da);
    # the Savoy-light variants stay registered as *_light, the
    # reference's *LightStemFilter alternatives
    "russian": ("russian", RUSSIAN_STOP, _snow.russian_snowball_stem),
    "swedish": ("swedish", SWEDISH_STOP, _snow.swedish_snowball_stem),
    "norwegian": ("norwegian", NORWEGIAN_STOP,
                  _snow.norwegian_snowball_stem),
    "danish": ("danish", DANISH_STOP, _snow.danish_snowball_stem),
    "russian_light": ("russian_light", RUSSIAN_STOP, russian_stem),
    "swedish_light": ("swedish_light", SWEDISH_STOP, swedish_stem),
    "norwegian_light": ("norwegian_light", NORWEGIAN_STOP,
                        norwegian_stem),
    "danish_light": ("danish_light", DANISH_STOP, danish_stem),
    "finnish": ("finnish", FINNISH_STOP, finnish_stem),
    "hungarian": ("hungarian", HUNGARIAN_STOP, hungarian_stem),
    "czech": ("czech", CZECH_STOP, czech_stem),
    "romanian": ("romanian", ROMANIAN_STOP, romanian_stem),
    "indonesian": ("indonesian", INDONESIAN_STOP, indonesian_stem),
    "turkish": ("turkish", TURKISH_STOP, turkish_stem, 255, turkish_lower),
    "arabic": ("arabic", ARABIC_STOP, arabic_stem),
    "greek": ("greek", GREEK_STOP, greek_stem, 255, greek_lower),
    "persian": ("persian", PERSIAN_STOP, persian_stem, 255, persian_lower),
    "hindi": ("hindi", HINDI_STOP, hindi_stem, 255, hindi_lower,
              _HI_TOKEN_RE),
    "bulgarian": ("bulgarian", BULGARIAN_STOP, bulgarian_stem),
    "catalan": ("catalan", CATALAN_STOP, catalan_stem, 255, catalan_lower),
    "galician": ("galician", GALICIAN_STOP, galician_stem),
    "basque": ("basque", BASQUE_STOP, basque_stem),
    "armenian": ("armenian", ARMENIAN_STOP, armenian_stem),
    "bengali": ("bengali", BENGALI_STOP, bengali_stem, 255, bengali_lower,
                _BN_TOKEN_RE),
    "latvian": ("latvian", LATVIAN_STOP, latvian_stem),
    "lithuanian": ("lithuanian", LITHUANIAN_STOP, lithuanian_stem),
    "estonian": ("estonian", ESTONIAN_STOP, estonian_stem),
    "irish": ("irish", IRISH_STOP, irish_stem, 255, irish_lower),
    "sorani": ("sorani", SORANI_STOP, sorani_stem, 255, sorani_lower),
    "brazilian": ("brazilian", BRAZILIAN_STOP, brazilian_stem),
    "nepali": ("nepali", NEPALI_STOP, nepali_stem, 255, nepali_lower,
               _HI_TOKEN_RE),
    "serbian": ("serbian", SERBIAN_STOP, serbian_stem),
    "tamil": ("tamil", TAMIL_STOP, tamil_stem, 255, str.lower,
              _TA_TOKEN_RE),
    "telugu": ("telugu", TELUGU_STOP, telugu_stem, 255, telugu_lower,
               _TE_TOKEN_RE),
}


def make_analyzer(name: str) -> LanguageAnalyzer | None:
    spec = LANGUAGE_ANALYZERS.get(name)
    if spec is None:
        return None
    return LanguageAnalyzer(*spec)
