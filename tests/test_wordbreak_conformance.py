"""Word-break conformance vs the reference's own dictionaries and goldens
(M4 English / M5 Japanese).

The reference's frequency dictionaries are runtime inputs, not bundled
resources — these tests load them straight from the reference checkout
(read-only) and skip when it isn't present, pinning:

* JapaneseWordBreakTokenizerTest.java:14-63 — five proverb segmentations
  over the 60,993-entry Twitter-frequency dictionary;
* WordBreakTokenizerTest.java:24-46 — two ~900-char no-space Sherlock
  passages over the 82,765-entry English dictionary, each bounded at the
  reference's 20 s timeout.
"""

import os
import time

import pytest

from peterman_search_engine_ray.functions.wordbreak import (
    WordBreakTokenizer, load_freq_dict)

_RES = "/root/reference/src/main/resources"
_EN = os.path.join(_RES, "cs221_frequency_dictionary_en.txt")
_JA = os.path.join(_RES, "japanese_dictionary_twitter_freq.txt")

needs_ref = pytest.mark.skipif(
    not os.path.isdir(_RES), reason="reference resources not available")


@pytest.fixture(scope="module")
def ja_tok():
    return WordBreakTokenizer(load_freq_dict(_JA))


@pytest.fixture(scope="module")
def en_tok():
    return WordBreakTokenizer(load_freq_dict(_EN))


@needs_ref
@pytest.mark.parametrize("text,expected", [
    ("蓼食う虫も好き好き", ["蓼", "食う", "虫", "も", "好き", "好き"]),
    ("猿も木から落ちる", ["猿", "も", "木", "から", "落ちる"]),
    ("虎穴に入らずんば虎子を得ず",
     ["虎", "穴", "に", "入ら", "ず", "ん", "ば", "虎", "子", "を", "得", "ず"]),
    ("二兎を追う者は一兎をも得ず",
     ["二", "兎", "を", "追う", "者", "は", "一", "兎", "を", "も", "得", "ず"]),
    ("門前の小僧習わぬ経を読む",
     ["門前", "の", "小僧", "習わ", "ぬ", "経", "を", "読む"]),
])
def test_japanese_goldens(ja_tok, text, expected):
    assert ja_tok.tokenize(text) == expected


@needs_ref
def test_english_catdog(en_tok):
    assert en_tok.tokenize("catdog") == ["cat", "dog"]


_LONG1 = ("tosherlockholmessheisalwaysthewomanihaveseldomheardhimmentionherunderanyothernameinhiseyessheeclipsesandpredominatesthewholeofhersexitwasnotthathefeltanyemotionakintoloveforireneadlerallemotionsandthatoneparticularlywereabhorrenttohiscoldprecisebutadmirablybalancedmindhewasitakeitthemostperfectreasoningandobservingmachinethattheworldhasseenbutasaloverhewouldhaveplacedhimselfinafalsepositionheneverspokeofthesofterpassionssavewithagibeandasneertheywereadmirablethingsfortheobserverexcellentfordrawingtheveilfrommenmotivesandactionsbutforthetrainedreasonertoadmitsuchintrusionsintohisowndelicateandfinelyadjustedtemperamentwastointroduceadistractingfactorwhichmightthrowadoubtuponallhismentalresultsgritinasensitiveinstrumentoracrackinoneofhisownhighpowerlenseswouldnotbemoredisturbingthanastrongemotioninanaturesuchashisandyettherewasbutonewomantohimandthatwomanwasthelateireneadlerofdubiousandquestionablememory")
_EXP1 = ("sherlock holmes always woman seldom heard mention name eyes eclipses predominates whole sex felt emotion akin love irene adler emotions one particularly abhorrent cold precise admirably balanced mind take perfect reasoning observing machine world seen lover would placed false position never spoke softer passions save gibe sneer admirable things observer excellent drawing veil men motives actions trained reasoner admit intrusions delicate finely adjusted temperament introduce distracting factor might throw doubt upon mental results grit sensitive instrument crack one high power lenses would disturbing strong emotion nature yet one woman woman late irene adler dubious questionable memory").split()

_LONG2 = ("ihadseenlittleofholmeslatelymymarriagehaddriftedusawayfromeachothermyowncompletehappinessandthehomecentredinterestswhichriseuparoundthemanwhofirstfindshimselfmasterofhisownestablishmentweresufficienttoabsorballmyattentionwhileholmeswholoathedeveryformofsocietywithhiswholesoulremainedinourlodgingsinbakerstreetburiedamonghisoldbooksandalternatingfromweektoweekbetweencocaineandambitionthedrowsinessofthedrugandthefierceenergyofhisownkeennaturehewasstillaseverdeeplyattractedbythestudyofcrimeandoccupiedhisimmensefacultiesandextraordinarypowersofobservationinfollowingoutthosecluesandclearingupthosemysterieswhichhadbeenabandonedashopelessbytheofficialpolicefromtimetotimeiheardsomevagueaccountofhisdoingsofhissummonstoodessainthecaseofthemurderofhisclearingupofthesingulartragedyoftheatkinsonbrothersattrincomaleeandfinallyofthemissionwhichhehadaccomplishedsodelicatelyandsuccessfullyforthereigningfamilyofhollandbeyondthesesignsofhisactivityhoweverwhichimerelysharedwithallthereadersofthedailypressiknewlittleofmyformerfriendandcompanion")
_EXP2 = ("seen little holmes lately marriage drifted us away complete happiness home centred interests rise around man first finds master establishment sufficient absorb attention holmes loathed every form society whole soul remained lodgings baker street buried among old books alternating week week cocaine ambition drowsiness drug fierce energy keen nature still ever deeply attracted study crime occupied immense faculties extraordinary powers observation following clues clearing mysteries abandoned hopeless official police time time heard vague account doings summons odessa case murder clearing singular tragedy atkinson brothers trincomalee finally mission accomplished delicately successfully reigning family holland beyond signs activity however merely shared readers daily press knew little former friend companion").split()


@needs_ref
@pytest.mark.parametrize("text,expected", [(_LONG1, _EXP1), (_LONG2, _EXP2)])
def test_english_long_bounded(en_tok, text, expected):
    t0 = time.time()
    out = en_tok.tokenize(text)
    assert time.time() - t0 < 20.0       # reference @Test(timeout=20000)
    assert out == expected


@needs_ref
def test_japanese_corpus_end_to_end(ray_session, tmp_path):
    """A space-free (Japanese) corpus indexes END TO END with the word-break
    analyzer selected as an ordinary IndexConfig.analyzer, and queries
    resolve through the standard IndexReader (reference ComposableAnalyzer
    + JapaneseWordBreakTokenizer chain as the indexing analyzer)."""
    import pyarrow as pa
    import ray.data as rd

    from peterman_search_engine_ray.config import IndexConfig
    from peterman_search_engine_ray.pipelines.build import build_index
    from peterman_search_engine_ray.pipelines.query import IndexReader

    docs = ["蓼食う虫も好き好き",
            "猿も木から落ちる",
            "門前の小僧習わぬ経を読む",
            "猿も木から落ちる蓼食う虫も好き好き"]
    corpus = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(len(docs)), pa.int64()),
        "text": pa.array(docs, pa.string()),
    }))
    idx = str(tmp_path / "ja_idx")
    cfg = IndexConfig(num_term_partitions=4, doc_range_bits=12,
                      positional=True, analyzer=f"wordbreak:{_JA}")
    m = build_index(corpus, idx, cfg, resume=False)
    assert m["n_docs"] == 4

    r = IndexReader(idx)
    # "猿" appears in docs 1 and 3; "蓼" in docs 0 and 3
    assert sorted(r.search_keyword("猿")) == [1, 3]
    assert sorted(r.search_keyword("蓼")) == [0, 3]
    assert sorted(r.search_and(["猿", "蓼"])) == [3]
    # phrase: 蓼 食う adjacent in docs 0 and 3 (positions are analyzer-output
    # indices after stopword drop — same stream the DP emits)
    assert sorted(r.search_phrase(["蓼", "食う"])) == [0, 3]
    # BM25 over the word-break index ranks the doc containing both proverbs
    ids, _ = r.bm25_topk_auto(["蓼", "猿"], 2)
    assert 3 in ids.tolist()
