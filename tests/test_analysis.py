"""Conformance tests for the frozen analysis chain, pinned to the reference's
golden vectors (PunctuationTokenizerTest, PorterStemmerTest, Team18/19/20
stemmer tests, StopWords.java)."""

from peterman_search_engine_ray.functions.analysis import (
    STOP_WORDS, Analyzer, get_analyzer, naive_tokenize, porter_stem,
    punctuation_tokenize)


def stemline(s: str) -> str:
    return " ".join(porter_stem(w) for w in s.split())


def test_tokenizer_golden():
    # PunctuationTokenizerTest.java:14-21
    assert punctuation_tokenize("I am Happy Today!") == ["happy", "today"]


def test_tokenizer_separators_and_stopwords():
    assert punctuation_tokenize("a,b.c;d?e!f\tg\nh\ri") == ["b", "c", "d", "e", "f", "g", "h"]
    # only the five punctuation marks split; others stay in the token
    assert punctuation_tokenize("it's (quoted) [ok]") == ["it's", "(quoted)", "[ok]"]
    assert punctuation_tokenize("") == []
    assert punctuation_tokenize("the and of") == []
    assert punctuation_tokenize("The   QUICK  brown") == ["quick", "brown"]


def test_stopwords_verbatim():
    assert len(STOP_WORDS) == 127
    for w in ("i", "s", "t", "don", "now", "whom", "doing"):
        assert w in STOP_WORDS
    assert "would" not in STOP_WORDS


def test_stemmer_reference_goldens():
    # PorterStemmerTest.java:21-28
    assert stemline("stemming is an important concept in computer science") == \
        "stem is an import concept in comput scienc"
    # Team18PorterStemmerTest
    assert stemline("clothes satisfactory wearing worn wore") == \
        "cloth satisfactori wear worn wore"
    assert stemline("Intellij IDEA is so popular among programmers that my "
                    "friends Tom and Jerry both use it often.") == \
        "Intellij IDEA is so popular among programm that my friend Tom and " \
        "Jerri both us it often."
    # Team19PorterStemmerTest
    assert stemline("information retrieval is the activity of obtaining "
                    "information system resources relevant to an information "
                    "need from a collection") == \
        "inform retriev is the activ of obtain inform system resourc relev " \
        "to an inform need from a collect"
    # Team20PorterStemmerTest — already-root words unchanged
    assert stemline("rate roll sky feed bled sing caress 1234") == \
        "rate roll sky feed bled sing caress 1234"


def test_stemmer_classics():
    cases = {"caresses": "caress", "ponies": "poni", "ties": "ti",
             "cats": "cat", "agreed": "agre", "plastered": "plaster",
             "motoring": "motor", "sing": "sing", "conflated": "conflat",
             "troubled": "troubl", "sized": "size", "hopping": "hop",
             "tanned": "tan", "falling": "fall", "hissing": "hiss",
             "fizzed": "fizz", "failing": "fail", "filing": "file",
             "happy": "happi", "relational": "relat", "conditional": "condit",
             "vietnamization": "vietnam", "predication": "predic",
             "operator": "oper", "feudalism": "feudal",
             "decisiveness": "decis", "hopefulness": "hope",
             "formaliti": "formal", "triplicate": "triplic",
             "formative": "form", "formalize": "formal",
             "electriciti": "electr", "electrical": "electr",
             "hopeful": "hope", "goodness": "good", "revival": "reviv",
             "allowance": "allow", "inference": "infer", "airliner": "airlin",
             "adjustable": "adjust", "defensible": "defens",
             "irritant": "irrit", "replacement": "replac",
             "adjustment": "adjust", "dependent": "depend", "adoption": "adopt",
             "homologou": "homolog", "communism": "commun",
             "activate": "activ", "angulariti": "angular",
             "homologous": "homolog", "effective": "effect", "bowdlerize":
             "bowdler", "probate": "probat", "rate": "rate", "cease": "ceas",
             "controll": "control", "roll": "roll"}
    for w, expect in cases.items():
        assert porter_stem(w) == expect, (w, porter_stem(w), expect)


def test_stemmer_short_words_unchanged():
    for w in ("a", "is", "be", "by", "ox", ""):
        assert porter_stem(w) == w


def test_analyzer_chain():
    a = get_analyzer("porter")
    assert a("Stemming is an IMPORTANT concept; in Computer Science!") == \
        ["stem", "import", "concept", "comput", "scienc"]
    # memo cache consistency
    assert a("stemming stemming") == ["stem", "stem"]
    assert get_analyzer("nostem")("Stemming is important!") == ["stemming", "important"]
    assert get_analyzer("naive")("Hello  World") == ["hello", "world"]


def test_analyzer_positions_are_post_filter():
    # positions index the analyzer OUTPUT stream (stopwords removed first)
    a = get_analyzer("porter")
    toks = a("the cat and the hat")
    assert toks == ["cat", "hat"]  # positions 0 and 1, not 1 and 4
