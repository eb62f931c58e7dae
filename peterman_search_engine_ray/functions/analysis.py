"""Frozen analysis chain: punctuation tokenizer → stopword filter → Porter stemmer.

Semantics match the reference engine exactly (conformance-tested against its
golden vectors):

* Tokens are maximal runs of characters not in the separator set
  ``{space, \\t, \\n, \\r, ',', '.', ';', '?', '!'}``, lowercased, with empty
  strings and the 127 stop words removed
  (reference ``analysis/PunctuationTokenizer.java:25-71``).
* The stop-word list is the reference's verbatim
  (``analysis/StopWords.java:11-146`` — "use this list and don't change it").
* The stemmer is the classic Porter (1980) algorithm in the Lucene/original-C
  variant the reference vendors (``analysis/lucene_PorterStemmer.java``):
  case-sensitive (only lowercase a/e/i/o/u are vowels), with the usual
  departures from the paper (``bli``→``ble``, ``logi``→``log``, the step-5
  "Bug 1/Bug 2" guards), words of length ≤ 2 unchanged.

These are pure functions designed to be called inside ``map_batches`` with a
per-batch memo cache (stemming is the CPU hot spot; vocabulary is Zipfian so
the cache hit rate is very high).
"""

from __future__ import annotations

import re
from typing import Callable

# ---------------------------------------------------------------------------
# Stop words — verbatim reference list (127 words), StopWords.java:11-146.
# ---------------------------------------------------------------------------
STOP_WORDS: frozenset[str] = frozenset("""
i me my myself we our ours ourselves you your yours yourself yourselves
he him his himself she her hers herself it its itself
they them their theirs themselves
what which who whom this that these those
am is are was were be been being
have has had having do does did doing
a an the and but if or because as until while
of at by for with about against between into through during before after
above below to from up down in out on off over under
again further then once here there when where why how
all any both each few more most other some such
no nor not only own same so than too very
s t can will just don should now
""".split())

assert len(STOP_WORDS) == 127

# Separator set: space, tab, newline, CR and the five punctuation marks —
# exactly the reference's (PunctuationTokenizer.java:27-31,46).  Other
# whitespace (\f, \v, unicode spaces) is NOT a separator.
_TOKEN_RE = re.compile(r"[^ \t\n\r,.;?!]+")


def punctuation_tokenize(text: str) -> list[str]:
    """Reference punctuation tokenizer: split, lowercase, drop stopwords."""
    return [
        t for t in _TOKEN_RE.findall(text.lower())
        if t not in STOP_WORDS
    ]


def naive_tokenize(text: str) -> list[str]:
    """Reference NaiveAnalyzer: lowercase + whitespace split (debug);
    NaiveAnalyzer.java:12-16."""
    return text.lower().split()


# ---------------------------------------------------------------------------
# Porter stemmer (classic 1980 algorithm, Lucene/original-C variant).
# Implemented from the published algorithm; only lowercase vowels count, so
# uppercase letters behave as consonants ("Jerry"→"Jerri", "IDEA" unchanged),
# matching the reference's vendored stemmer.
# ---------------------------------------------------------------------------

_VOWELS = frozenset("aeiou")


class PorterStemmer:
    """Single-word Porter stemmer. Stateless between calls; cheap to share."""

    __slots__ = ("b", "k", "j")

    def _cons(self, i: int) -> bool:
        ch = self.b[i]
        if ch in _VOWELS:
            return False
        if ch == "y":
            return True if i == 0 else not self._cons(i - 1)
        return True

    def _m(self) -> int:
        """Count of VC sequences in b[0..j]."""
        n = 0
        i = 0
        j = self.j
        while True:
            if i > j:
                return n
            if not self._cons(i):
                break
            i += 1
        i += 1
        while True:
            while True:
                if i > j:
                    return n
                if self._cons(i):
                    break
                i += 1
            i += 1
            n += 1
            while True:
                if i > j:
                    return n
                if not self._cons(i):
                    break
                i += 1
            i += 1

    def _vowel_in_stem(self) -> bool:
        return any(not self._cons(i) for i in range(self.j + 1))

    def _doublec(self, j: int) -> bool:
        if j < 1:
            return False
        if self.b[j] != self.b[j - 1]:
            return False
        return self._cons(j)

    def _cvc(self, i: int) -> bool:
        if i < 2 or not self._cons(i) or self._cons(i - 1) or not self._cons(i - 2):
            return False
        return self.b[i] not in ("w", "x", "y")

    def _ends(self, s: str) -> bool:
        l = len(s)
        o = self.k - l + 1
        if o < 0:
            return False
        if self.b[o:self.k + 1] != list(s):
            return False
        self.j = self.k - l
        return True

    def _setto(self, s: str) -> None:
        o = self.j + 1
        self.b[o:self.k + 1] = list(s)
        self.k = self.j + len(s)

    def _r(self, s: str) -> None:
        if self._m() > 0:
            self._setto(s)

    # -- steps ------------------------------------------------------------
    def _step1(self) -> None:  # plurals, -ed, -ing
        b = self.b
        if b[self.k] == "s":
            if self._ends("sses"):
                self.k -= 2
            elif self._ends("ies"):
                self._setto("i")
            elif b[self.k - 1] != "s":
                self.k -= 1
        if self._ends("eed"):
            if self._m() > 0:
                self.k -= 1
        elif (self._ends("ed") or self._ends("ing")) and self._vowel_in_stem():
            self.k = self.j
            if self._ends("at"):
                self._setto("ate")
            elif self._ends("bl"):
                self._setto("ble")
            elif self._ends("iz"):
                self._setto("ize")
            elif self._doublec(self.k):
                ch = self.b[self.k]
                self.k -= 1
                if ch in ("l", "s", "z"):
                    self.k += 1
            elif self._m() == 1 and self._cvc(self.k):
                self._setto("e")

    def _step2(self) -> None:  # terminal y → i when vowel in stem
        if self._ends("y") and self._vowel_in_stem():
            self.b[self.k] = "i"

    _STEP3 = {
        "a": (("ational", "ate"), ("tional", "tion")),
        "c": (("enci", "ence"), ("anci", "ance")),
        "e": (("izer", "ize"),),
        "l": (("bli", "ble"), ("alli", "al"), ("entli", "ent"), ("eli", "e"),
              ("ousli", "ous")),
        "o": (("ization", "ize"), ("ation", "ate"), ("ator", "ate")),
        "s": (("alism", "al"), ("iveness", "ive"), ("fulness", "ful"),
              ("ousness", "ous")),
        "t": (("aliti", "al"), ("iviti", "ive"), ("biliti", "ble")),
        "g": (("logi", "log"),),
    }

    def _step3(self) -> None:  # double suffixes → single
        if self.k == 0:
            return
        rules = self._STEP3.get(self.b[self.k - 1])
        if rules:
            for suf, rep in rules:
                if self._ends(suf):
                    self._r(rep)
                    return

    _STEP4 = {
        "e": (("icate", "ic"), ("ative", ""), ("alize", "al")),
        "i": (("iciti", "ic"),),
        "l": (("ical", "ic"), ("ful", "")),
        "s": (("ness", ""),),
    }

    def _step4(self) -> None:  # -ic-, -full, -ness etc.
        rules = self._STEP4.get(self.b[self.k])
        if rules:
            for suf, rep in rules:
                if self._ends(suf):
                    self._r(rep)
                    return

    _STEP5 = {
        "a": ("al",),
        "c": ("ance", "ence"),
        "e": ("er",),
        "i": ("ic",),
        "l": ("able", "ible"),
        "n": ("ant", "ement", "ment", "ent"),
        "o": ("ion", "ou"),
        "s": ("ism",),
        "t": ("ate", "iti"),
        "u": ("ous",),
        "v": ("ive",),
        "z": ("ize",),
    }

    def _step5(self) -> None:  # -ant, -ence etc. in <c>vcvc<v>
        if self.k == 0:
            return
        sufs = self._STEP5.get(self.b[self.k - 1])
        if not sufs:
            return
        for suf in sufs:
            if self._ends(suf):
                if suf == "ion" and not (self.j >= 0 and self.b[self.j] in ("s", "t")):
                    return
                if self._m() > 1:
                    self.k = self.j
                return

    def _step6(self) -> None:  # final -e, -ll
        self.j = self.k
        if self.b[self.k] == "e":
            a = self._m()
            if a > 1 or (a == 1 and not self._cvc(self.k - 1)):
                self.k -= 1
        if self.b[self.k] == "l" and self._doublec(self.k) and self._m() > 1:
            self.k -= 1

    def stem(self, word: str) -> str:
        if len(word) <= 2:
            return word
        self.b = list(word)
        self.k = len(word) - 1
        self.j = 0
        self._step1()
        self._step2()
        self._step3()
        self._step4()
        self._step5()
        self._step6()
        return "".join(self.b[: self.k + 1])


_STEMMER = PorterStemmer()


def porter_stem(word: str) -> str:
    return _STEMMER.stem(word)


# ---------------------------------------------------------------------------
# Composable analyzers (reference ComposableAnalyzer.java:20-24).
# ---------------------------------------------------------------------------

class Analyzer:
    """tokenize → (stem) pipeline with a shared stem memo cache.

    The cache makes stemming amortized O(unique tokens) per actor lifetime —
    the reference stems every token occurrence from scratch.
    """

    kind: str | None = None   # set by get_analyzer for the frozen built-ins

    def __init__(self, tokenizer: Callable[[str], list[str]] = punctuation_tokenize,
                 stem: bool = True):
        self._tokenize = tokenizer
        self._stem = stem
        self._cache: dict[str, str] = {}

    def __call__(self, text: str) -> list[str]:
        toks = self._tokenize(text)
        if not self._stem:
            return toks
        cache = self._cache
        out = []
        append = out.append
        stemmer = _STEMMER.stem
        for t in toks:
            s = cache.get(t)
            if s is None:
                s = stemmer(t)
                cache[t] = s
            append(s)
        if len(cache) > 2_000_000:  # bound actor memory on adversarial vocab
            cache.clear()
        return out


def get_analyzer(name: str) -> Analyzer:
    """Analyzer registry; names used in IndexConfig.analyzer.

    ``kind`` tags the frozen built-ins so batch stages can take the
    vectorized Arrow path (stages/tokenize.py) with identical semantics;
    unknown/custom analyzers fall back to the per-doc loop.

    Word-break analyzers (reference ``ComposableAnalyzer.java:20-24``
    chaining ``WordBreakTokenizer``/``JapaneseWordBreakTokenizer`` with a
    stemmer) register as ``wordbreak[:<freq_dict_path>]`` (no stemming —
    the Japanese chain) or ``wordbreak-porter[:<freq_dict_path>]`` (DP
    segmentation then Porter).  The name is an ordinary IndexConfig.analyzer
    value, so a space-free-language corpus indexes end-to-end; the
    frequency dictionary loads once per worker process (ST1 — the
    tokenize stage's process-global analyzer cache).  Unbreakable rows
    tokenize to [] (a pipeline cannot throw per-row at scale; the
    stand-alone WordBreakStage surfaces ok=False for them)."""
    if name == "porter":
        a = Analyzer(punctuation_tokenize, stem=True)
    elif name == "nostem":
        a = Analyzer(punctuation_tokenize, stem=False)
    elif name == "naive":
        a = Analyzer(naive_tokenize, stem=False)
    elif name.split(":", 1)[0] in ("wordbreak", "wordbreak-porter"):
        spec, _, path = name.partition(":")
        from .wordbreak import WordBreakTokenizer
        wb = WordBreakTokenizer(path or None)

        def wb_tokenize(text: str, _wb=wb) -> list[str]:
            try:
                return _wb.tokenize(text)
            except ValueError:
                return []

        a = Analyzer(wb_tokenize, stem=(spec == "wordbreak-porter"))
    else:
        raise ValueError(f"unknown analyzer: {name!r}")
    a.kind = name
    return a
