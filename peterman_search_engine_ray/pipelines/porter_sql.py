"""Generate a pure-SQL (DuckDB) Porter stemmer as a CTE chain.

Mirrors ``peterman_search_engine_ray.functions.analysis.PorterStemmer``
step-for-step (the classic Martin Porter reference structure with the
Lucene-variant quirks our engine pins), so a DuckDB oracle can reproduce
the stemmed index pipeline exactly.  Exposes ``porter_ctes(src)``: given a
CTE name with a distinct ``tok`` column, returns CTE text defining
``pstem(tok, stem)``.

Key trick: the consonant/vowel pattern (with Porter's y-rule) is computed
by a left-to-right ``list_reduce`` fold, and that fold is prefix-stable —
the pattern of any prefix of w is the corresponding prefix of pat(w).  So
ONE pattern column per stage serves every measure/condition check
(m(stem) = count of 'v+c+' runs in left(p, len(stem)), vowel-in-stem,
double-consonant, *o/cvc) without recomputation.

Verification: ``python tools/porter_sql.py`` compares the SQL against the
Python stemmer over every distinct token of the driver testdata plus the
82,765-word reference English dictionary.
"""

from __future__ import annotations


def _pat(col: str) -> str:
    """Consonant/vowel pattern of ``col`` (one char per input char).

    y-rule (PorterStemmer._cons): y at position 0 is a consonant; later y
    is a consonant iff the previous char is a vowel."""
    return (
        f"list_reduce(list_prepend('', string_split_regex({col}, '')), "
        "(acc, ch) -> acc || CASE "
        "WHEN ch IN ('a','e','i','o','u') THEN 'v' "
        "WHEN ch = 'y' THEN (CASE WHEN acc = '' OR right(acc, 1) = 'v' "
        "THEN 'c' ELSE 'v' END) "
        "ELSE 'c' END)"
    )


def _m(pat_prefix: str) -> str:
    """Porter measure over a pattern prefix: count of VC runs."""
    return f"len(regexp_extract_all({pat_prefix}, 'v+c+'))"


# step3 rules: (suffix, replacement), flat in the reference's per-key
# order (the key — the suffix's penultimate char — is implied by the
# LIKE match, so a flat ordered CASE is exact).
_STEP3 = [
    ("ational", "ate"), ("tional", "tion"),
    ("enci", "ence"), ("anci", "ance"),
    ("izer", "ize"),
    ("bli", "ble"), ("alli", "al"), ("entli", "ent"), ("eli", "e"),
    ("ousli", "ous"),
    ("ization", "ize"), ("ation", "ate"), ("ator", "ate"),
    ("alism", "al"), ("iveness", "ive"), ("fulness", "ful"),
    ("ousness", "ous"),
    ("aliti", "al"), ("iviti", "ive"), ("biliti", "ble"),
    ("logi", "log"),
]

_STEP4 = [
    ("icate", "ic"), ("ative", ""), ("alize", "al"),
    ("iciti", "ic"),
    ("ical", "ic"), ("ful", ""),
    ("ness", ""),
]

# step5 suffixes (replacement is always removal); 'ion' carries the
# s/t-precondition.  Flat, per-key order preserved ('ement' before
# 'ment' before 'ent' is load-bearing).
_STEP5 = [
    "al", "ance", "ence", "er", "ic", "able", "ible",
    "ant", "ement", "ment", "ent", "ion", "ou", "ism",
    "ate", "iti", "ous", "ive", "ize",
]


def _rule_case(rules: list[tuple[str, str]]) -> tuple[str, str]:
    """Suffix-length + replacement CASE columns for step3/step4."""
    sl = " ".join(
        f"WHEN w LIKE '%{suf}' THEN {len(suf)}" for suf, _ in rules)
    rp = " ".join(
        f"WHEN w LIKE '%{suf}' THEN '{rep}'" for suf, rep in rules)
    return (f"CASE {sl} ELSE 0 END", f"CASE {rp} ELSE '' END")


def porter_ctes(src: str) -> str:
    """CTE chain ``p1a..pstem`` stemming column ``tok`` of CTE ``src``.

    Only tokens longer than 2 chars run the pipeline (PorterStemmer.stem
    returns short words unchanged)."""
    s3_len, s3_rep = _rule_case(_STEP3)
    s4_len, s4_rep = _rule_case(_STEP4)
    s5_len = " ".join(
        f"WHEN w LIKE '%{suf}' THEN {len(suf)}" for suf in _STEP5
        if suf != "ion")
    # 'ion' needs the preceding char in (s,t); order within key 'o' is
    # ion, ou — and no word ends both, so the special case can sit in
    # sequence.
    s5_len = s5_len.replace(
        "WHEN w LIKE '%ou' THEN 2",
        "WHEN w LIKE '%ion' THEN (CASE WHEN length(w) >= 4 AND "
        "substr(w, length(w) - 3, 1) IN ('s','t') THEN 3 ELSE 0 END) "
        "WHEN w LIKE '%ou' THEN 2")
    return f"""
p0 AS (SELECT tok, lower(tok) AS w FROM {src} WHERE length(tok) > 2),
-- step1a: plurals
p1a AS (SELECT tok, CASE WHEN right(w, 1) = 's' THEN
    CASE WHEN w LIKE '%sses' THEN left(w, length(w) - 2)
         WHEN w LIKE '%ies'  THEN left(w, length(w) - 2)
         WHEN NOT w LIKE '%ss' THEN left(w, length(w) - 1)
         ELSE w END
    ELSE w END AS w FROM p0),
-- step1b: -eed / -ed / -ing with post-strip fixup
p1bh AS (SELECT tok, w, length(w) AS n, {_pat('w')} AS p FROM p1a),
p1bc AS (SELECT tok, w, n, p,
    CASE WHEN w LIKE '%eed' THEN 'eed'
         WHEN w LIKE '%ed' AND left(p, n - 2) LIKE '%v%' THEN 'ed'
         WHEN w LIKE '%ing' AND left(p, n - 3) LIKE '%v%' THEN 'ing'
         ELSE '' END AS br FROM p1bh),
p1bw AS (SELECT tok, w, n, p, br,
    CASE WHEN br IN ('ed', 'ing')
         THEN left(w, n - length(br)) ELSE w END AS wd FROM p1bc),
p1b AS (SELECT tok,
    CASE WHEN br = 'eed' THEN
           (CASE WHEN {_m('left(p, n - 3)')} > 0
                 THEN left(w, n - 1) ELSE w END)
         WHEN br = '' THEN w
         WHEN wd LIKE '%at' OR wd LIKE '%bl' OR wd LIKE '%iz'
           THEN wd || 'e'
         WHEN length(wd) >= 2
              AND right(wd, 1) = substr(wd, length(wd) - 1, 1)
              AND right(left(p, length(wd)), 1) = 'c'
           THEN (CASE WHEN right(wd, 1) IN ('l','s','z') THEN wd
                      ELSE left(wd, length(wd) - 1) END)
         WHEN {_m('left(p, length(wd))')} = 1
              AND right(left(p, length(wd)), 3) = 'cvc'
              AND right(wd, 1) NOT IN ('w','x','y')
           THEN wd || 'e'
         ELSE wd END AS w FROM p1bw),
-- step2: terminal y -> i when a vowel precedes
p2h AS (SELECT tok, w, length(w) AS n, {_pat('w')} AS p FROM p1b),
p2 AS (SELECT tok, CASE WHEN right(w, 1) = 'y'
         AND left(p, n - 1) LIKE '%v%'
         THEN left(w, n - 1) || 'i' ELSE w END AS w FROM p2h),
-- step3: double suffixes (m(stem) > 0)
p3h AS (SELECT tok, w, {s3_len} AS sl, {s3_rep} AS rp,
        {_pat('w')} AS p FROM p2),
p3 AS (SELECT tok, CASE WHEN sl > 0
         AND {_m('left(p, length(w) - sl)')} > 0
         THEN left(w, length(w) - sl) || rp ELSE w END AS w FROM p3h),
-- step4: -icate/-ative/... (m(stem) > 0)
p4h AS (SELECT tok, w, {s4_len} AS sl, {s4_rep} AS rp,
        {_pat('w')} AS p FROM p3),
p4 AS (SELECT tok, CASE WHEN sl > 0
         AND {_m('left(p, length(w) - sl)')} > 0
         THEN left(w, length(w) - sl) || rp ELSE w END AS w FROM p4h),
-- step5: remove suffix in <c>vcvc<v> (m(stem) > 1; ion needs s/t)
p5h AS (SELECT tok, w, CASE {s5_len} ELSE 0 END AS sl,
        {_pat('w')} AS p FROM p4),
p5 AS (SELECT tok, CASE WHEN sl > 0
         AND {_m('left(p, length(w) - sl)')} > 1
         THEN left(w, length(w) - sl) ELSE w END AS w FROM p5h),
-- step6: final -e, then -ll (both m's measured over the step-entry word,
-- matching the reference's j = k freeze before the e-drop)
p6h AS (SELECT tok, w, length(w) AS n, {_pat('w')} AS p,
        {_m('p')} AS mf FROM p5),
p6e AS (SELECT tok, n AS n0, p, mf,
    CASE WHEN right(w, 1) = 'e' AND (mf > 1 OR (mf = 1 AND NOT (
           right(left(p, n - 1), 3) = 'cvc'
           AND substr(w, n - 1, 1) NOT IN ('w','x','y'))))
         THEN left(w, n - 1) ELSE w END AS w FROM p6h),
p6 AS (SELECT tok, CASE WHEN right(w, 2) = 'll' AND mf > 1
         THEN left(w, length(w) - 1) ELSE w END AS w FROM p6e),
pstem AS (SELECT tok, w AS stem FROM p6
          UNION ALL
          SELECT tok, tok AS stem FROM {src} WHERE length(tok) <= 2)"""


def stem_sql_for_values(words: list[str]) -> str:
    """Stem a literal word list (used by the verification harness)."""
    vals = ", ".join("(" + sql_quote(w) + ")" for w in words)
    return (f"WITH src(tok) AS (VALUES {vals})," + porter_ctes("src")
            + "\nSELECT tok, stem FROM pstem")


def sql_quote(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"
