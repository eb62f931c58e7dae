"""Verify the pure-SQL Porter stemmer (pipelines/porter_sql.py) against
the Python PorterStemmer over every distinct testdata token, the 82,765
reference English dictionary words, and a classic edge vocabulary.

Usage: python tools/porter_sql.py   (exit 0 iff zero mismatches)
"""

import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import duckdb

    from peterman_search_engine_ray.functions.analysis import porter_stem
    from peterman_search_engine_ray.pipelines.porter_sql import (
        stem_sql_for_values)

    vocab: set[str] = set()
    con = duckdb.connect()
    for f in glob.glob("/root/testdata/sf*/documents.parquet"):
        toks = con.sql(
            "SELECT DISTINCT t FROM (SELECT unnest(regexp_split_to_array("
            f"lower(text), '[ \\t\\n\\r,.;?!]+')) AS t FROM '{f}')"
        ).fetchall()
        vocab.update(t for (t,) in toks if t)
    dict_path = ("/root/reference/src/main/resources/"
                 "cs221_frequency_dictionary_en.txt")
    try:
        with open(dict_path, encoding="utf-8") as fh:
            for line in fh:
                parts = line.lstrip("\ufeff").strip().split()
                if parts:
                    vocab.add(parts[0].lower())
    except OSError:
        pass
    vocab.update("""caresses ponies ties caress cats feed agreed plastered
        bled motoring sing conflated troubled sized hopping tanned falling
        hissing fizzed failing filing happy sky relational conditional
        rational valenci hesitanci digitizer conformabli radicalli
        differentli vileli analogousli vietnamization predication operator
        feudalism decisiveness hopefulness callousness formaliti
        sensitiviti sensibiliti triplicate formative formalize electriciti
        electrical hopeful goodness revival allowance inference airliner
        gyroscopic adjustable defensible irritant replacement adjustment
        dependent adoption homologou communism activate angulariti
        homologous effective bowdlerize probate rate cease controll roll
        ion oyster y yy eye bye dye lying dying tying agree free tree
        abyss ss es ied ies eed ing ational ement ent ou ivciti""".split())
    words = sorted(w for w in vocab if w)
    mism = []
    for i in range(0, len(words), 4000):
        chunk = words[i:i + 4000]
        got = dict(con.sql(stem_sql_for_values(chunk)).fetchall())
        for w in chunk:
            want = porter_stem(w)
            if got.get(w) != want:
                mism.append((w, want, got.get(w)))
    print(f"checked {len(words)} tokens, mismatches: {len(mism)}")
    for w, want, got in mism[:20]:
        print(f"  {w!r}: py={want!r} sql={got!r}")
    sys.exit(1 if mism else 0)


if __name__ == "__main__":
    main()
