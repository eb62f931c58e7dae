"""Driver-contract smoke: entry(), queries()/oracle_sql() consistency, and a
fast subset of oracle comparisons at sf0.001 (the full sweep lives in
tools/check_oracles.py and runs at sf0.01)."""

import os

import duckdb
import numpy as np
import pytest

SF = "/root/testdata/sf0.001"

pytestmark = pytest.mark.skipif(not os.path.exists(SF),
                                reason="driver testdata missing")


def _norm(df):
    df = df.reindex(sorted(df.columns), axis=1)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


@pytest.fixture(scope="module")
def entrymod(ray_session):
    import __ray_entry__ as e
    return e


def test_entry_runs(entrymod):
    out = entrymod.entry()
    assert len(out) > 0
    assert list(out.columns) == ["query", "rank", "doc_id", "score", "url",
                                 "doc_len"]
    assert (out.groupby("query")["rank"].min() == 0).all()


def test_every_query_has_callable(entrymod):
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    assert len(qs) >= 25
    # every registered query carries an exact SQL oracle — lock that in
    assert set(oracles) == set(qs)


@pytest.mark.parametrize("name", ["tokenize_term_counts", "bm25_top10",
                                  "phrase_search", "dedup_exact",
                                  "index_stats",
                                  # ANN over the clustered derived table:
                                  # oracle = exact full-scan cosine top-10,
                                  # so parity here IS the recall-1 assertion
                                  "ann_lsh_top10", "ann_ivf_top10",
                                  "dsir_weights", "cocitation_top"])
def test_oracle_subset(entrymod, name):
    import pandas as pd
    con = duckdb.connect()
    for t in ("documents", "embeddings"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{SF}/{t}.parquet')")
    got = entrymod.queries()[name](SF)
    if not isinstance(got, pd.DataFrame):
        got = got.to_pandas()
    want = con.sql(entrymod.oracle_sql()[name]).df()
    g, w = _norm(got), _norm(want)
    assert list(g.columns) == list(w.columns)
    assert len(g) == len(w), (len(g), len(w))
    for c in g.columns:
        if np.issubdtype(g[c].dtype, np.number):
            np.testing.assert_allclose(g[c].to_numpy().astype(np.float64),
                                       w[c].to_numpy().astype(np.float64))
        else:
            assert g[c].tolist() == w[c].tolist()
