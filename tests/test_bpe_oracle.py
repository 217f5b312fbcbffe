"""Randomized cross-engine differential for the generated BPE oracle SQL
(plans/pipeline_queries.py::_bpe_merges_sql/_bpe_token_counts_sql).

The unrolled-CTE oracle rests on two claims the sf fixtures exercise only
lightly:

* the delimiter-encoded ``replace()`` reproduces the trainer's GREEDY
  LEFT-TO-RIGHT merge scan (overlap cases: "a a a" under merge (a,a)
  must give [aa, a], never [a, aa]);
* applying merges sequentially in RANK ORDER equals the GPT-2
  lowest-rank-first encoder (`operators/bpe.py::_encode_word`) — true
  because any pair involving a merged symbol ranks after the merge that
  created it.

Hypothesis hammers both with tiny two-letter-alphabet corpora (maximally
tie- and overlap-prone) — pure Python + DuckDB, no Spark session needed."""

from __future__ import annotations

import duckdb
import pandas as pd
from hypothesis import given, settings, strategies as st

from spark_sentiment_spark.operators.bpe import _encode_word, _merge_loop
from spark_sentiment_spark.plans.pipeline_queries import (
    _bpe_merges_sql, _bpe_token_counts_sql)

N_MERGES = 8

# words over {a, b}: short lengths make repeated/overlapping pairs and
# count ties the NORM rather than the exception
word = st.text(alphabet="ab", min_size=1, max_size=5)
corpus = st.lists(st.lists(word, min_size=1, max_size=8), min_size=1,
                  max_size=12)


def _docs_frame(texts: list[list[str]]) -> pd.DataFrame:
    return pd.DataFrame({
        "doc_id": range(len(texts)),
        "text": [" ".join(ws) for ws in texts],
    })


def _python_merges(texts: list[list[str]]) -> list[tuple[str, str, int]]:
    """The reference trainer on the same tokenization the SQL uses:
    min_count=2 floor, then the driver merge loop."""
    freq: dict[str, int] = {}
    for ws in texts:
        for w in ws:
            freq[w] = freq.get(w, 0) + 1
    freq = {w: c for w, c in freq.items() if c >= 2}
    return _merge_loop(freq, N_MERGES)


@settings(max_examples=40, deadline=None)
@given(corpus)
def test_merges_sql_matches_python_trainer(texts):
    con = duckdb.connect()
    con.register("documents", _docs_frame(texts))
    got = con.execute(_bpe_merges_sql(N_MERGES)).fetchall()
    con.close()
    want = [(i + 1, a, b, a + b, c)
            for i, (a, b, c) in enumerate(_python_merges(texts))]
    assert got == want


@settings(max_examples=40, deadline=None)
@given(corpus)
def test_token_counts_sql_matches_gpt2_encoder(texts):
    con = duckdb.connect()
    con.register("documents", _docs_frame(texts))
    got = dict(con.execute(_bpe_token_counts_sql(N_MERGES)).fetchall())
    con.close()
    ranks = {(a, b): i
             for i, (a, b, _) in enumerate(_python_merges(texts))}
    want = {i: sum(len(_encode_word(w, ranks)) for w in ws)
            for i, ws in enumerate(texts)}
    assert got == want
