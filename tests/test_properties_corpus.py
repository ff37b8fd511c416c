"""Hypothesis property tests for the new corpus operators: Spark output
vs independent pure-Python references on generated corpora.

Unlike tests/test_properties.py (pure pandas, no Spark), these drive real
Spark jobs, so the example budget is small — the references are complete
reimplementations, so even a handful of random corpora pins the semantics
far beyond the hand-written goldens (empty docs, all-duplicate corpora,
stride==chunk boundaries, single-token docs, ties)."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from spider_spark.analysis import dedup as D
from spider_spark.analysis import packing as PK
from spider_spark.analysis import search as SR

token = st.text(alphabet="abc", min_size=1, max_size=2)
doc = st.lists(token, min_size=0, max_size=24).map(" ".join)
corpus = st.lists(doc, min_size=1, max_size=10)

_SET = settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=list(HealthCheck),
)


def _df(spark, texts):
    rows = [("d%02d" % i, t) for i, t in enumerate(texts)]
    return spark.createDataFrame(rows, "doc_id string, text string")


def _toks(t):
    return [x for x in t.lower().split() if x]


# ------------------------------------------------------------- references


def _ref_chunks(texts, chunk, stride):
    out = {}
    for i, t in enumerate(texts):
        toks = _toks(t)
        n = len(toks)
        if n == 0:
            continue
        n_chunks = 1 + max(0, (max(n - chunk, 0) + stride - 1) // stride)
        out["d%02d" % i] = [
            toks[j * stride : j * stride + chunk] for j in range(n_chunks)
        ]
    return out


def _ref_spans(texts, k, min_df):
    grams = {}  # gram -> set of doc idx
    per_doc = {}
    for i, t in enumerate(texts):
        toks = _toks(t)
        gs = [tuple(toks[p : p + k]) for p in range(len(toks) - k + 1)]
        per_doc[i] = gs
        for g in set(gs):
            grams.setdefault(g, set()).add(i)
    dup = {g for g, ds in grams.items() if len(ds) >= min_df}
    spans = {}
    for i, gs in per_doc.items():
        pos = [p for p, g in enumerate(gs) if g in dup]
        # merge intervals [p, p+k-1]: next joins while p <= last_p + k
        merged = []
        for p in pos:
            if merged and p <= merged[-1]["last_p"] + k:
                merged[-1]["end"] = p + k - 1
                merged[-1]["last_p"] = p
                merged[-1]["n"] += 1
            else:
                merged.append({"start": p, "end": p + k - 1, "last_p": p, "n": 1})
        if merged:
            spans["d%02d" % i] = [
                (m["start"], m["end"], m["n"]) for m in merged
            ]
    return spans


def _ref_topk(texts, terms, k):
    n_docs = len(texts)
    tf = {}
    for i, t in enumerate(texts):
        for tok in _toks(t):
            if tok in terms:
                tf.setdefault(i, {}).setdefault(tok, 0)
                tf[i][tok] += 1
    df = {}
    for i, d_ in tf.items():
        for tok in d_:
            df[tok] = df.get(tok, 0) + 1
    w = {tok: (max(n_docs // c, 1)).bit_length() - 1 for tok, c in df.items()}
    scored = [
        (
            "d%02d" % i,
            len(d_),
            sum(c * w[tok] for tok, c in d_.items()),
        )
        for i, d_ in tf.items()
    ]
    scored.sort(key=lambda r: (-r[2], r[0]))
    return scored[:k]


# ------------------------------------------------------------------ tests


@pytest.mark.usefixtures("spark")
class TestCorpusProperties:
    @_SET
    @given(texts=corpus, chunk=st.integers(1, 6), ds=st.integers(0, 5))
    def test_chunk_tokens_matches_reference(self, spark, texts, chunk, ds):
        stride = max(1, chunk - ds)  # 1 <= stride <= chunk
        got = {}
        rows = PK.chunk_tokens(_df(spark, texts), chunk=chunk, stride=stride)
        for r in rows.collect():
            got.setdefault(r["doc_id"], {})[r["chunk_id"]] = (
                r["chunk_text"],
                r["n_chunk_tokens"],
            )
        want = _ref_chunks(texts, chunk, stride)
        assert set(got) == set(want)
        for d_, chunks in want.items():
            assert sorted(got[d_]) == list(range(len(chunks)))
            for j, toks in enumerate(chunks):
                assert got[d_][j] == (" ".join(toks), len(toks))
                # every chunk non-empty; all tokens covered by construction
                assert len(toks) > 0

    @_SET
    @given(texts=corpus, k=st.integers(1, 4), min_df=st.integers(2, 3))
    def test_dup_spans_match_reference(self, spark, texts, k, min_df):
        rows = D.duplicate_gram_spans(
            _df(spark, texts), k=k, min_doc_freq=min_df
        ).collect()
        got = {}
        for r in rows:
            got.setdefault(r["doc_id"], []).append(
                (r["span_start"], r["span_end"], r["n_grams"])
            )
            # structural invariants
            assert r["span_len"] == r["span_end"] - r["span_start"] + 1
            assert r["span_len"] >= k
        want = _ref_spans(texts, k, min_df)
        assert {d_: sorted(v) for d_, v in got.items()} == {
            d_: sorted(v) for d_, v in want.items()
        }

    @_SET
    @given(
        texts=corpus,
        terms=st.sets(token, min_size=1, max_size=3),
        k=st.integers(1, 5),
    )
    def test_search_topk_matches_reference(self, spark, texts, terms, k):
        got = [
            (r["doc_id"], r["n_terms_hit"], r["score"])
            for r in SR.search_topk(
                _df(spark, texts), sorted(terms), n_docs=len(texts), k=k
            ).collect()
        ]
        assert got == _ref_topk(texts, {t.lower() for t in terms}, k)
