"""Corpus rollup report (analysis/text.corpus_rollup): known-value
subtotals, grouping-id convention, cube variant, and Spark-vs-DuckDB
equality."""

import pytest

from spider_spark.analysis.text import corpus_rollup, corpus_rollup_sql


def _docs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, lang string, source string, text string"
    )


def test_rollup_known_values(spark):
    docs = _docs(
        spark,
        [
            (1, "en", "s1", "a b c"),
            (2, "en", "s1", "d e"),
            (3, "en", "s2", "f"),
            (4, "de", "s1", "g h i j"),
        ],
    )
    got = {
        (r["lang"], r["source"]): r.asDict()
        for r in corpus_rollup(docs).collect()
    }
    # leaf rows: gid 0
    assert got[("en", "s1")]["n_docs"] == 2
    assert got[("en", "s1")]["n_tokens"] == 5
    assert got[("en", "s1")]["gid"] == 0
    # lang subtotal: source rolled up -> gid 1 (source is the low bit)
    assert got[("en", "(all)")]["n_docs"] == 3
    assert got[("en", "(all)")]["n_tokens"] == 6
    assert got[("en", "(all)")]["gid"] == 1
    # grand total: gid 3
    assert got[("(all)", "(all)")]["n_docs"] == 4
    assert got[("(all)", "(all)")]["n_tokens"] == 10
    assert got[("(all)", "(all)")]["gid"] == 3
    # rollup (not cube): no source-only subtotal
    assert ("(all)", "s1") not in got


def test_cube_adds_source_subtotals(spark):
    docs = _docs(
        spark, [(1, "en", "s1", "a"), (2, "de", "s1", "b c")]
    )
    got = {
        (r["lang"], r["source"]): r.asDict()
        for r in corpus_rollup(docs, grouping="cube").collect()
    }
    assert got[("(all)", "s1")]["n_docs"] == 2  # gid 2: lang rolled up
    assert got[("(all)", "s1")]["gid"] == 2


@pytest.mark.parametrize("grouping", ["rollup", "cube"])
def test_rollup_matches_duckdb(spark, grouping):
    import duckdb

    rows = [
        (
            i,
            ["en", "de", "zh"][i % 3],
            f"s{i % 4}",
            " ".join(f"w{(i * j) % 11}" for j in range(1 + i % 6)),
        )
        for i in range(200)
    ]
    docs = _docs(spark, rows)
    con = duckdb.connect()
    con.register("docs_t", docs.toPandas())

    got = corpus_rollup(docs, grouping=grouping)
    sql = corpus_rollup_sql(
        "SELECT lang, source, text FROM docs_t", grouping=grouping
    )
    a = sorted(map(tuple, got.collect()))
    b = sorted(map(tuple, con.execute(sql).fetchall()))
    assert a == b


# -------------------------- length histogram / binned quantiles / pivot


def test_length_histogram_known_values(spark):
    from spider_spark.analysis.text import length_histogram

    docs = _docs(
        spark,
        [
            (1, "en", "s1", "x" * 5),     # bin 0
            (2, "en", "s1", "x" * 99),    # bin 0
            (3, "en", "s2", "x" * 100),   # bin 100
            (4, "de", "s1", "x" * 251),   # bin 200
            (5, "de", "s1", None),        # null -> length 0 -> bin 0
        ],
    )
    got = {
        r["bin_lo"]: r["n_docs"]
        for r in length_histogram(docs, bin_width=100).collect()
    }
    assert got == {0: 3, 100: 1, 200: 1}


def test_binned_quantiles_known_values(spark):
    from spider_spark.analysis.text import binned_quantiles

    # 10 docs: lengths 10,20,...,100 with bin width 10 ->
    # bins 10..100, one doc each. P50 threshold = ceil(5.0)=5 -> 5th bin
    # = bin_lo 50; P90 -> 9th = 90; P99 -> ceil(9.9)=10th = 100.
    docs = _docs(
        spark,
        [(i, "en", "s", "x" * (10 * i)) for i in range(1, 11)],
    )
    got = {
        r["pct"]: r["len_lo"]
        for r in binned_quantiles(docs, bin_width=10).collect()
    }
    assert got == {50: 50, 90: 90, 99: 100}


def test_binned_quantiles_matches_duckdb(spark):
    import duckdb

    from spider_spark.analysis.text import (
        binned_quantiles,
        binned_quantiles_sql,
        length_histogram,
        length_histogram_sql,
    )

    docs = _docs(
        spark,
        [
            (i, "en", f"s{i % 3}", "y" * ((i * 37) % 450))
            for i in range(200)
        ],
    )
    con = duckdb.connect()
    con.register("documents", docs.toPandas())
    got_h = sorted(
        map(tuple, length_histogram(docs, bin_width=50).collect())
    )
    want_h = sorted(
        map(tuple, con.sql(length_histogram_sql("documents", 50)).fetchall())
    )
    assert got_h == want_h
    got_q = sorted(
        map(tuple, binned_quantiles(docs, bin_width=50).collect())
    )
    want_q = sorted(
        map(tuple, con.sql(binned_quantiles_sql("documents", 50)).fetchall())
    )
    assert got_q == want_q


def test_corpus_pivot_known_values_and_plan(spark):
    from spider_spark.analysis.text import corpus_pivot

    docs = _docs(
        spark,
        [
            (1, "en", "s1", "a"),
            (2, "en", "s1", "b"),
            (3, "de", "s1", "c"),
            (4, "en", "s2", "d"),
            (5, "xx", "s2", "e"),  # out-of-list lang -> dropped
        ],
    )
    piv = corpus_pivot(
        docs, pivot_col="lang", pivot_values=("de", "en"), group_col="source"
    )
    got = {r["grp"]: (r["n_de"], r["n_en"]) for r in piv.collect()}
    assert got == {"s1": (1, 2), "s2": (0, 1)}
    # pinned values -> no values-discovery job; plan is exactly the
    # two map-side-combined aggregations ((grp, lang) counts, then
    # pivotfirst on grp) — both shuffles carry partial rows
    plan = piv._sc._jvm.PythonSQLUtils.explainString(
        piv._jdf.queryExecution(), "simple"
    )
    # AQE explain repeats the tree as "Initial Plan" once a stage ran;
    # count exchanges in the executed (first) section only
    plan = plan.split("== Initial Plan ==")[0]
    assert plan.count("Exchange hashpartitioning") == 2, plan
    assert "partial_pivotfirst" in plan and "partial_count" in plan, plan


def test_corpus_pivot_matches_duckdb(spark):
    import duckdb

    from spider_spark.analysis.text import corpus_pivot, corpus_pivot_sql

    docs = _docs(
        spark,
        [
            (i, ["de", "en", "es"][i % 3], f"s{i % 4}", "t")
            for i in range(50)
        ],
    )
    con = duckdb.connect()
    con.register("documents", docs.toPandas())
    got = sorted(
        map(
            tuple,
            corpus_pivot(
                docs, pivot_values=("de", "en", "es")
            ).collect(),
        )
    )
    want = sorted(
        map(
            tuple,
            con.sql(
                corpus_pivot_sql("documents", pivot_values=("de", "en", "es"))
            ).fetchall(),
        )
    )
    assert got == want
