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
