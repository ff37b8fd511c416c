"""Host-graph operators: transition edges + integer PageRank."""

from __future__ import annotations

from pyspark.sql import functions as F

from spider_spark.analysis.graph import PR_SCALE, pagerank_int, transition_edges


def test_transition_edges_lag_semantics(spark):
    # user 1 visits a,b,a,a (self-loop dropped); user 2 visits b,a
    rows = [
        (1, 1, "a"), (1, 2, "b"), (1, 3, "a"), (1, 4, "a"),
        (2, 1, "b"), (2, 2, "a"),
    ]
    ev = spark.createDataFrame(rows, "user_id int, ts int, node string")
    got = {
        (r["src"], r["dst"]): r["weight"]
        for r in transition_edges(
            ev, order_cols=("ts",)
        ).collect()
    }
    assert got == {("a", "b"): 1, ("b", "a"): 2}


def test_pagerank_star_center_wins(spark):
    # star: leaves l1..l4 -> c, c -> l1 (c has out-edges so mass cycles)
    edges = spark.createDataFrame(
        [("l1", "c", 1), ("l2", "c", 1), ("l3", "c", 1), ("l4", "c", 1),
         ("c", "l1", 1)],
        "src string, dst string, weight long",
    )
    r = {x["node"]: x["r"] for x in pagerank_int(edges, iters=5).collect()}
    assert r["c"] > r["l1"] > r["l2"]  # l1 receives from c; l2..l4 only base
    assert r["l2"] == r["l3"] == r["l4"]


def test_pagerank_two_cycle_exact(spark):
    """a<->b: hand-computed fixed point of the integer recurrence.
    r0 = S; r' = 0.15S + 0.85*r (weights 1, outdeg 1) -> stays S forever
    modulo integer flooring: 150000 + (85*1000000)//100 = 1000000."""
    edges = spark.createDataFrame(
        [("a", "b", 1), ("b", "a", 1)], "src string, dst string, weight long"
    )
    r = {x["node"]: x["r"] for x in pagerank_int(edges, iters=3).collect()}
    assert r == {"a": PR_SCALE, "b": PR_SCALE}


def test_pagerank_deterministic_across_runs(spark):
    ev = spark.range(500).select(
        (F.col("id") % 7).alias("user_id"),
        F.col("id").alias("ts"),
        F.concat(F.lit("h"), (F.col("id") % 13).cast("string")).alias("node"),
        F.col("id").alias("event_id"),
    )
    e = transition_edges(ev)
    a = sorted(map(tuple, pagerank_int(e, iters=4).collect()))
    b = sorted(map(tuple, pagerank_int(e, iters=4).collect()))
    assert a == b
    assert len(a) == 13


# ----------------------------------------------------- anchor-text graph


def test_anchor_text_edges_and_agg(spark):
    from spider_spark.analysis.graph import anchor_text_agg, anchor_text_edges

    rows = [
        # two anchors to /t, one with nested markup, one relative href
        ("p1", "https://h.de/p1",
         '<a href="https://h.de/t">go <b>there</b></a>'
         '<a href="/t">plain</a>'
         '<a href="https://h.de/t">go  there</a>'),
        # second page repeats one wording; invalid + unclosed dropped
        ("p2", "https://h.de/p2",
         '<a href="https://h.de/t">go there</a>'
         '<a href="http://localhost/x">skip</a>'
         '<a href="https://h.de/un">never closed'),
        ("p3", "https://h.de/p3", None),
    ]
    docs = spark.createDataFrame(rows, "doc_id string, url string, html string")
    edges = anchor_text_edges(docs)
    got = sorted((r["src"], r["dst"], r["anchor"]) for r in edges.collect())
    assert got == [
        ("p1", "https://h.de/t", "go there"),
        ("p1", "https://h.de/t", "go there"),
        ("p1", "https://h.de/t", "plain"),
        ("p2", "https://h.de/t", "go there"),
    ]
    agg = {
        (r["dst"], r["anchor"]): (r["n_refs"], r["n_src_pages"])
        for r in anchor_text_agg(edges).collect()
    }
    assert agg == {
        ("https://h.de/t", "go there"): (3, 2),
        ("https://h.de/t", "plain"): (1, 1),
    }


# ------------------------------------------------------------ integer HITS


def test_hits_star_authority(spark):
    from spider_spark.analysis.graph import hits_int

    # l1..l4 all point at c: c is the unique authority (auth = scale),
    # leaves are the hubs (hub = scale each, symmetric), c has no
    # out-edges so hub(c) = 0, leaves have no in-edges so auth(li) = 0
    edges = spark.createDataFrame(
        [("l1", "c", 1), ("l2", "c", 1), ("l3", "c", 1), ("l4", "c", 1)],
        "src string, dst string, weight long",
    )
    got = {r["node"]: (r["hub"], r["auth"]) for r in hits_int(edges, iters=3).collect()}
    assert got["c"] == (0, PR_SCALE)
    assert got["l1"] == got["l2"] == got["l3"] == got["l4"] == (PR_SCALE, 0)


def test_hits_weighted_known_value(spark):
    from spider_spark.analysis.graph import hits_int

    # a->c (w2), b->c (w1), b->d (w1): after 1 iter
    #   a_raw: c = 2S+1S = 3S, d = 1S  -> auth: c=S, d=S//3=333333
    #   h_raw: a = 2*S = 2S, b = S + 333333 -> hub: a=S, b=(1333333*S)//2S=666666
    got = {
        r["node"]: (r["hub"], r["auth"])
        for r in hits_int(
            spark.createDataFrame(
                [("a", "c", 2), ("b", "c", 1), ("b", "d", 1)],
                "src string, dst string, weight long",
            ),
            iters=1,
        ).collect()
    }
    S = PR_SCALE
    assert got["c"] == (0, S)
    assert got["d"] == (0, S // 3)
    assert got["a"] == (S, 0)
    assert got["b"] == ((S + S // 3) * S // (2 * S), 0)


def test_hits_matches_duckdb_oracle(spark):
    import duckdb

    from spider_spark.analysis import oracles as O
    from spider_spark.analysis.graph import hits_int

    ev = spark.range(400).select(
        (F.col("id") % 9).alias("user_id"),
        F.col("id").alias("ts"),
        F.concat(F.lit("h"), (F.col("id") % 11).cast("string")).alias("node"),
        F.col("id").alias("event_id"),
    )
    e = transition_edges(ev)
    got = sorted(map(tuple, hits_int(e, iters=4).collect()))
    con = duckdb.connect()
    con.register("events", ev.toPandas())
    sql = O.hits_int_sql(O.transition_edges_cte("events", "node"), iters=4)
    want = sorted(map(tuple, con.sql(sql).fetchall()))
    assert got == want
