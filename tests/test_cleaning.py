"""Repetition / Gopher / C4 cleaning operators (analysis/cleaning.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from spider_spark.analysis.cleaning import (
    c4_line_clean,
    line_dedup,
    gopher_filter,
    repetition_stats,
    synth_multiline,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id string, text string")


def test_repetition_stats_known_values(spark):
    rows = [
        ("all_same", "a a a a"),            # 4 words, 1 distinct
        ("no_dups", "one two three four"),
        ("rep_line", "x y\nx y\nz w"),      # duplicate line
        ("empty", ""),
        ("one_word", "solo"),
    ]
    got = {r["doc_id"]: r for r in repetition_stats(_docs(spark, rows)).collect()}
    assert got["all_same"]["dup_word_frac"] == 0.75
    assert got["all_same"]["top_bigram_frac"] == 1.5  # "a a" x3 * 2 / 4
    assert got["no_dups"]["dup_word_frac"] == 0.0
    assert got["no_dups"]["dup_ngram_frac"] == 0.0
    assert got["rep_line"]["dup_line_frac"] == round(1 / 3, 6)
    assert got["empty"]["n_words"] == 0
    assert got["empty"]["dup_word_frac"] == 0.0
    assert got["empty"]["top_bigram_frac"] == 0.0
    assert got["one_word"]["top_bigram_frac"] == 0.0  # no bigrams


def test_gopher_filter_gates(spark):
    long_ok = " ".join(["the world is a word"] * 3)  # 15 words, stopwords
    rows = [
        ("ok", long_ok),
        ("too_short", "the end."),                       # < 5 words
        ("no_stops", "zzz qqq www rrr ttt yyy"),         # no EN stopwords
        ("symbols", "the # of # a # b # c # d"),         # hash-heavy
        ("long_words", "the abcdefghijklmnopqrstuvwxyz " * 5),  # mean len > 10
        ("bullets", "- the a one.\n- the a two.\n- the a three."),  # 100% bullets
    ]
    got = {r["doc_id"]: r for r in gopher_filter(_docs(spark, rows)).collect()}
    assert got["ok"]["keep"] is True
    assert got["too_short"]["keep"] is False and got["too_short"]["f_words"] is False
    assert got["no_stops"]["keep"] is False and got["no_stops"]["f_stops"] is False
    assert got["symbols"]["f_symbols"] is False
    assert got["long_words"]["f_word_len"] is False
    assert got["bullets"]["f_bullets"] is False


def test_c4_line_clean_rules(spark):
    text = "\n".join(
        [
            "This line is properly terminated.",   # kept
            "too short.",                          # < 3 words
            "no terminal punctuation here",        # no . ! ?
            "Enable JavaScript to continue.",      # boilerplate marker
            'He said "stop".',                     # kept (ends in .)
            "Is this kept? Yes it is!",            # kept (ends in !)
            "object = { notation }.",              # '{' marker
        ]
    )
    out = c4_line_clean(_docs(spark, [("d1", text), ("all_drop", "x\ny")])).collect()
    got = {r["doc_id"]: r for r in out}
    assert got["d1"]["n_lines"] == 7 and got["d1"]["n_lines_kept"] == 3
    assert got["d1"]["clean_text"].split("\n") == [
        "This line is properly terminated.",
        'He said "stop".',
        "Is this kept? Yes it is!",
    ]
    # every line dropped -> empty clean_text, row kept
    assert got["all_drop"]["n_lines_kept"] == 0
    assert got["all_drop"]["clean_text"] == ""


def test_synth_multiline_schedule(spark):
    words = " ".join(f"w{i}" for i in range(30))  # 30 words -> 4 lines of 8
    out = synth_multiline(_docs(spark, [("d", words), ("e", "")])).collect()
    got = {r["doc_id"]: r["mtext"] for r in out}
    lines = got["d"].split("\n")
    assert len(lines) == 4
    assert lines[0].startswith("- ") and lines[0].endswith(".")  # i=0: bullet
    assert not lines[2].endswith(".")                            # i=2: bare
    assert lines[3] == "see our cookie policy for details."      # i=3: marker
    assert got["e"] == ""  # empty text -> empty rendering, no phantom lines


def test_gopher_and_c4_nonnull_on_nulls(spark):
    """None text must not explode the pipelines (null-safe tokenizer)."""
    df = spark.createDataFrame(
        [("n", None), ("o", "the a ok line here.")],
        "doc_id string, text string",
    )
    r = {x["doc_id"]: x for x in repetition_stats(df).collect()}
    assert r["n"]["n_words"] == 0
    g = {x["doc_id"]: x for x in gopher_filter(df).collect()}
    assert g["n"]["keep"] is False  # 0 words fails f_words
    c = {x["doc_id"]: x for x in c4_line_clean(df).collect()}
    assert c["o"]["n_lines_kept"] == 1


def test_vocab_topk_counts_and_rank(spark):
    from spider_spark.analysis.text import vocab_topk

    rows = [("d1", "a b a c"), ("d2", "a b b"), ("d3", None)]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    got = {r["token"]: r for r in vocab_topk(df, k=2).collect()}
    assert set(got) == {"a", "b"}  # c (1 occurrence) cut by k=2
    assert got["a"]["n_occurrences"] == 3 and got["a"]["n_docs"] == 2
    assert got["b"]["n_occurrences"] == 3 and got["b"]["n_docs"] == 2
    assert got["a"]["rank"] == 1 and got["b"]["rank"] == 2  # tie -> lexicographic


def test_vocab_topk_distributed_topk_plan(spark):
    from spider_spark.analysis.text import vocab_topk

    df = spark.createDataFrame([("d", "x y z")], "doc_id string, text string")
    plan = vocab_topk(df, k=5)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan, plan[:1500]


def test_pii_scrub_redaction(spark):
    from spider_spark.analysis.cleaning import pii_scrub

    rows = [
        ("d1", "mail me at a.b+c@ex-ample.co.uk or call +44-123-4567890 now"),
        ("d2", "no pii here"),
        ("d3", None),
        ("d4", "two mails x@y.io z@w.ai"),
    ]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    got = {r["doc_id"]: r for r in pii_scrub(df).collect()}
    assert got["d1"]["n_emails"] == 1 and got["d1"]["n_phones"] == 1
    assert got["d1"]["scrubbed"] == "mail me at [EMAIL] or call [PHONE] now"
    assert got["d2"]["n_emails"] == 0 and got["d2"]["scrubbed"] == "no pii here"
    assert got["d3"]["scrubbed"] == ""
    assert got["d4"]["n_emails"] == 2 and got["d4"]["scrubbed"].count("[EMAIL]") == 2


def test_line_dedup_corpus_blocklist(spark):
    rows = [
        ("d1", "shared line\nuniq a\nshared line"),
        ("d2", "shared line\nuniq b"),
        ("d3", "shared line\nalso shared"),
        ("d4", "also shared\nuniq d"),
        ("d5", "solo only"),
        ("d6", ""),
    ]
    got = {
        r["doc_id"]: r
        for r in line_dedup(_docs(spark, rows), max_doc_freq=2).collect()
    }
    # 'shared line' appears in 3 distinct docs > 2 -> dropped everywhere;
    # in-doc multiplicity does not count (d1 carries it twice, df is 3)
    assert got["d1"]["clean_text"] == "uniq a"
    assert got["d1"]["n_lines"] == 3 and got["d1"]["n_lines_kept"] == 1
    assert got["d2"]["clean_text"] == "uniq b"
    # 'also shared' sits in exactly max_doc_freq docs -> kept, order intact
    assert got["d3"]["clean_text"] == "also shared"
    assert got["d4"]["clean_text"] == "also shared\nuniq d"
    assert got["d5"]["clean_text"] == "solo only"
    assert got["d6"]["clean_text"] == "" and got["d6"]["n_lines"] == 1


def test_line_dedup_all_lines_dropped_keeps_row(spark):
    rows = [("a", "x\ny"), ("b", "x"), ("c", "x"), ("d", "x")]
    got = {
        r["doc_id"]: r
        for r in line_dedup(_docs(spark, rows), max_doc_freq=2).collect()
    }
    assert got["b"]["clean_text"] == "" and got["b"]["n_lines_kept"] == 0
    assert got["a"]["clean_text"] == "y"
    assert len(got) == 4


def test_pii_phone_counts_follow_redaction(spark):
    from spider_spark.analysis.cleaning import pii_scrub, synth_pii

    # a phone-shaped substring inside an email local part is redacted as
    # the email — n_phones must agree with the [PHONE] placeholders
    df = spark.createDataFrame(
        [("d1", "ping +1-555-123@example.com"), ("d2", "call +1-555-123")],
        "doc_id string, text string",
    )
    got = {r["doc_id"]: r for r in pii_scrub(df).collect()}
    assert got["d1"]["n_emails"] == 1 and got["d1"]["n_phones"] == 0
    assert got["d1"]["scrubbed"] == "ping [EMAIL]"
    assert got["d2"]["n_phones"] == 1
    for d in ("d1", "d2"):
        assert got[d]["scrubbed"].count("[PHONE]") == got[d]["n_phones"]
        assert got[d]["scrubbed"].count("[EMAIL]") == got[d]["n_emails"]

    # synthetic phones match PHONE_RE even for 1-2 digit ids (padded),
    # and longer ids are never truncated
    ids = spark.createDataFrame(
        [("7", "x"), ("4321", "y")], "doc_id string, text string"
    )
    p = {r["doc_id"]: r["ptext"] for r in synth_pii(ids).collect()}
    scr = {
        r["doc_id"]: r
        for r in pii_scrub(
            synth_pii(ids).select("doc_id", F.col("ptext").alias("text"))
        ).collect()
    }
    for d, txt in p.items():
        if "+1-555-" in txt:
            assert scr[d]["n_phones"] == 1, (d, txt)
            assert "[PHONE]" in scr[d]["scrubbed"]
