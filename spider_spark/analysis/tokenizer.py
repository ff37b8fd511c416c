"""BPE tokenizer training primitives over a distributed corpus.

Byte-pair-encoding training (Sennrich et al. 2016, "Neural Machine
Translation of Rare Words with Subword Units") alternates two steps:
count adjacent symbol pairs across the corpus, then merge the most
frequent pair everywhere. The scale insight every real trainer uses
(and the one that matters at 100 TB): after ONE pass that reduces the
corpus to its word-frequency table, all further work happens on that
table — |vocab| rows, not |corpus| rows.

  - ``word_counts``: the corpus-reduction pass. One combine-heavy
    groupBy(word); the only corpus-wide shuffle in the whole trainer,
    carrying <= |vocab| rows per upstream partition.

  - ``bpe_pair_counts``: one count step — adjacent symbol-pair
    frequencies weighted by word count, distributed top-K via
    orderBy+limit (TakeOrderedAndProject: per-partition partial top-K,
    only K rows reach the driver-side merge; the full pair table never
    funnels through one partition).

  - ``bpe_train``: the full driver loop. Each iteration takes the argmax
    pair from the (tiny, bounded) pair-count table and rewrites the
    segmentation column with a greedy left-to-right HOF fold — an
    aggregate() lambda, no UDF, no corpus re-scan. The iterating jobs
    touch only the |vocab|-row word table; lineage is truncated with
    localCheckpoint every few merges (same pattern as
    analysis/graph.pagerank_int's iteration rounds).

Word segmentations start as character lists with an optional end-of-word
marker appended to the final character (the paper's ``</w>``; default
off so pair strings stay plain characters). Ties on pair count break by
pair string ascending — a total, engine-independent order.

The reference engine has no analysis tier (its dataflow ends at URL
indexing, Indexer.scala:75-101); this belongs to the added
training-pipeline surface, same as analysis/text.vocab_topk.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import _tokens_expr


def word_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(w, c) — corpus word-frequency table over the shared lowercase
    whitespace tokenization. The corpus-reduction pass: everything
    downstream operates on these <= |vocab| rows."""
    toks = F.expr(_tokens_expr(text_col))
    return (
        df.select(F.explode(toks).alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("c"))
    )


def _char_segs(wc: DataFrame, eow: str | None = None) -> DataFrame:
    """(w, c, seg: array<string>) — initial BPE segmentation: one symbol
    per character, the end-of-word marker (if any) fused onto the last
    character as in the original paper."""
    segs = wc.withColumn(
        "seg",
        F.expr(
            "transform(sequence(1, char_length(w)), i -> substring(w, i, 1))"
        ),
    )
    if eow:
        lit = eow.replace("'", "\\'")
        segs = segs.withColumn(
            "seg",
            F.expr(
                "concat(slice(seg, 1, size(seg) - 1), "
                f"array(concat(element_at(seg, -1), '{lit}')))"
            ),
        )
    return segs


def _pair_counts(segs: DataFrame) -> DataFrame:
    """(pair, cnt) — adjacent symbol-pair counts over a segmentation
    table, weighted by word frequency. Pairs within a word count with
    multiplicity (the paper's statistic): 'aaaa' as chars contributes
    'a a' three times."""
    pairs = (
        "CASE WHEN size(seg) >= 2 THEN "
        "transform(sequence(1, size(seg) - 1), "
        "i -> concat(element_at(seg, i), chr(32), element_at(seg, i + 1))) "
        "ELSE CAST(array() AS ARRAY<STRING>) END"
    )
    return (
        segs.select(F.explode(F.expr(pairs)).alias("pair"), "c")
        .groupBy("pair")
        .agg(F.sum("c").cast("long").alias("cnt"))
    )


def bpe_pair_counts(
    df: DataFrame, text_col: str = "text", k: int = 50, eow: str | None = None
) -> DataFrame:
    """(pair, cnt) — the top-``k`` adjacent character pairs of the corpus
    by frequency-weighted count: the first BPE merge-selection step.
    ``pair`` is the two symbols space-joined. Deterministic: ties break
    by pair ascending."""
    pc = _pair_counts(_char_segs(word_counts(df, text_col), eow))
    return pc.orderBy(F.desc("cnt"), F.col("pair")).limit(k)


def _merge_pair(segs: DataFrame, a: str, b: str) -> DataFrame:
    """Rewrite every segmentation, greedily merging adjacent (a, b) left
    to right — a pure HOF fold (aggregate() with an array accumulator),
    no UDF. Greedy semantics: after 'a'+'b' fuse, the fused symbol is
    not reconsidered as a left element for THIS merge pass (matches the
    reference BPE re-pairing: 'aaa' with pair (a,a) -> ['aa', 'a'])."""
    qa = a.replace("\\", "\\\\").replace("'", "\\'")
    qb = b.replace("\\", "\\\\").replace("'", "\\'")
    fold = (
        "aggregate(seg, "
        "named_struct('acc', CAST(array() AS ARRAY<STRING>), 'fused', false), "
        "(st, x) -> CASE WHEN size(st.acc) > 0 AND NOT st.fused "
        f"AND element_at(st.acc, -1) = '{qa}' AND x = '{qb}' "
        "THEN named_struct('acc', concat(slice(st.acc, 1, size(st.acc) - 1), "
        f"array('{qa}{qb}')), 'fused', true) "
        "ELSE named_struct('acc', concat(st.acc, array(x)), 'fused', false) "
        "END, st -> st.acc)"
    )
    return segs.withColumn("seg", F.expr(fold))


def bpe_train(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 10,
    eow: str | None = None,
    checkpoint_every: int = 4,
) -> list[tuple[str, str, int]]:
    """Run ``n_merges`` BPE merge steps; returns the learned merge list
    [(left_symbol, right_symbol, count), ...] in merge order.

    The corpus is scanned once (word_counts); each merge step runs two
    bounded jobs over the |vocab|-row segmentation table: a pair-count
    groupBy and the HOF rewrite. Ties break by pair ascending, so the
    merge sequence is engine- and partitioning-independent. Stops early
    if no pair remains (fully merged corpus)."""
    segs = _char_segs(word_counts(df, text_col), eow).persist()
    segs.count()  # materialize once; iterations rewrite from here
    merges: list[tuple[str, str, int]] = []
    try:
        for step in range(n_merges):
            top = (
                _pair_counts(segs)
                .orderBy(F.desc("cnt"), F.col("pair"))
                .limit(1)
                .collect()
            )
            if not top:
                break
            a, b = top[0]["pair"].split(" ", 1)
            merges.append((a, b, int(top[0]["cnt"])))
            nxt = _merge_pair(segs, a, b)
            if (step + 1) % checkpoint_every == 0:
                nxt = nxt.localCheckpoint(eager=True)
            else:
                nxt = nxt.persist()
                nxt.count()
            segs.unpersist()
            segs = nxt
    finally:
        segs.unpersist()
    return merges


def bpe_train_py(
    texts: list[str], n_merges: int = 10, eow: str | None = None
) -> list[tuple[str, str, int]]:
    """Pure-Python reference implementation of ``bpe_train`` (test
    oracle): same tokenization, same greedy merge, same tie-break."""
    wc: dict[str, int] = {}
    for t in texts:
        for w in (t or "").lower().split():
            wc[w] = wc.get(w, 0) + 1
    segs: dict[tuple[str, ...], int] = {}
    for w, c in wc.items():
        chars = list(w)
        if eow:
            chars[-1] = chars[-1] + eow
        segs[tuple(chars)] = segs.get(tuple(chars), 0) + c
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        pc: dict[tuple[str, str], int] = {}
        for seg, c in segs.items():
            for i in range(len(seg) - 1):
                p = (seg[i], seg[i + 1])
                pc[p] = pc.get(p, 0) + c
        if not pc:
            break
        # max count, ties by space-joined pair string ascending
        best = min(pc.items(), key=lambda kv: (-kv[1], kv[0][0] + " " + kv[0][1]))
        (a, b), cnt = best
        merges.append((a, b, cnt))
        out: dict[tuple[str, ...], int] = {}
        for seg, c in segs.items():
            acc: list[str] = []
            fused = False
            for x in seg:
                if acc and not fused and acc[-1] == a and x == b:
                    acc[-1] = a + b
                    fused = True
                else:
                    acc.append(x)
                    fused = False
            key = tuple(acc)
            out[key] = out.get(key, 0) + c
        segs = out
    return merges
