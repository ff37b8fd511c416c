"""spider_spark — a PySpark-native URL-frontier + fetch-scheduler engine.

A from-scratch reimplementation of the *capabilities* of the reference
crawler (coverified/spider, read-only at /root/reference): same-host web
crawling re-expressed as iterative batch DataFrame rounds over partitioned
tables, with vectorized pandas/Arrow UDFs for URL canonicalization, link
extraction from document spans, robots.txt gating, per-host politeness
budgets, and a bloom-accelerated URL-seen set.

Architecture (NOT a port of the reference's Akka actor design):
  - one crawl "round" == one scheduler tick for all hosts at once
    (reference: HostCrawler.scala:158-186 per-host timer ticks)
  - frontier / seen / urls are DataFrames checkpointed to versioned
    parquet dirs per round (Iceberg-snapshot stand-in)
  - all scalar logic is vectorized (pandas UDFs / built-in column exprs);
    no per-row Python anywhere.
"""

__version__ = "0.1.0"
