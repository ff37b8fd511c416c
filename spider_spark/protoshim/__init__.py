"""Vendored pure-Python mini ``google.protobuf`` runtime — just enough
to run Spark 4's ``transformWithStateInPandas`` state-server protocol in
interpreters that do not ship the protobuf package (and where installs
are off-limits, as in this sandbox).

Why this exists: pyspark 4.x's TWS Python client
(``pyspark/sql/streaming/stateful_processor_api_client.py``) speaks a
protobuf wire protocol to the JVM state server via the *generated*
module ``StateMessage_pb2.py`` that pyspark itself ships. The generated
code is present; only the generic ``google.protobuf`` runtime it imports
is missing. That runtime's job here is narrow and fully specified by
public documentation: parse the serialized ``FileDescriptorProto`` the
generated module embeds, build message classes from it, and
encode/decode the protobuf wire format (varint / length-delimited /
fixed tags). This package implements exactly that from the public wire
spec — original code, no relation to the protobuf library's own
implementation — and nothing else (no text/JSON format, no extensions,
no services, no reflection beyond what generated _pb2 modules call).

Use :func:`install` BEFORE the first SparkSession is created: it adds
the shim to ``sys.path`` and to ``PYTHONPATH`` so the JVM-spawned Python
workers (the processes that actually run the TWS state client) inherit
it. If a real ``google.protobuf`` is importable, install() is a no-op —
the shim never shadows a genuine runtime.
"""

from __future__ import annotations

import importlib
import os
import sys

#: directory that contains the vendored ``google`` package
SHIM_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "pythonpath")


def install() -> bool:
    """Make ``google.protobuf`` importable, preferring a real install.

    Returns True if the shim was activated (or already active), False if
    a genuine protobuf runtime is present and the shim stayed out of the
    way. Idempotent. Must run before the JVM starts for executor-side
    workers to see it (they inherit PYTHONPATH from the driver process
    environment).
    """
    try:
        import google.protobuf  # noqa: F401

        # Already importable — either the real runtime or a previously
        # installed shim; report which.
        return getattr(sys.modules["google.protobuf"], "_SPIDER_SPARK_SHIM", False)
    except Exception:
        pass
    if SHIM_DIR not in sys.path:
        sys.path.insert(0, SHIM_DIR)
    parts = os.environ.get("PYTHONPATH", "")
    if SHIM_DIR not in parts.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            SHIM_DIR + (os.pathsep + parts if parts else "")
        )
    importlib.invalidate_caches()
    import google.protobuf  # noqa: F401  (verifies the shim resolves)

    return True
