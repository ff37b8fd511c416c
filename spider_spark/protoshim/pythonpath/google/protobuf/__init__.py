"""spider_spark's minimal pure-Python protobuf runtime (see
spider_spark/protoshim). Implements only what generated ``*_pb2.py``
modules and their callers use: descriptor-pool registration of a
serialized FileDescriptorProto, dynamic message classes, and wire-format
(de)serialization. Public wire-format knowledge only; original code."""

#: marker so protoshim.install() can tell shim from real runtime
_SPIDER_SPARK_SHIM = True

__version__ = "0.0-spider-spark-shim"
