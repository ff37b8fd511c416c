# Namespace package for the spider_spark vendored protobuf shim (see
# spider_spark/protoshim/__init__.py). Declared as a pkgutil-style
# namespace so a real ``google.*`` distribution later on sys.path can
# coexist with this shim.
__path__ = __import__("pkgutil").extend_path(__path__, __name__)  # type: ignore
