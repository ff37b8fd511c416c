# internal helpers consumed by generated *_pb2.py modules
