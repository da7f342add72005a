"""Custom operators that go beyond built-in DataFrame primitives.

Current members:

- :mod:`dblink_spark.operators.multimodal` — binary media columns with typed
  metadata; decode / feature-extract / resize / frame-sample as Arrow-batched
  pandas kernels over ``mapInPandas``.
"""
