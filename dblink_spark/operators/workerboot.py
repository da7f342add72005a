"""Per-task Python-worker overhead fix: stat-guarded zipimport cache
invalidation.

PySpark's worker loop calls ``importlib.invalidate_caches()`` before
EVERY task (``pyspark/worker_util.py`` ``setup_spark_files``, so that
runtime-added ``spark.files``/pyFiles become importable). On CPython
3.11 ``zipimport.zipimporter.invalidate_caches`` unconditionally
re-parses the archive's central directory, and a worker's ``sys.path``
carries pyspark.zip + py4j + a dozen other zips — profiled at ~140 ms
of pure worker CPU per task for a trivial kernel on this container
(91% of worker time; ``zipimport._read_directory`` dominates). CPython
3.12+ fixed this upstream by re-reading only when the archive's stat
changes; ``make_worker_boot`` backports exactly that semantics as a
process-wide monkeypatch applied lazily from inside a kernel.

Because Spark reuses Python workers across tasks (``spark.python.
worker.reuse`` defaults true), the first task through a kernel patches
the worker process and every later task — from ANY kernel — skips the
re-read unless a zip actually changed (new stat key → full original
invalidation, so runtime-added archives keep working). Measured on
local[32]: a trivial 4-task python job drops 0.206 s → 0.088 s; the
distributed-ER per-iteration floor roughly halves.

The factory returns a NESTED function so kernels capture it by value
(cloudpickle), never by module path — workers in driver-sim-style
sessions cannot import ``dblink_spark``.
"""

from __future__ import annotations

import sys


def make_worker_boot():
    """Return a zero-arg ``boot()`` that installs the stat-guarded
    ``zipimporter.invalidate_caches`` in the current process (idempotent,
    no-op on CPython >= 3.12 where the guard is built in)."""

    def boot() -> None:
        if sys.version_info >= (3, 12):
            return
        import os
        import zipimport

        zi = zipimport.zipimporter
        if getattr(zi, "_dblink_stamp_guard", False):
            return
        orig = zi.invalidate_caches

        def invalidate_caches(self):
            try:
                st = os.stat(self.archive)
                key = (st.st_mtime, st.st_size)
            except OSError:
                orig(self)
                return
            if getattr(self, "_dblink_zip_stamp", None) == key:
                return
            orig(self)
            self._dblink_zip_stamp = key

        zi.invalidate_caches = invalidate_caches
        zi._dblink_stamp_guard = True

    return boot


#: driver-side convenience (tests); kernels must capture fresh
#: ``make_worker_boot()`` results so they pickle by value
worker_boot = make_worker_boot()
