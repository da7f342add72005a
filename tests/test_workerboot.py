"""The zipimport stat-guard (operators/workerboot.py): PySpark workers
call ``importlib.invalidate_caches()`` before every task, and CPython
3.11's ``zipimporter.invalidate_caches`` re-parses every zip archive's
central directory unconditionally (~140 ms/task of worker CPU on this
container). ``make_worker_boot`` backports 3.12's stat-guarded behavior;
these tests pin that the guard (a) skips the re-read when the archive
is unchanged, (b) still picks up a REWRITTEN archive — the correctness
property ``invalidate_caches`` exists for — and (c) is idempotent and
pickles by value."""

import importlib
import os
import sys
import zipfile

import pytest

from dblink_spark.operators.workerboot import make_worker_boot, worker_boot


needs_guard = pytest.mark.skipif(
    sys.version_info >= (3, 12),
    reason="CPython 3.12+ has the stat guard built in; boot() is a no-op",
)


def _write_zip(path, members: dict[str, str]) -> None:
    with zipfile.ZipFile(path, "w") as z:
        for name, body in members.items():
            z.writestr(name, body)


@needs_guard
def test_guard_skips_unchanged_and_honors_rewrite(tmp_path):
    import zipimport

    arc = str(tmp_path / "mods.zip")
    _write_zip(arc, {"wb_probe_a.py": "VALUE = 1\n"})
    zi = zipimport.zipimporter(arc)
    assert zi.find_spec("wb_probe_a") is not None

    worker_boot()
    assert getattr(zipimport.zipimporter, "_dblink_stamp_guard", False)

    # unchanged archive: second invalidate must NOT re-read the directory
    zi.invalidate_caches()
    files_obj = zi._files
    zi.invalidate_caches()
    assert zi._files is files_obj  # identity: the re-read was skipped

    # rewritten archive (new member, different stat): MUST re-read — the
    # runtime-added-pyFiles case invalidate_caches exists for
    os.utime(arc, (os.path.getmtime(arc) + 2,) * 2)
    _write_zip(arc, {"wb_probe_a.py": "VALUE = 1\n",
                     "wb_probe_b.py": "VALUE = 2\n"})
    zi.invalidate_caches()
    assert zi._files is not files_obj
    assert zi.find_spec("wb_probe_b") is not None


@needs_guard
def test_importlib_invalidate_caches_end_to_end(tmp_path):
    """The real call path: importlib.invalidate_caches() fans out to every
    registered zipimporter — with the guard installed the fan-out is a
    stat per archive, and a genuinely new member still becomes importable
    afterwards."""
    import zipimport

    arc = str(tmp_path / "pathmods.zip")
    _write_zip(arc, {"wb_probe_c.py": "VALUE = 3\n"})
    sys.path.insert(0, arc)
    try:
        import wb_probe_c  # noqa: F401 - creates the cached zipimporter

        assert wb_probe_c.VALUE == 3
        worker_boot()
        importlib.invalidate_caches()  # cheap: stat only
        os.utime(arc, (os.path.getmtime(arc) + 2,) * 2)
        _write_zip(arc, {"wb_probe_c.py": "VALUE = 3\n",
                         "wb_probe_d.py": "VALUE = 4\n"})
        importlib.invalidate_caches()
        import wb_probe_d

        assert wb_probe_d.VALUE == 4
    finally:
        sys.path.remove(arc)
        sys.modules.pop("wb_probe_c", None)
        sys.modules.pop("wb_probe_d", None)


def test_boot_idempotent_and_by_value_picklable():
    boot = make_worker_boot()
    boot()
    boot()  # second call is a no-op either way
    import cloudpickle

    blob = cloudpickle.dumps(boot)
    clone = cloudpickle.loads(blob)
    clone()  # still callable after a round trip (the executor path)
