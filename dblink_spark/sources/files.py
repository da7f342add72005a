"""copy-files step support (ref: ProjectStep.scala:157-179, S10).

The reference shells out to Hadoop ``FileUtil.copy`` to move run outputs
(chain, diagnostics, evaluation) to another URI. Local/posix paths use
``shutil``; non-local URIs go through the JVM Hadoop FileSystem API of the
active SparkSession, so the same code path works on HDFS/S3A clusters
without extra Python deps.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import SparkSession


def copy_files(
    spark: SparkSession, sources: list[str], dest_dir: str, overwrite: bool = True
) -> list[str]:
    """Copy each source file/dir into ``dest_dir``; returns destinations."""
    if _is_local(dest_dir) and all(_is_local(s) for s in sources):
        os.makedirs(dest_dir, exist_ok=True)
        out = []
        for src in sources:
            dst = os.path.join(dest_dir, os.path.basename(src.rstrip("/")))
            if not overwrite and os.path.exists(dst):
                # match the Hadoop FileUtil.copy contract (and the
                # reference's overwrite=false default): an existing
                # destination is an error, not a silent clobber
                raise FileExistsError(f"{dst} exists and overwrite is false")
            if os.path.isdir(src):
                if os.path.exists(dst):
                    shutil.rmtree(dst)
                shutil.copytree(src, dst)
            else:
                shutil.copy2(src, dst)
            out.append(dst)
        return out
    return _copy_hadoop(spark, sources, dest_dir, overwrite)


def _is_local(path: str) -> bool:
    return "://" not in path or path.startswith("file:")


def _copy_hadoop(
    spark: SparkSession, sources: list[str], dest_dir: str, overwrite: bool
) -> list[str]:
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    Path = jvm.org.apache.hadoop.fs.Path
    FileUtil = jvm.org.apache.hadoop.fs.FileUtil
    dst_path = Path(dest_dir)
    dst_fs = dst_path.getFileSystem(conf)
    dst_fs.mkdirs(dst_path)
    out = []
    for src in sources:
        sp = Path(src)
        sfs = sp.getFileSystem(conf)
        d = Path(dest_dir, sp.getName())
        FileUtil.copy(sfs, sp, dst_fs, d, False, overwrite, conf)
        out.append(str(d))
    return out
