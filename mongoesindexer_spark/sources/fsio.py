"""Filesystem seam for the per-file build kernels.

The build's fastest paths deliberately bypass Spark's readers (each task
opens its parquet file with pyarrow and streams row groups — the corpus
never crosses the JVM↔Python boundary).  On a cluster those files live on
S3/HDFS, not the driver's local disk, so every kernel-side file operation
goes through this seam: ``filesystem=None`` keeps the local-``os`` fast
path (with hidden-tmp + atomic-rename writes), any
``pyarrow.fs.FileSystem`` redirects listing/footer-reads/writes to that
filesystem.  pyarrow filesystems pickle cleanly, so passing one through a
``mapInPandas`` closure to executors just works.

Atomicity note: local (and HDFS-style) filesystems get the hidden-tmp +
rename protocol, so a killed task can never leave a readable partial
file.  Object stores (S3/GCS) don't rename atomically, but their writes
are invisible until the upload completes — writing the final name
directly has the same "never a readable partial" property, so the seam
writes directly there.
"""

from __future__ import annotations

import os
import uuid


def listdir(path: str, filesystem=None) -> list[str]:
    """Names (not paths) of regular files directly under ``path``."""
    if filesystem is None:
        return [f for f in os.listdir(path)
                if os.path.isfile(os.path.join(path, f))]
    from pyarrow import fs as pafs
    sel = pafs.FileSelector(path, recursive=False)
    return [os.path.basename(fi.path) for fi in filesystem.get_file_info(sel)
            if fi.type == pafs.FileType.File]


def file_size(path: str, filesystem=None) -> int:
    if filesystem is None:
        return os.path.getsize(path)
    return int(filesystem.get_file_info(path).size)


def makedirs(path: str, filesystem=None) -> None:
    if filesystem is None:
        os.makedirs(path, exist_ok=True)
    else:
        filesystem.create_dir(path, recursive=True)


def parquet_file(path: str, filesystem=None):
    """pyarrow.parquet.ParquetFile over the seam (footer/metadata reads)."""
    import pyarrow.parquet as pq
    if filesystem is None:
        return pq.ParquetFile(path)
    return pq.ParquetFile(filesystem.open_input_file(path))


def dataset(path_or_paths, filesystem=None):
    import pyarrow.dataset as pds
    return pds.dataset(path_or_paths, format="parquet",
                       filesystem=filesystem)


def _is_rename_safe(filesystem) -> bool:
    from pyarrow import fs as pafs
    base = filesystem
    while isinstance(base, pafs.SubTreeFileSystem):
        base = base.base_fs
    return isinstance(base, (pafs.LocalFileSystem, pafs.HadoopFileSystem))


def write_parquet_atomic(table, path: str, filesystem=None, **kw) -> None:
    """Write a parquet file that is never readable half-written.

    Local/HDFS: hidden dot-tmp (skipped by Spark and pyarrow dataset
    discovery) + atomic rename.  Object stores: direct write (complete-
    or-invisible upload semantics).
    """
    import pyarrow.parquet as pq
    if filesystem is None:
        tmp = os.path.join(os.path.dirname(path),
                           f".tmp-{uuid.uuid4().hex}-{os.path.basename(path)}")
        pq.write_table(table, tmp, **kw)
        os.replace(tmp, path)
        return
    if _is_rename_safe(filesystem):
        tmp = os.path.join(os.path.dirname(path),
                           f".tmp-{uuid.uuid4().hex}-{os.path.basename(path)}")
        pq.write_table(table, tmp, filesystem=filesystem, **kw)
        filesystem.move(tmp, path)
    else:
        pq.write_table(table, path, filesystem=filesystem, **kw)


def exists(path: str, filesystem=None) -> bool:
    if filesystem is None:
        return os.path.exists(path)
    from pyarrow import fs as pafs
    return filesystem.get_file_info(path).type != pafs.FileType.NotFound


def read_text(path: str, filesystem=None) -> str:
    if filesystem is None:
        with open(path) as f:
            return f.read()
    with filesystem.open_input_stream(path) as f:
        return f.read().decode()


def list_subdirs(path: str, filesystem=None) -> list[str]:
    """Names of directories directly under ``path`` ([] if absent)."""
    if filesystem is None:
        if not os.path.isdir(path):
            return []
        return [d for d in os.listdir(path)
                if os.path.isdir(os.path.join(path, d))]
    from pyarrow import fs as pafs
    if filesystem.get_file_info(path).type != pafs.FileType.Directory:
        return []
    sel = pafs.FileSelector(path, recursive=False)
    return [os.path.basename(fi.path) for fi in filesystem.get_file_info(sel)
            if fi.type == pafs.FileType.Directory]


def is_dir(path: str, filesystem=None) -> bool:
    if filesystem is None:
        return os.path.isdir(path)
    from pyarrow import fs as pafs
    return filesystem.get_file_info(path).type == pafs.FileType.Directory


def remove_dir(path: str, filesystem=None) -> None:
    """Recursive delete; no-op when the directory doesn't exist."""
    if filesystem is None:
        import shutil
        if os.path.isdir(path):
            shutil.rmtree(path)
        return
    from pyarrow import fs as pafs
    if filesystem.get_file_info(path).type == pafs.FileType.Directory:
        filesystem.delete_dir(path)


def remove_file(path: str, filesystem=None) -> None:
    """Delete one file; no-op when absent."""
    if filesystem is None:
        try:
            os.remove(path)
        except FileNotFoundError:
            pass
        return
    from pyarrow import fs as pafs
    if filesystem.get_file_info(path).type == pafs.FileType.File:
        filesystem.delete_file(path)


def write_text_atomic(content: str, path: str, filesystem=None) -> None:
    """Small control-plane files (lineage rows, format markers)."""
    if filesystem is None:
        tmp = path + f".tmp-{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            f.write(content)
        os.replace(tmp, path)
        return
    if _is_rename_safe(filesystem):
        tmp = path + f".tmp-{uuid.uuid4().hex}"
        with filesystem.open_output_stream(tmp) as f:
            f.write(content.encode())
        filesystem.move(tmp, path)
    else:
        with filesystem.open_output_stream(path) as f:
            f.write(content.encode())
