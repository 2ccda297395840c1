"""Filesystem abstraction for index shard writes + manifest commits.

Round 1's encoder wrote shards through bare POSIX calls inside
``applyInPandas`` — true in a single-node sandbox, false on a real cluster
over S3/HDFS, and the ``os.replace`` manifest-atomicity trick has no
object-store equivalent.  This layer makes the executor-side write path
pluggable:

  * ``LocalIndexFS`` — POSIX: manifests commit via write-temp + atomic
    rename (readers never observe a partial manifest).
  * ``ArrowIndexFS`` — any ``pyarrow.fs``-supported store (s3://, hdfs://,
    gcs://): parquet + manifests go through the Arrow FileSystem API.
    Manifests commit via a SINGLE object PUT — object stores make one-object
    writes atomic, so the rename protocol is unnecessary there (rename-free
    commit); partial multi-part uploads never become visible objects.

Instances are constructed driver-side and pickled into the encode UDF, so
implementations hold no open handles — only configuration.
"""

from __future__ import annotations

import json
import os


class LocalIndexFS:
    """POSIX filesystem (the sandbox + on-prem NFS path)."""

    scheme = "file"

    def makedirs(self, path: str) -> None:
        os.makedirs(path, exist_ok=True)

    def rmtree(self, path: str) -> None:
        import shutil

        shutil.rmtree(path, ignore_errors=True)

    def write_parquet(self, table, path: str, compression: str = "zstd") -> None:
        import pyarrow.parquet as pq

        pq.write_table(table, path, compression=compression)

    def getsize(self, path: str) -> int:
        return os.path.getsize(path)

    def exists(self, path: str) -> bool:
        return os.path.exists(path)

    def commit_json(self, path: str, obj: dict) -> None:
        """Atomic manifest commit: temp file + rename (POSIX guarantee)."""
        tmp = path + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(obj, fh)
        os.replace(tmp, path)

    def read_json(self, path: str) -> dict:
        with open(path) as fh:
            return json.load(fh)

    def delete(self, path: str) -> None:
        try:
            os.remove(path)
        except FileNotFoundError:
            pass

    def move(self, src: str, dst: str) -> None:
        os.replace(src, dst)

    def list_files(self, path: str) -> list[str]:
        try:
            return sorted(os.listdir(path))
        except FileNotFoundError:
            return []


class ArrowIndexFS:
    """pyarrow.fs-backed store (S3/HDFS/GCS).  Holds only the URI prefix —
    the FileSystem object is re-resolved lazily per process (executors)."""

    def __init__(self, base_uri_scheme: str = ""):
        self.scheme = base_uri_scheme

    def _fs(self, path: str):
        from pyarrow import fs as pafs

        filesystem, rel = pafs.FileSystem.from_uri(path)
        return filesystem, rel

    def makedirs(self, path: str) -> None:
        filesystem, rel = self._fs(path)
        filesystem.create_dir(rel, recursive=True)

    def rmtree(self, path: str) -> None:
        filesystem, rel = self._fs(path)
        try:
            filesystem.delete_dir(rel)
        except FileNotFoundError:
            pass

    def write_parquet(self, table, path: str, compression: str = "zstd") -> None:
        import pyarrow.parquet as pq

        filesystem, rel = self._fs(path)
        pq.write_table(table, rel, filesystem=filesystem, compression=compression)

    def getsize(self, path: str) -> int:
        filesystem, rel = self._fs(path)
        return filesystem.get_file_info(rel).size

    def exists(self, path: str) -> bool:
        from pyarrow import fs as pafs

        filesystem, rel = self._fs(path)
        return filesystem.get_file_info(rel).type != pafs.FileType.NotFound

    def commit_json(self, path: str, obj: dict) -> None:
        """Rename-free commit: one PUT — atomic per object on S3/GCS (a
        manifest either exists complete or not at all)."""
        filesystem, rel = self._fs(path)
        with filesystem.open_output_stream(rel) as out:
            out.write(json.dumps(obj).encode("utf-8"))

    def read_json(self, path: str) -> dict:
        filesystem, rel = self._fs(path)
        with filesystem.open_input_stream(rel) as inp:
            return json.loads(inp.read().decode("utf-8"))

    def delete(self, path: str) -> None:
        filesystem, rel = self._fs(path)
        try:
            filesystem.delete_file(rel)
        except FileNotFoundError:
            pass

    def move(self, src: str, dst: str) -> None:
        filesystem, rel_src = self._fs(src)
        _, rel_dst = self._fs(dst)
        filesystem.move(rel_src, rel_dst)

    def list_files(self, path: str) -> list[str]:
        from pyarrow import fs as pafs

        filesystem, rel = self._fs(path)
        try:
            infos = filesystem.get_file_info(pafs.FileSelector(rel))
        except FileNotFoundError:
            return []
        return sorted(i.base_name for i in infos)


def fs_for(path: str):
    """Pick the FS implementation from the path scheme."""
    if "://" in path and not path.startswith("file://"):
        return ArrowIndexFS(path.split("://", 1)[0])
    return LocalIndexFS()
