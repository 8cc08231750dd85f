"""Filesystem-agnostic path operations through Hadoop's FileSystem API.

The maintenance/metadata layer (Writer probes, compact's staged swap,
TimeFly snapshots, Repartition's in-place rewrite) needs exists/list/
rename/copy/delete plus small-text sidecar IO. Round 1 did these with
``os``/``shutil``, hard-coupling them to local POSIX paths; at the 100 TB
target the data lives behind s3a://, gs://, abfs://, ... Routing the same
operations through ``FileSystem.get`` (reached via ``spark._jvm``) makes
them work against any scheme the Spark conf can resolve — the reference
gets the same property from fsspec (src/pydala/filesystem/fs.py:7-139).

These are driver-side METADATA operations (file moves, sidecar JSON,
directory listings), not data movement — the data path stays distributed
Spark reads/writes. Costs scale with file counts, not bytes, except
``copy_tree`` (used by TimeFly's copy-on-snapshot backend), which is a
real byte copy; SCALE.md records manifest-pointer snapshots as the fix.

Caveat: object-store "rename" is copy+delete and not atomic; callers
that rely on swap semantics (compact, Repartition) document this.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


class PathOps:
    """Thin wrapper over one resolved ``org.apache.hadoop.fs.FileSystem``."""

    def __init__(self, spark: SparkSession, path: str):
        self._jvm = spark._jvm
        self._conf = spark._jsc.hadoopConfiguration()
        self._Path = self._jvm.org.apache.hadoop.fs.Path
        self.fs = self._Path(path).getFileSystem(self._conf)

    def _p(self, path: str):
        return self._Path(path)

    # -- probes -----------------------------------------------------------------

    def exists(self, path: str) -> bool:
        return self.fs.exists(self._p(path))

    def is_dir(self, path: str) -> bool:
        return self.fs.exists(self._p(path)) and self.fs.getFileStatus(
            self._p(path)
        ).isDirectory()

    def is_file(self, path: str) -> bool:
        return self.fs.exists(self._p(path)) and self.fs.getFileStatus(
            self._p(path)
        ).isFile()

    # -- listings ---------------------------------------------------------------

    def list_files(self, path: str, recursive: bool = True) -> list[tuple[str, int]]:
        """(path, bytes) for every file under ``path`` (no directories)."""
        if not self.exists(path):
            return []
        out = []
        it = self.fs.listFiles(self._p(path), recursive)
        while it.hasNext():
            st = it.next()
            out.append((strip_scheme(st.getPath().toString()), st.getLen()))
        return out

    def data_files(self, path: str) -> list[tuple[str, int]]:
        """Like :meth:`list_files`, skipping sidecars/markers (leading
        ``_`` or ``.`` in any path component under ``path``)."""
        import posixpath

        base = strip_scheme(path).rstrip("/")
        # listings come back QUALIFIED (absolute, scheme-resolved); a
        # relative ``path`` (or a scheme-less one against a non-local
        # defaultFS) would never prefix-match them, making rel the full
        # absolute path — the hidden-segment filter would then run over
        # every ANCESTOR directory (a dataset under /root/.cache/...
        # would list as empty). Resolve rel against the qualified form
        # when the raw prefix misses; returned paths stay joined on the
        # caller's base so caller-side len(base) slicing keeps working.
        qualified = strip_scheme(
            self.fs.makeQualified(self._p(path)).toString()
        ).rstrip("/")
        out = []
        for p, sz in self.list_files(path):
            if p.startswith(base):
                rel = p[len(base):].lstrip("/")
            elif p.startswith(qualified):
                rel = p[len(qualified):].lstrip("/")
            else:
                rel = p
            if rel == "":  # ``path`` IS a file: emit it as-is (joining
                out.append((base, sz))  # "" would append a bogus slash)
                continue
            parts = rel.split("/")
            if any(seg.startswith(("_", ".")) for seg in parts):
                continue
            out.append((posixpath.join(base, rel), sz))
        return out

    def list_dir(self, path: str) -> list[str]:
        """Immediate child names (files and directories)."""
        if not self.exists(path):
            return []
        return [st.getPath().getName() for st in self.fs.listStatus(self._p(path))]

    # -- mutations --------------------------------------------------------------

    def mkdirs(self, path: str) -> None:
        self.fs.mkdirs(self._p(path))

    def delete(self, path: str, recursive: bool = True) -> bool:
        if not self.exists(path):
            return False
        return self.fs.delete(self._p(path), recursive)

    def rename(self, src: str, dst: str) -> None:
        """Move ``src`` to ``dst`` (parent dirs created). On object stores
        this is copy+delete under the hood — not atomic."""
        parent = self._p(dst).getParent()
        if parent is not None:
            self.fs.mkdirs(parent)
        if not self.fs.rename(self._p(src), self._p(dst)):
            raise OSError(f"rename failed: {src} -> {dst}")

    def copy_file(self, src: str, dst: str) -> None:
        """Single-file copy, src preserved (parent dirs created). Used by
        the generation carry-forward: cost ∝ straggler bytes only."""
        FileUtil = self._jvm.org.apache.hadoop.fs.FileUtil
        parent = self._p(dst).getParent()
        if parent is not None:
            self.fs.mkdirs(parent)
        if not FileUtil.copy(
            self.fs, self._p(src), self.fs, self._p(dst), False, self._conf
        ):
            raise OSError(f"copy failed: {src} -> {dst}")

    def copy_tree(self, src: str, dst: str) -> None:
        """Recursive copy (a real byte copy — snapshot backend only)."""
        FileUtil = self._jvm.org.apache.hadoop.fs.FileUtil
        if not FileUtil.copy(
            self.fs, self._p(src), self.fs, self._p(dst), False, self._conf
        ):
            raise OSError(f"copy failed: {src} -> {dst}")

    def put_file(self, local_src: str, dst: str) -> None:
        """Upload one LOCAL file to this PathOps' filesystem (parent
        dirs created, destination overwritten) — the driver-bridge
        upload half of a write-local-temp-then-PUT pattern."""
        parent = self._p(dst).getParent()
        if parent is not None:
            self.fs.mkdirs(parent)
        self.fs.copyFromLocalFile(False, True, self._p(local_src), self._p(dst))

    def get_file(self, src: str, local_dst: str) -> None:
        """Download one file from this PathOps' filesystem to a LOCAL
        path (the GET half of the driver bridge)."""
        self.fs.copyToLocalFile(False, self._p(src), self._p(local_dst), True)

    # -- small-text sidecar IO ---------------------------------------------------

    def read_text(self, path: str) -> str:
        IOUtils = self._jvm.org.apache.commons.io.IOUtils
        stream = self.fs.open(self._p(path))
        try:
            return IOUtils.toString(stream, "UTF-8")
        finally:
            stream.close()

    def write_text(self, path: str, text: str) -> None:
        parent = self._p(path).getParent()
        if parent is not None:
            self.fs.mkdirs(parent)
        stream = self.fs.create(self._p(path), True)
        try:
            stream.write(bytearray(text.encode("utf-8")))
        finally:
            stream.close()


def strip_scheme(path: str) -> str:
    """``file:/tmp/x`` / ``file:///tmp/x`` -> ``/tmp/x``; other schemes
    are preserved (s3a://bucket/k stays addressable)."""
    if path.startswith("file:"):
        rest = path[len("file:"):]
        while rest.startswith("//"):
            rest = rest[1:]
        return rest
    return path


#: the characters Hive/Spark escape when writing partition directory
#: names (ExternalCatalogUtils.escapePathName) — control chars plus
#: the filesystem/URI-significant set
_PARTITION_ESCAPE = set('"#%\'*/:=?\\\x7f{[]^')


def escape_partition_value(value: str) -> str:
    """Escape a partition VALUE the way Spark escapes it when writing
    ``col=value`` directories (round 10): a hand-built
    ``f"dataset={name}"`` path only matches the directory Spark
    actually wrote when the name contains no escaped characters — a
    delete against the raw name would otherwise silently miss and
    leak the partition. Mirrors Hive's ``FileUtils.escapePathName``:
    control characters and the significant set escape to ``%XX``."""
    out = []
    for ch in value:
        if ch in _PARTITION_ESCAPE or ord(ch) < 0x20:
            out.append(f"%{ord(ch):02X}")
        else:
            out.append(ch)
    return "".join(out)
