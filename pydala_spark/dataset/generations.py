"""Generation-pointer dataset layout: atomic-ish maintenance on object
stores.

``compact``/``recluster`` default to a staged rename swap — atomic on
HDFS/local, but on object stores (s3a/gs/abfs) a directory "rename" is a
full copy + delete: non-atomic, slow, and double-billed. The
generation swap (``swap="generation"``) avoids renames entirely:

- data lives in ``base/gen-NNNNNN/``;
- ``base/_generation.json`` names the active generation — the ONLY
  mutation the swap makes is one small-object PUT, which object stores
  apply atomically (same single-pointer-write idea as TimeFly's
  manifest-pointer snapshots);
- maintenance writes the NEXT generation directory in full, commits the
  pointer, then prunes generations older than ``keep_previous`` behind
  the active one (the retained previous generation keeps in-flight
  readers alive — their file lists stay valid until the next sweep).

``Dataset`` and ``Writer`` resolve the pointer at construction (Writer
re-resolves at every write), so the layout is transparent to readers and
appenders: appends land inside the active generation and are carried
forward by the next maintenance pass. Cost: one existence probe per
constructor/write — a driver-side metadata call.

Concurrency contract: ONE maintainer at a time (the same assumption the
rename swap makes). Two concurrent ``commit`` calls race last-writer-wins
on the pointer; serialize maintenance (the streaming ride-along does, by
running inside foreachBatch). Concurrent readers and the single appender
are always safe — they only ever follow the pointer. A corrupt or
unreadable pointer degrades to reading the base path (resolve returns the
path unchanged) rather than failing the job.
"""

from __future__ import annotations

import json
import posixpath

from pyspark.sql import SparkSession

from pydala_spark.utils.pathops import PathOps, strip_scheme

GEN_POINTER = "_generation.json"
GEN_PREFIX = "gen-"


def read_pointer(spark: SparkSession, base: str) -> dict | None:
    po = PathOps(spark, base)
    p = posixpath.join(strip_scheme(base).rstrip("/"), GEN_POINTER)
    if po.exists(p):
        try:
            return json.loads(po.read_text(p))
        except Exception:
            return None
    return None


def resolve(spark: SparkSession, path: str) -> str:
    """``base`` -> ``base/<active generation>`` when a generation pointer
    exists; otherwise the path unchanged. One existence probe."""
    ptr = read_pointer(spark, path)
    if ptr and ptr.get("active"):
        return posixpath.join(strip_scheme(path).rstrip("/"), ptr["active"])
    return path


def next_generation(spark: SparkSession, base: str) -> str:
    """Name of the next generation directory (monotonic counter from the
    pointer, starting at gen-000001)."""
    ptr = read_pointer(spark, base) or {}
    active = ptr.get("active", "")
    seq = 0
    if active.startswith(GEN_PREFIX):
        try:
            seq = int(active[len(GEN_PREFIX):])
        except ValueError:
            seq = 0
    return f"{GEN_PREFIX}{seq + 1:06d}"


def commit(
    spark: SparkSession, base: str, gen_name: str, keep_previous: int = 1
) -> dict:
    """Atomically activate ``gen_name`` (single pointer PUT), then prune:
    generation directories more than ``keep_previous`` behind the new
    active one are deleted, and any pre-generational flat data files at
    the root (first migration) are removed once the pointer supersedes
    them. Returns the written pointer."""
    local = strip_scheme(base).rstrip("/")
    po = PathOps(spark, base)
    prev = read_pointer(spark, base) or {}
    history = [g for g in prev.get("generations", []) if g != gen_name]
    history.append(gen_name)
    ptr = {"active": gen_name, "generations": history}
    # THE swap: one small-object write
    po.write_text(posixpath.join(local, GEN_POINTER), json.dumps(ptr, indent=2))

    # prune generations beyond the retention window
    cutoff = len(history) - 1 - keep_previous
    doomed = history[:cutoff] if cutoff > 0 else []
    for g in doomed:
        po.delete(posixpath.join(local, g), recursive=True)
    if doomed:
        ptr["generations"] = history[cutoff:]
        po.write_text(posixpath.join(local, GEN_POINTER), json.dumps(ptr, indent=2))

    if not prev:
        # first migration: flat root files are superseded by the pointer
        for p, _sz in po.data_files(local):
            rel = p[len(local):].lstrip("/")
            if not rel.startswith(GEN_PREFIX):
                po.delete(p, recursive=False)
    return ptr
