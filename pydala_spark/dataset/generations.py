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
unreadable pointer degrades gracefully rather than failing the job:
``resolve`` falls back to the highest existing ``gen-*`` directory (the
base of a migrated dataset holds only generation subdirs), or to the
base path itself when none exist.
"""

from __future__ import annotations

import json
import posixpath

from pyspark.sql import SparkSession

from pydala_spark.utils.pathops import PathOps, strip_scheme

GEN_POINTER = "_generation.json"
GEN_PREFIX = "gen-"


#: pseudo-generation name for the pre-migration flat root files; appears
#: in the pointer's history so the first migration's originals get the
#: SAME keep_previous retention as any other superseded generation.
ROOT_GEN = ""


def _gen_dirs(po: PathOps, local: str) -> list[str]:
    """Real generation directories only (``gen-`` + digits) — staging
    leftovers like ``gen-000001__repartition_tmp`` must never win a
    corrupt-pointer fallback; numeric sort so unpadded names can't
    misorder."""
    gens = [
        d for d in po.list_dir(local)
        if d.startswith(GEN_PREFIX) and d[len(GEN_PREFIX):].isdigit()
    ]
    return sorted(gens, key=lambda d: int(d[len(GEN_PREFIX):]))


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
    exists; otherwise the path unchanged. One existence probe.

    A pointer file that exists but is unreadable (truncated PUT, crash
    mid-write) degrades to the HIGHEST existing ``gen-*`` directory —
    the base of a migrated dataset holds only generation subdirs, so
    falling back to the base itself would make every read fail."""
    local = strip_scheme(path).rstrip("/")
    po = PathOps(spark, path)
    p = posixpath.join(local, GEN_POINTER)
    if not po.exists(p):
        return path
    try:
        ptr = json.loads(po.read_text(p))
    except Exception:
        ptr = None
    if ptr and ptr.get("active"):
        return posixpath.join(local, ptr["active"])
    gens = _gen_dirs(po, local)
    if gens:
        return posixpath.join(local, gens[-1])
    return path


def next_generation(spark: SparkSession, base: str) -> str:
    """Name of the next generation directory: one past the max of the
    pointer's active entry and any ``gen-*`` directory actually on disk
    (so a corrupt pointer can never hand out a name that collides with
    an existing, possibly-retained generation)."""
    local = strip_scheme(base).rstrip("/")
    po = PathOps(spark, base)
    ptr = read_pointer(spark, base) or {}
    names = [ptr.get("active", "")] + _gen_dirs(po, local)
    seq = 0
    for name in names:
        if name.startswith(GEN_PREFIX):
            try:
                seq = max(seq, int(name[len(GEN_PREFIX):]))
            except ValueError:
                pass
    return f"{GEN_PREFIX}{seq + 1:06d}"


def commit(
    spark: SparkSession, base: str, gen_name: str, keep_previous: int = 1
) -> dict:
    """Atomically activate ``gen_name`` (single pointer PUT), then prune
    generations more than ``keep_previous`` behind the new active one.
    The pre-migration flat root files participate in retention as a
    pseudo-generation (``ROOT_GEN`` in the history), so the first
    migration keeps in-flight readers of the original files alive for
    exactly as long as any other superseded generation.

    Crash safety: generations leaving the retention window are recorded
    in the pointer's ``pending_delete`` ledger in the SAME single PUT
    that activates the new generation; the deletes run after. A crash
    between the PUT and the deletes leaves them in the ledger, and the
    next commit retries them (deletes are idempotent) — no orphaned
    storage, still one pointer write per commit. Returns the written
    pointer."""
    local = strip_scheme(base).rstrip("/")
    po = PathOps(spark, base)
    prev = read_pointer(spark, base)
    if prev is None and po.exists(posixpath.join(local, GEN_POINTER)):
        # pointer exists but is unreadable (truncated PUT): reconstruct
        # the history from disk so previously-retained generations stay
        # in the retention ledger instead of becoming orphaned storage
        history = [g for g in _gen_dirs(po, local) if g != gen_name]
        if any(
            not p[len(local):].lstrip("/").startswith(GEN_PREFIX)
            for p, _sz in po.data_files(local)
        ):
            history = [ROOT_GEN] + history
    elif prev is None:
        history = [ROOT_GEN]  # the flat originals become generation zero
    else:
        history = [g for g in prev.get("generations", []) if g != gen_name]
    history.append(gen_name)

    # prune plan first, so THE swap is truly one small-object write;
    # unfinished deletes from a crashed previous commit are retried
    cutoff = len(history) - 1 - keep_previous
    doomed = history[:cutoff] if cutoff > 0 else []
    def _still_present(g: str) -> bool:
        if g == ROOT_GEN:
            return any(
                not p[len(local):].lstrip("/").startswith(GEN_PREFIX)
                for p, _sz in po.data_files(local)
            )
        return po.exists(posixpath.join(local, g))

    doomed = [
        g for g in (prev or {}).get("pending_delete", [])
        if g not in doomed and _still_present(g)
    ] + doomed
    ptr = {
        "active": gen_name,
        "generations": history[cutoff:] if cutoff > 0 else history,
    }
    if doomed:
        ptr["pending_delete"] = doomed
    po.write_text(posixpath.join(local, GEN_POINTER), json.dumps(ptr, indent=2))

    # the ledger stays in the pointer until the NEXT commit rewrites it —
    # deletes are idempotent, so there is no second PUT to clear it and a
    # crash anywhere below simply means a retry next sweep
    for g in doomed:
        if g == ROOT_GEN:
            # the pre-migration flat files at the base root
            for p, _sz in po.data_files(local):
                rel = p[len(local):].lstrip("/")
                if not rel.startswith(GEN_PREFIX):
                    po.delete(p, recursive=False)
        else:
            po.delete(posixpath.join(local, g), recursive=True)
    return ptr
