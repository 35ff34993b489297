"""Crash-safe versioned-commit LSM compaction for the tagged indexes.

Shared by the signature / line / CMS / span / embedding indexes (one
implementation instead of five copies — the r10 review's ask). The
naive choreography (write the merged partition into the read
namespace, delete sources, rename into place) has two crash windows:

- after the merged write, before the deletes → glob readers see the
  sources AND the merge, silently DOUBLE-COUNTING every row (fatal for
  the count-bearing indexes: CMS counters, line df, span df partials);
- after the deletes, before coverage metadata lands → committed
  history becomes silently invisible.

Both close under a versioned commit: the merge is written under a NEW
base version (``delta=base_v<N+1>``) that readers ignore until one
atomic ``os.replace`` of the state file flips them over, and source
deletion happens strictly AFTER the commit — at every crash point the
visible tag set is exactly the old one or exactly the new one, never a
mix. A stale pending version from a crashed attempt is invisible (not
the active base) and is overwritten by the next attempt.

State file ``_BASE.json`` at the index root:
``{"v": N, "base": "base_vN_w<pid>", "folded": ["tag", ...]}`` —
readers see the active base version plus every extend tag NOT in
``folded``. The base directory name is WRITER-UNIQUE (version number +
writer id): even if two compactors ever run concurrently past the
advisory lock, each writes its own ``delta=base_v{N}_w{pid}`` and the
loser's ``mode=overwrite`` can never clobber the winner's committed
base files — the conditional manifest swap is the single arbiter of
which one becomes visible.
``folded`` is never pruned: a tag's dir may be re-created by a
crash-replayed extend after its rows were folded into the base, and
the exclusion is what keeps that replay idempotent instead of
double-counted.

**Writer contract (r10 verdict #7).** Extends under DISTINCT tags
interleave safely by construction: each writes its own ``delta=<tag>``
dir and ``visible_tags`` surfaces any non-folded tag whenever it
appears, so an extend landing during a compaction simply stays visible
(its tag was not in the fold snapshot). What must be exclusive is the
COMPACT itself (two compactions racing to commit would drop one
writer's folded set) and same-tag extend replays (the caller's
idempotence contract, e.g. one streaming query per out_dir).
``compact`` therefore layers three defenses: (a) an advisory
exclusive ``_WRITER.lock`` at the index root — a second concurrent
compactor fails LOUDLY with ``ConcurrentWriterError``; a lock whose
recorded pid is dead (crashed writer, same host) is broken via an
atomic rename-steal with holder verification — (b) WRITER-UNIQUE base
directories (``base_v{N}_w{pid}``), so even two writers racing past
the lock can never overwrite each other's base files, and (c) a
CONDITIONAL manifest swap: if ``_BASE.json`` changed between the fold
snapshot and the commit, the swap is refused and the loser's pending
dirs are deleted. On a real cluster the lock file maps to the storage
layer's conditional-put / lease primitive (S3 If-None-Match, HDFS
lease); the local-path form is the same protocol.
"""

from __future__ import annotations

import contextlib
import json
import os
import shutil
import tempfile
import time
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_STATE = "_BASE.json"
_LOCK = "_WRITER.lock"


class ConcurrentWriterError(RuntimeError):
    """A second writer attempted a commit-critical section on an index
    root that is already held (or whose manifest moved underfoot)."""


def _pid_alive(pid: int) -> bool:
    try:
        os.kill(pid, 0)
    except ProcessLookupError:
        return False
    except PermissionError:
        return True
    return True


#: grace period after which a lock file with no readable pid (a writer
#: crashed between O_EXCL create and the holder-json write — a
#: microsecond window, so any pid-less lock older than this is a
#: corpse) is treated as stale and broken.
LOCK_ORPHAN_GRACE_SEC = 10.0


def _read_holder(lock: str) -> dict:
    holder: dict = {}
    with contextlib.suppress(OSError, ValueError):
        with open(lock, encoding="utf-8") as fh:
            holder = json.load(fh)
    return holder


def _holder_is_stale(holder: dict, lock: str) -> bool:
    pid = holder.get("pid")
    if isinstance(pid, int):
        return not _pid_alive(pid)
    # no readable pid: stale only once the create->write window has
    # LONG passed (an in-flight writer finishes it in microseconds)
    with contextlib.suppress(OSError):
        return time.time() - os.path.getmtime(lock) > LOCK_ORPHAN_GRACE_SEC
    return True  # the file vanished underneath us: retry the create


@contextlib.contextmanager
def writer_lock(path: str, purpose: str = "compact"):
    """Advisory exclusive writer lock at the index root (O_EXCL create).

    Held for the duration of a compaction. A live holder makes the
    second writer fail loudly; a stale lock (holder pid dead, or
    pid-less past the orphan grace window) is broken and replaced.
    Breaking is ATOMIC: the breaker renames the lock to a
    breaker-unique corpse name — exactly one racing breaker wins the
    rename (losers get ENOENT and retry the O_EXCL create) — and then
    verifies the CORPSE it now exclusively owns really carries the
    dead holder it judged stale. If a live writer replaced the stale
    lock between the staleness read and the rename, the corpse carries
    the live pid: the breaker restores it via ``os.link`` (atomic
    create-if-absent, never clobbers a newer lock) and fails loudly.
    A post-create READBACK remains as the final guard: only the writer
    whose pid survives in the lock proceeds. Committed DATA never
    depends on this lock alone — writer-unique base directories plus
    the conditional manifest swap in :func:`compact` keep a racing
    writer from overwriting a committed base even if both hold locks.
    """
    os.makedirs(path, exist_ok=True)
    lock = os.path.join(path, _LOCK)
    for attempt in range(2):
        try:
            fd = os.open(lock, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            break
        except FileExistsError:
            holder = _read_holder(lock)
            if attempt == 0 and _holder_is_stale(holder, lock):
                # crashed writer: steal the lock atomically via rename
                corpse = f"{lock}.broken.{os.getpid()}.{time.time_ns()}"
                try:
                    os.rename(lock, corpse)
                except OSError:
                    continue  # another breaker won; retry the create
                stolen = _read_holder(corpse)
                pid = stolen.get("pid")
                if isinstance(pid, int) and _pid_alive(pid):
                    # the stale lock was replaced by a LIVE writer's
                    # between our read and the rename: restore theirs
                    # (link = create-if-absent, never clobbers a newer
                    # lock) and lose loudly. A SUPPRESSED restore
                    # failure would leave the live writer lockless
                    # (r12 review): fall back to an O_EXCL rewrite of
                    # the stolen holder json, and if that fails too,
                    # KEEP the corpse as the holder's record and say so.
                    restored = True
                    try:
                        os.link(corpse, lock)
                    except OSError:
                        try:
                            rfd = os.open(
                                lock, os.O_CREAT | os.O_EXCL | os.O_WRONLY
                            )
                            with os.fdopen(rfd, "w", encoding="utf-8") as fh:
                                json.dump(stolen, fh)
                        except OSError:
                            restored = False
                    if restored:
                        with contextlib.suppress(OSError):
                            os.remove(corpse)
                        raise ConcurrentWriterError(
                            f"index root {path} is locked by live writer "
                            f"{stolen}; refusing to break"
                        ) from None
                    raise ConcurrentWriterError(
                        f"index root {path}: stole live writer {stolen}'s "
                        f"lock and could not restore it (a third writer "
                        f"holds the lock file); the holder's record is "
                        f"preserved at {corpse} — resolve manually before "
                        "compacting this index"
                    ) from None
                with contextlib.suppress(OSError):
                    os.remove(corpse)
                continue
            raise ConcurrentWriterError(
                f"index root {path} is locked by writer {holder or '?'}; "
                "a second concurrent compaction would corrupt the "
                "versioned manifest — run one compactor per index"
            ) from None
    with os.fdopen(fd, "w", encoding="utf-8") as fh:
        json.dump({"pid": os.getpid(), "purpose": purpose,
                   "ts": time.time()}, fh)
    # readback guard: if a racing breaker deleted-and-recreated the
    # lock between our create and now, the file no longer carries our
    # pid — we LOST; raise without touching the winner's lock.
    winner: dict = {}
    with contextlib.suppress(OSError, ValueError):
        with open(lock, encoding="utf-8") as fh:
            winner = json.load(fh)
    if winner.get("pid") != os.getpid():
        raise ConcurrentWriterError(
            f"index root {path}: lost the stale-lock takeover race to "
            f"writer {winner or '?'}"
        )
    try:
        yield
    finally:
        # remove only OUR lock (a racing breaker may own it by now)
        mine: dict = {}
        with contextlib.suppress(OSError, ValueError):
            with open(lock, encoding="utf-8") as fh:
                mine = json.load(fh)
        if mine.get("pid") == os.getpid():
            with contextlib.suppress(OSError):
                os.remove(lock)


def _version_files(path: str) -> dict[int, str]:
    """{version: filename} of committed versioned manifests."""
    out: dict[int, str] = {}
    with contextlib.suppress(OSError):
        for entry in os.listdir(path):
            if entry.startswith("_BASE.v") and entry.endswith(".json"):
                with contextlib.suppress(ValueError):
                    out[int(entry[len("_BASE.v") : -len(".json")])] = entry
    return out


def read_state(path: str) -> dict | None:
    """The committed manifest: the highest ``_BASE.v{n}.json`` (the
    version file IS the commit — see ``_write_state``), falling back
    to the legacy single ``_BASE.json`` only for never-versioned
    indexes.

    A just-listed version file can vanish between the list and the
    open (racing manifest GC of a much older max needs two commits
    inside the window, but it is not impossible). That is NOT a
    license to serve the retired legacy manifest (compaction deletes
    it post-commit, so the silent fallback returned None — a
    base-less, folded-unaware view): re-list and take the surviving
    max; if the file is STILL listed, the failure is a real IO error
    and must surface.
    """
    for _ in range(8):
        versions = _version_files(path)
        if not versions:
            break  # never-versioned index: legacy manifest below
        top = max(versions)
        p = os.path.join(path, versions[top])
        try:
            with open(p, encoding="utf-8") as fh:
                return json.load(fh)
        except OSError:
            if top in _version_files(path):
                raise  # committed but unreadable: surface, don't mask
            continue  # version retired between list and open: re-list
    else:
        raise ConcurrentWriterError(
            f"index root {path}: the max manifest version kept vanishing "
            "between list and open; refusing to fall back to the retired "
            "legacy manifest"
        )
    p = os.path.join(path, _STATE)
    if not os.path.exists(p):
        return None
    with open(p, encoding="utf-8") as fh:
        return json.load(fh)


def _write_state(path: str, state: dict) -> None:
    """Commit ``state`` as ``_BASE.v{state['v']}.json`` via an ATOMIC
    claim: the complete manifest is written to a temp file and
    ``os.link``ed to the version name — link is create-if-absent, so
    exactly ONE writer can ever commit a given version number (the
    compare-and-swap the r12 review asked for: a read-check-then-
    ``os.replace`` of one shared file lets two writers past the
    advisory lock interleave and lose an extend tag)."""
    fd, tmp = tempfile.mkstemp(prefix="._base_", dir=path)
    try:
        with os.fdopen(fd, "w", encoding="utf-8") as fh:
            json.dump(state, fh)
        target = os.path.join(path, f"_BASE.v{int(state['v'])}.json")
        try:
            os.link(tmp, target)
        except FileExistsError:
            raise ConcurrentWriterError(
                f"index root {path}: version v{state['v']} is already "
                "committed by another writer; refusing the commit"
            ) from None
    finally:
        with contextlib.suppress(OSError):
            os.remove(tmp)


def visible_tags(path: str, sub: str = "") -> list[str]:
    """Tag names (without ``delta=``) a reader should resolve: the
    active base version plus every extend tag not folded into it.
    Stale/pending base versions are never visible."""
    state = read_state(path)
    folded = set(state["folded"]) if state else set()
    base = state["base"] if state else None
    d = os.path.join(path, sub) if sub else path
    if not os.path.isdir(d):
        return []
    out = []
    for entry in sorted(os.listdir(d)):
        if not entry.startswith("delta="):
            continue
        tag = entry[len("delta=") :]
        if tag.startswith("base_v"):
            if tag == base:
                out.insert(0, tag)
            continue  # stale or uncommitted version
        if tag in folded:
            continue
        out.append(tag)
    return out


def index_paths(path: str, sub: str = "") -> list[str]:
    """Full ``delta=`` directory paths for a ``spark.read.parquet``."""
    d = os.path.join(path, sub) if sub else path
    return [os.path.join(d, f"delta={t}") for t in visible_tags(path, sub)]


def read_visible(
    spark: SparkSession, path: str, sub: str = ""
) -> DataFrame | None:
    """The visible tag set as one frame (None if the index is empty)."""
    paths = index_paths(path, sub)
    if not paths:
        return None
    d = os.path.join(path, sub) if sub else path
    return spark.read.option("basePath", d).parquet(*paths).drop("delta")


def compact(
    spark: SparkSession,
    path: str,
    subs: dict[str, Callable[[DataFrame], DataFrame] | None],
    only_tags: set[str] | None = None,
) -> None:
    """Fold the visible tags of every sub-table into one new base
    version and commit atomically.

    ``subs`` maps sub-table dir name ('' for a flat index) to an
    optional re-aggregation (for indexes whose tags hold mergeable
    PARTIALS — CMS counters, line/span document frequencies; None
    rewrites immutable rows as-is). All sub-tables share one tag set.
    ``only_tags`` restricts which extend tags fold (a stream passes its
    COMMITTED batch tags, leaving a crashed uncommitted tag alone); the
    current base always folds.
    """
    with writer_lock(path):
        state = read_state(path)
        probe = next(iter(subs))
        tags = visible_tags(path, probe)
        fold = [
            t
            for t in tags
            if t.startswith("base_v") or only_tags is None or t in only_tags
        ]
        if not any(not t.startswith("base_v") for t in fold):
            return  # nothing new to fold
        n = (state["v"] + 1) if state else 1
        # writer-unique base dir: a losing concurrent compactor writes
        # base_v{n}_w{its pid} and can never overwrite-clobber a
        # committed base; the manifest records the exact dir name
        new_base = f"base_v{n}_w{os.getpid()}"
        for sub, agg in subs.items():
            d = os.path.join(path, sub) if sub else path
            src = [
                os.path.join(d, f"delta={t}")
                for t in fold
                if os.path.isdir(os.path.join(d, f"delta={t}"))
            ]
            df = spark.read.option("basePath", d).parquet(*src).drop("delta")
            if agg is not None:
                df = agg(df)
            # written OUTSIDE the visible set: base_v{n} != state's base
            df.write.mode("overwrite").parquet(os.path.join(d, f"delta={new_base}"))
        folded = sorted(
            (set(state["folded"]) if state else set())
            | {t for t in fold if not t.startswith("base_v")}
        )
        def _drop_pending() -> None:
            # the pending base dirs are OURS by name (writer-unique):
            # best-effort delete so a refused commit leaves no orphan
            for sub in subs:
                d = os.path.join(path, sub) if sub else path
                shutil.rmtree(
                    os.path.join(d, f"delta={new_base}"), ignore_errors=True
                )

        # fast-fail if the manifest moved between the fold snapshot and
        # now (a writer that bypassed the advisory lock)
        if read_state(path) != state:
            _drop_pending()
            raise ConcurrentWriterError(
                f"index root {path}: manifest changed during compaction; "
                "refusing the commit (pending version deleted)"
            )
        # pre-commit arbitration: any version >= n already on disk means
        # an adversarial writer committed while we folded — refuse BEFORE
        # publishing rather than link-then-roll-back (a reader that loads
        # v{n} in a publish/roll-back window would resolve a folded set
        # whose base dirs are being deleted under it)
        pre = _version_files(path)
        if pre and max(pre) >= n:
            _drop_pending()
            raise ConcurrentWriterError(
                f"index root {path}: manifest v{max(pre)} appeared during "
                f"compaction; refusing the v{n} commit (pending deleted)"
            )
        # COMMIT: atomic claim of version n — os.link(create-if-absent)
        # admits exactly ONE _BASE.v{n}.json ever, so two writers racing
        # past both the lock and the fast-fail cannot interleave commits
        # and lose an extend tag (the r12 review's lost-update hole in
        # the previous read-check-then-replace of one shared file)
        try:
            _write_state(path, {"v": n, "base": new_base, "folded": folded})
        except ConcurrentWriterError:
            _drop_pending()
            raise
        # adversarial-writer guard: a manifest BEYOND ours means someone
        # committed outside the version protocol while we did. Our v{n}
        # STAYS committed — the highest-version rule arbitrates, and
        # deleting just-published data would hand a reader that already
        # resolved v{n} a transient empty view. We only SKIP the
        # destructive cleanup (the winner's folded set may still read
        # our extend tags) and surface the conflict loudly; a later
        # successful compaction sweeps the shadowed base dir + manifest.
        versions = _version_files(path)
        if versions.get(n) is None or max(versions) != n:
            raise ConcurrentWriterError(
                f"index root {path}: manifest set {sorted(versions) or '?'} "
                f"diverged during the v{n} commit; v{n} stands (highest "
                "version arbitrates) but cleanup was skipped"
            )
        # cleanup strictly after the commit: everything deleted here is
        # already invisible, so a crash mid-delete changes nothing
        for sub in subs:
            d = os.path.join(path, sub) if sub else path
            for t in fold:
                shutil.rmtree(os.path.join(d, f"delta={t}"), ignore_errors=True)
            for entry in os.listdir(d):
                if entry.startswith("delta=base_v") and entry != f"delta={new_base}":
                    shutil.rmtree(os.path.join(d, entry), ignore_errors=True)
            spark.catalog.refreshByPath(d)
        # manifest GC: keep the 3 newest version files (readers list
        # then open — a removed file would need two full commits inside
        # that window to have been the max) and retire the legacy
        # single-file manifest, which versioned reads now shadow
        for v, fname in versions.items():
            if v <= n - 3:
                with contextlib.suppress(OSError):
                    os.remove(os.path.join(path, fname))
        with contextlib.suppress(OSError):
            os.remove(os.path.join(path, _STATE))
