"""Crash-consistency of the versioned-commit LSM compaction: at every
crash point readers must see exactly the old tag set or exactly the
new base — never a double-counting mix, never missing history."""

from __future__ import annotations

import json
import os
import shutil

from csv_2_db_pipeline_data_engineering_spark.operators import lsm
from csv_2_db_pipeline_data_engineering_spark.operators.sketch import (
    cms_rows,
    compact_cms_index,
    extend_cms_index,
    read_cms_index,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _counts(spark, path):
    return {
        (r["d"], r["bucket"]): r["cnt"]
        for r in read_cms_index(spark, path).collect()
    }


def _setup(spark, tmp_path):
    b1 = _docs(spark, [(1, "the cat sat on the mat and the cat sat again")])
    b2 = _docs(spark, [(2, "a dog ran to the park and a dog ran back")])
    path = str(tmp_path / "cms")
    extend_cms_index(b1, path, "batch1")
    extend_cms_index(b2, path, "batch2")
    expected = {
        (r["d"], r["bucket"]): r["cnt"]
        for r in cms_rows(b1.unionByName(b2)).collect()
    }
    return path, expected


def test_crash_before_commit_leaves_old_view_intact(spark, tmp_path):
    """Pending base version on disk but no state commit: readers must
    ignore it (no double counting) — the window the r10 review flagged
    in the in-namespace-tmp choreography."""
    path, expected = _setup(spark, tmp_path)
    # simulate: merged partition fully written, then crash before the
    # state-file commit
    read_cms_index(spark, path).write.mode("overwrite").parquet(
        os.path.join(path, "delta=base_v1")
    )
    assert _counts(spark, path) == expected  # pending version invisible
    # the next compaction attempt completes normally over the old view
    compact_cms_index(spark, path)
    assert _counts(spark, path) == expected
    base = lsm.read_state(path)["base"]
    assert base.startswith("base_v1_w")  # writer-unique dir name
    assert lsm.visible_tags(path) == [base]


def test_crash_after_commit_before_deletes_hides_folded_tags(spark, tmp_path):
    """State committed but source tag dirs still on disk: readers must
    resolve ONLY the base (folded tags excluded), and a re-created
    folded tag (crash-replayed extend) stays excluded."""
    path, expected = _setup(spark, tmp_path)
    compact_cms_index(spark, path)
    base = lsm.read_state(path)["base"]
    # simulate the crash: resurrect a folded source tag's directory
    b1 = _docs(spark, [(1, "the cat sat on the mat and the cat sat again")])
    cms_rows(b1).write.mode("overwrite").parquet(
        os.path.join(path, "delta=batch1")
    )
    assert lsm.visible_tags(path) == [base]  # folded stays folded
    assert _counts(spark, path) == expected  # no double counting
    # a genuinely NEW tag is visible on top of the base
    b3 = _docs(spark, [(3, "rain fell on the roof while the cat sat still")])
    extend_cms_index(b3, path, "batch3")
    assert set(lsm.visible_tags(path)) == {base, "batch3"}


def test_recompaction_rolls_versions_and_cleans_stale(spark, tmp_path):
    path, expected = _setup(spark, tmp_path)
    compact_cms_index(spark, path)
    b3 = _docs(spark, [(3, "rain fell on the roof while the cat sat still")])
    extend_cms_index(b3, path, "batch3")
    after = {
        (r["d"], r["bucket"]): r["cnt"]
        for r in read_cms_index(spark, path).collect()
    }
    compact_cms_index(spark, path)
    base2 = lsm.read_state(path)["base"]
    assert base2.startswith("base_v2_w")
    assert lsm.visible_tags(path) == [base2]
    assert _counts(spark, path) == after
    dirs = [t for t in os.listdir(path) if t.startswith("delta=")]
    assert dirs == [f"delta={base2}"]  # v1 and batch tags cleaned up
    state = lsm.read_state(path)
    assert set(state["folded"]) >= {"batch1", "batch2", "batch3"}


def test_compact_with_no_new_tags_is_a_noop(spark, tmp_path):
    path, _ = _setup(spark, tmp_path)
    compact_cms_index(spark, path)
    v = lsm.read_state(path)["v"]
    compact_cms_index(spark, path)  # nothing new to fold
    assert lsm.read_state(path)["v"] == v


def test_concurrent_compactor_is_rejected_loudly(spark, tmp_path):
    """A second compactor on a held index root must fail with
    ConcurrentWriterError and leave the index view unchanged — never
    corrupt the versioned manifest (r10 verdict #7)."""
    import pytest

    path, expected = _setup(spark, tmp_path)
    with lsm.writer_lock(path):  # a live writer holds the root
        with pytest.raises(lsm.ConcurrentWriterError):
            compact_cms_index(spark, path)
        assert _counts(spark, path) == expected  # view untouched
        assert lsm.read_state(path) is None  # no manifest was committed
    # lock released -> the compaction proceeds normally
    compact_cms_index(spark, path)
    assert lsm.visible_tags(path) == [lsm.read_state(path)["base"]]
    assert _counts(spark, path) == expected


def test_stale_lock_from_dead_writer_is_broken(spark, tmp_path):
    """A lock whose recorded pid is gone (crashed compactor) must not
    wedge the index forever: the next compactor breaks it and runs."""
    path, expected = _setup(spark, tmp_path)
    with open(os.path.join(path, "_WRITER.lock"), "w") as fh:
        json.dump({"pid": 2**22 + 12345, "purpose": "compact"}, fh)
    compact_cms_index(spark, path)  # breaks the stale lock, completes
    assert lsm.visible_tags(path) == [lsm.read_state(path)["base"]]
    assert _counts(spark, path) == expected
    assert not os.path.exists(os.path.join(path, "_WRITER.lock"))
    # the atomic rename-steal leaves no corpse file behind
    assert not [f for f in os.listdir(path) if ".broken." in f]


def test_conditional_swap_refuses_a_moved_manifest(spark, tmp_path, monkeypatch):
    """Belt-and-braces behind the advisory lock: if the manifest
    changes between the fold snapshot and the commit (a writer that
    bypassed the lock), the swap is refused and the pending base stays
    invisible."""
    import pytest

    path, expected = _setup(spark, tmp_path)
    real_read_state = lsm.read_state
    calls = {"n": 0}

    def racing_read_state(p):
        state = real_read_state(p)
        calls["n"] += 1
        if calls["n"] == 1:
            # after the fold snapshot is taken, a rogue writer commits
            lsm._write_state(p, {"v": 9, "base": "base_v9", "folded": []})
        return state

    monkeypatch.setattr(lsm, "read_state", racing_read_state)
    with pytest.raises(lsm.ConcurrentWriterError):
        compact_cms_index(spark, path)
    monkeypatch.undo()
    # the refused compactor DELETES its pending base dirs (no orphan
    # disk leak across repeated conflicts); readers resolve only the
    # untouched extend tags, with no double-counting mix
    assert lsm.visible_tags(path) == ["batch1", "batch2"]
    assert not [
        t for t in os.listdir(path) if t.startswith("delta=base_v")
    ]  # pending version cleaned up on refusal
    assert _counts(spark, path) == expected


def test_breaker_restores_a_live_lock_it_stole(spark, tmp_path, monkeypatch):
    """The atomic rename-steal verifies the corpse it renamed really is
    the dead holder it judged stale. If a LIVE writer's lock was
    renamed (the stale lock was replaced between the staleness read and
    the rename), the breaker restores it via link and fails loudly —
    never leaving the live holder lockless."""
    import pytest

    path, _ = _setup(spark, tmp_path)
    lock = os.path.join(path, "_WRITER.lock")
    live = {"pid": os.getpid(), "purpose": "compact"}
    with open(lock, "w") as fh:
        json.dump(live, fh)
    # force the staleness judgment to fire on a lock that is actually
    # live by the time the rename lands — the corpse-verification path
    monkeypatch.setattr(lsm, "_holder_is_stale", lambda holder, lk: True)
    with pytest.raises(lsm.ConcurrentWriterError):
        with lsm.writer_lock(path):
            pass
    # the live holder's lock was restored, and no corpse remains
    assert json.load(open(lock)) == live
    assert not [f for f in os.listdir(path) if ".broken." in f]


def test_version_claim_is_exclusive(spark, tmp_path):
    """The commit IS the atomic claim of _BASE.v{n}.json: a second
    writer claiming the same version number fails loudly and the first
    writer's manifest survives untouched (the r12 review's CAS ask —
    a read-check-then-replace of one shared file could interleave)."""
    import pytest

    path = str(tmp_path / "idx")
    os.makedirs(path)
    lsm._write_state(path, {"v": 1, "base": "base_v1_w1", "folded": ["a"]})
    with pytest.raises(lsm.ConcurrentWriterError):
        lsm._write_state(path, {"v": 1, "base": "base_v1_w2", "folded": []})
    assert lsm.read_state(path)["base"] == "base_v1_w1"
    # a higher version claims fine and becomes the visible manifest
    lsm._write_state(path, {"v": 2, "base": "base_v2_w1", "folded": ["a", "b"]})
    assert lsm.read_state(path)["v"] == 2


def test_commit_stands_when_newer_manifest_appears(
    spark, tmp_path, monkeypatch
):
    """Adversarial-writer guard: if a manifest BEYOND ours lands while
    we commit (outside both the lock and the version protocol), our
    commit STAYS published — the highest-version rule arbitrates — and
    only the destructive cleanup is skipped, so neither a reader that
    already resolved our version nor the winner's extend tags lose
    data (the r12 review's publish-then-roll-back transient view)."""
    import pytest

    path, expected = _setup(spark, tmp_path)
    real_versions = lsm._version_files

    def racing_versions(p):
        out = dict(real_versions(p))
        if out:  # only after our claim landed: fake a newer winner
            out[99] = out[max(out)]
        return out

    monkeypatch.setattr(lsm, "_version_files", racing_versions)
    with pytest.raises(lsm.ConcurrentWriterError, match="diverged"):
        compact_cms_index(spark, path)
    monkeypatch.undo()
    # the commit stands: manifest v1 is on disk and serves the folded
    # base; the cleanup was skipped, so the folded extend tags survive
    # on disk (invisible under v1's folded set) for the winner to read
    state = lsm.read_state(path)
    assert state is not None and state["v"] == 1
    assert lsm.visible_tags(path) == [state["base"]]
    assert {t[len("delta=") :] for t in os.listdir(path)
            if t.startswith("delta=batch")} == {"batch1", "batch2"}
    assert _counts(spark, path) == expected


def test_precommit_newer_manifest_refuses_before_publish(
    spark, tmp_path, monkeypatch
):
    """A manifest that lands between the fold snapshot and the commit
    is caught BEFORE the version link: the pending base is dropped, no
    manifest is published, and the old view is untouched (the r12
    review asked for check-then-link, not link-then-roll-back)."""
    import pytest

    path, expected = _setup(spark, tmp_path)
    # pin compact's snapshot/fast-fail view to the pre-adversary state,
    # then plant a REAL adversarial v1 manifest: only the direct
    # _version_files pre-commit check can see it
    monkeypatch.setattr(lsm, "read_state", lambda p: None)
    lsm._write_state(path, {"v": 1, "base": "base_v1_w999", "folded": []})
    with pytest.raises(lsm.ConcurrentWriterError, match="refusing the v1"):
        compact_cms_index(spark, path)
    monkeypatch.undo()
    # nothing of ours published: the adversary's manifest is intact and
    # our pending writer-unique base dir was dropped
    assert lsm.read_state(path) == {
        "v": 1, "base": "base_v1_w999", "folded": []
    }
    mine = f"base_v1_w{os.getpid()}"
    assert not os.path.isdir(os.path.join(path, f"delta={mine}"))
    # the extend tags still hold the full pre-compaction data
    assert {t[len("delta=") :] for t in os.listdir(path)
            if t.startswith("delta=batch")} == {"batch1", "batch2"}


def test_read_state_retries_vanished_max_version(tmp_path, monkeypatch):
    """A just-listed max version file that vanishes before the open is
    re-listed and the surviving max served — never the retired legacy
    manifest (whose silent fallback returned a base-less view); a max
    version that is listed but UNREADABLE surfaces the IO error."""
    import pytest

    path = str(tmp_path / "idx")
    os.makedirs(path)
    lsm._write_state(path, {"v": 1, "base": "base_v1_w1", "folded": ["a"]})
    real_versions = lsm._version_files
    calls = {"n": 0}

    def ghost_once(p):
        out = dict(real_versions(p))
        calls["n"] += 1
        if calls["n"] == 1:  # first list: a ghost max that vanished
            out[3] = "_BASE.v3.json"
        return out

    monkeypatch.setattr(lsm, "_version_files", ghost_once)
    assert lsm.read_state(path)["v"] == 1  # retried down to the survivor
    monkeypatch.undo()

    def ghost_always(p):
        out = dict(real_versions(p))
        out[3] = "_BASE.v3.json"  # listed every time but never openable
        return out

    monkeypatch.setattr(lsm, "_version_files", ghost_always)
    with pytest.raises(OSError):
        lsm.read_state(path)
