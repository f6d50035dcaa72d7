"""Versioned-commit protocol (io/versioned.py): multi-writer isolation,
reader atomicity, crash orphans, vacuum."""

from __future__ import annotations

import json
import os
import threading

import pytest

from dynamic_etl_spark.io import versioned as V
from dynamic_etl_spark.io.versioned import (
    ConcurrentWriteError,
    latest_version,
    read_versioned,
    vacuum,
    write_versioned,
)


def _table(spark, n, tag):
    from pyspark.sql import functions as F

    return spark.range(n).withColumn("tag", F.lit(tag))


def test_versioned_write_read_roundtrip(spark, tmp_path):
    root = str(tmp_path / "t")
    v0 = write_versioned(_table(spark, 10, "a"), root)
    assert v0 == 0 and latest_version(root) == 0
    assert read_versioned(spark, root).count() == 10

    v1 = write_versioned(_table(spark, 20, "b"), root)
    assert v1 == 1
    df = read_versioned(spark, root)
    assert df.count() == 20 and df.select("tag").distinct().collect()[0][0] == "b"
    # time travel: the old snapshot stays readable until vacuumed
    assert read_versioned(spark, root, version=0).count() == 10


def test_versioned_stale_writer_cannot_clobber(spark, tmp_path):
    """Optimistic concurrency: writer A bases on v0, writer B commits v1
    first; A's commit is rejected and B's snapshot survives untouched."""
    root = str(tmp_path / "t")
    write_versioned(_table(spark, 10, "base"), root)

    base_a = latest_version(root)  # A reads its base: 0
    write_versioned(_table(spark, 30, "writer_b"), root)  # B wins the race

    with pytest.raises(ConcurrentWriteError, match="advanced past base version 0"):
        write_versioned(
            _table(spark, 99, "writer_a"), root, base_version=base_a, expected_base=True
        )
    df = read_versioned(spark, root)
    assert df.count() == 30
    assert df.select("tag").distinct().collect()[0][0] == "writer_b"
    # A's aborted snapshot directory was cleaned up
    assert len(os.listdir(os.path.join(root, "_versions"))) == 2


def test_versioned_cas_race_retries_blind_writer(spark, tmp_path, monkeypatch):
    """If two blind writers pick the same version number, link(2) EEXIST
    makes the loser re-read and take the next number — no clobber, no
    lost snapshot. Simulated by feeding the writer a stale latest once."""
    root = str(tmp_path / "t")
    write_versioned(_table(spark, 10, "v0"), root)
    write_versioned(_table(spark, 20, "v1"), root)

    real = V.latest_version
    calls = {"n": 0}

    def stale_once(r):
        calls["n"] += 1
        return 0 if calls["n"] == 1 else real(r)  # first loop sees stale v0

    monkeypatch.setattr(V, "latest_version", stale_once)
    v = write_versioned(_table(spark, 30, "v2"), root)
    assert v == 2  # retried past the collision at version 1
    assert calls["n"] >= 2
    assert read_versioned(spark, root).count() == 30
    # both prior snapshots intact
    assert read_versioned(spark, root, version=1).count() == 20


def test_versioned_commit_primitive_is_pluggable(spark, tmp_path, monkeypatch):
    """VERDICT r11 #6: the protocol's only storage-specific semantic is
    atomic create-exclusive of the commit record, injected via
    put_if_absent. A fake object-store conditional PUT (S3
    If-None-Match: exists -> lost, else atomic replace -> won) drives
    the full lifecycle with zero hard links: commits, reads, the
    blind-writer race (losing PUT -> next version number), and the
    expected_base abort."""
    puts = {"n": 0, "losses": 0}

    def cond_put(path, payload):
        puts["n"] += 1
        if os.path.exists(path):  # the store already has this key
            puts["losses"] += 1
            return False
        tmp = path + ".upload"
        with open(tmp, "wb") as fh:
            fh.write(payload)
        os.replace(tmp, path)  # object PUT: all-or-nothing visibility
        return True

    root = str(tmp_path / "t")
    assert write_versioned(_table(spark, 10, "v0"), root, put_if_absent=cond_put) == 0
    assert write_versioned(_table(spark, 20, "v1"), root, put_if_absent=cond_put) == 1
    assert read_versioned(spark, root).count() == 20
    assert read_versioned(spark, root, version=0).count() == 10

    # blind-writer race: a stale latest makes the writer PUT a key that
    # already exists — the conditional PUT loses, the loop re-reads and
    # commits at the next number (same as the hard-link EEXIST path)
    real = V.latest_version
    calls = {"n": 0}

    def stale_once(r):
        calls["n"] += 1
        return 0 if calls["n"] == 1 else real(r)

    monkeypatch.setattr(V, "latest_version", stale_once)
    v = write_versioned(_table(spark, 30, "v2"), root, put_if_absent=cond_put)
    monkeypatch.undo()
    assert v == 2 and puts["losses"] >= 1
    assert read_versioned(spark, root).count() == 30
    assert read_versioned(spark, root, version=1).count() == 20

    # optimistic concurrency is unchanged under the injected primitive
    with pytest.raises(V.ConcurrentWriteError):
        write_versioned(
            _table(spark, 40, "stale"), root,
            base_version=0, expected_base=True, put_if_absent=cond_put,
        )
    # no hard-link temp residue: every commit key came from the fake PUT
    assert not [
        f for f in os.listdir(os.path.join(root, "_commits"))
        if f.startswith(".tmp-")
    ]


def test_versioned_reader_never_sees_uncommitted(spark, tmp_path):
    """A crashed writer leaves an orphan data dir but no commit record:
    readers stay on the last committed snapshot; vacuum sweeps the orphan."""
    root = str(tmp_path / "t")
    write_versioned(_table(spark, 10, "good"), root)
    # simulate a writer that died after the data write, before the commit
    orphan = os.path.join(root, "_versions", "v-deadbeef")
    os.makedirs(orphan)
    with open(os.path.join(orphan, "part-0.parquet"), "w") as fh:
        fh.write("half-written garbage")

    assert latest_version(root) == 0
    assert read_versioned(spark, root).count() == 10

    # a FRESH uncommitted dir is indistinguishable from an in-flight
    # writer: default vacuum must leave it alone (age guard, review r4)
    assert vacuum(root, keep_versions=2) == []
    assert os.path.isdir(orphan)
    # past the orphan-age window it is a crashed writer's leftover
    removed = vacuum(root, keep_versions=2, min_orphan_age_s=0)
    assert removed == ["v-deadbeef"]
    assert read_versioned(spark, root).count() == 10


def test_versioned_vacuum_prunes_old_snapshots(spark, tmp_path):
    root = str(tmp_path / "t")
    for i in range(4):
        write_versioned(_table(spark, 10 + i, f"v{i}"), root)
    removed = vacuum(root, keep_versions=2)
    assert len(removed) == 2
    assert read_versioned(spark, root).count() == 13
    assert read_versioned(spark, root, version=2).count() == 12
    with pytest.raises(FileNotFoundError):
        _ = json.load(open(os.path.join(root, "_commits", "00000000.json")))


def test_versioned_concurrent_reader_sees_only_complete_versions(spark, tmp_path):
    """A reader polling while a writer commits successive snapshots only
    ever observes counts of COMPLETE versions (each version v holds
    exactly 1000*(v+1) rows)."""
    root = str(tmp_path / "t")
    write_versioned(_table(spark, 1000, "v0"), root)
    valid = {1000 * (v + 1) for v in range(4)}
    seen: list[int] = []
    stop = threading.Event()
    errors: list[Exception] = []

    def poll():
        while not stop.is_set():
            try:
                seen.append(read_versioned(spark, root).count())
            except Exception as exc:  # pragma: no cover - fail loudly below
                errors.append(exc)
                return

    reader = threading.Thread(target=poll)
    reader.start()
    try:
        for v in range(1, 4):
            write_versioned(_table(spark, 1000 * (v + 1), f"v{v}"), root)
    finally:
        stop.set()
        reader.join(timeout=60)
    assert not errors, errors
    assert seen, "reader never completed a poll"
    bad = [c for c in seen if c not in valid]
    assert not bad, f"reader observed partial snapshots: {bad}"


def test_snapshot_diff_between_versions(spark, tmp_path):
    """ops/joins.snapshot_diff over two io/versioned commits: the
    read-side audit of the commit chain classifies every key and
    attributes changed columns by name."""
    from pyspark.sql import functions as F

    from dynamic_etl_spark.ops.joins import snapshot_diff

    root = str(tmp_path / "t")
    v1 = spark.range(6).select(
        F.col("id"), (F.col("id") * 10).alias("val"), F.lit("a").alias("tag")
    )
    write_versioned(v1, root)
    # id 0 removed; id 3 val changed; id 4 val AND tag changed; id 6 added
    v2 = spark.range(1, 7).select(
        F.col("id"),
        F.when(F.col("id") == 3, 999)
        .when(F.col("id") == 4, 888)
        .otherwise(F.col("id") * 10)
        .alias("val"),
        F.when(F.col("id") == 4, "z").otherwise("a").alias("tag"),
    )
    write_versioned(v2, root)

    out = {
        r["id"]: (r["change_type"], r["changed_cols"])
        for r in snapshot_diff(
            read_versioned(spark, root, version=0),
            read_versioned(spark, root, version=1),
            ["id"],
        ).collect()
    }
    assert out[0] == ("REMOVED", "")
    assert out[1] == ("UNCHANGED", "")
    assert out[2] == ("UNCHANGED", "")
    assert out[3] == ("CHANGED", "val")
    assert out[4] == ("CHANGED", "val,tag")
    assert out[6] == ("ADDED", "")
    assert len(out) == 7


def test_snapshot_diff_schema_evolution(spark, tmp_path):
    """A column added in the new version (or dropped from it) still
    diffs: the absent side contributes typed nulls, so appearing values
    read CHANGED and the call does not crash (io/versioned supports
    mid-stream column adds)."""
    from pyspark.sql import functions as F

    from dynamic_etl_spark.ops.joins import snapshot_diff

    old = spark.range(3).select(F.col("id"), (F.col("id") * 10).alias("val"))
    new = spark.range(3).select(
        F.col("id"),
        (F.col("id") * 10).alias("val"),
        F.when(F.col("id") == 1, "x").alias("tag"),  # added column, null for id 0/2
    )
    out = {
        r["id"]: (r["change_type"], r["changed_cols"])
        for r in snapshot_diff(old, new, ["id"]).collect()
    }
    assert out[1] == ("CHANGED", "tag")     # value appeared
    assert out[0] == ("UNCHANGED", "")      # null == null (both-null convention)
    # dropped column: diff the other direction
    out2 = {
        r["id"]: (r["change_type"], r["changed_cols"])
        for r in snapshot_diff(new, old, ["id"]).collect()
    }
    assert out2[1] == ("CHANGED", "tag")    # value vanished
    assert out2[2] == ("UNCHANGED", "")
