"""Branches: writable named refs over the shared snapshot log.

A branch commit lives in the same log as main (globally unique ids,
vacuum/expire see its parts) but carries a ``branch`` marker and parents
onto the branch's own ref tip, so the main table never observes it; a
``fast_forward`` folds the branch back into main as ONE self-contained
net-diff snapshot the changefeed/CDC/expire machinery treats like any
other commit. Reference analog: the reference pipeline has no notion of
refs at all (its outputs are write-once directories) — this is
engine-of-its-own territory modeled on Iceberg branch semantics.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _mk(spark, out, n=300, parts=2):
    from sparkcodec.engine import encode_table

    df = spark.range(n).select(
        F.col("id"), (F.col("id") % 5).alias("g"),
        (F.col("id") * 2).alias("v"),
    )
    encode_table(spark, df, out, cluster_by=["g"], salt_by=["id"],
                 num_parts=parts, resume=False)
    return df


def _append(spark, out, lo, n, branch=None):
    from sparkcodec.engine import encode_table

    df = spark.range(lo, lo + n).select(
        F.col("id"), (F.col("id") % 5).alias("g"),
        (F.col("id") * 2).alias("v"),
    )
    return encode_table(spark, df, out, append=True, cluster_by=["g"],
                        salt_by=["id"], num_parts=1, branch=branch)


def test_branch_create_list_delete(spark, tmp_path):
    from sparkcodec.engine import (
        create_branch,
        delete_branch,
        delete_tag,
        list_branches,
        list_tags,
        resolve_ref,
        tag_snapshot,
    )

    out = str(tmp_path / "t")
    _mk(spark, out)
    assert create_branch(out, "dev") == {"name": "dev", "snapshot_id": 1}
    assert list_branches(out) == {"dev": 1}
    assert list_tags(out) == {}  # branches are not tags
    assert resolve_ref(out, "dev") == 1
    # ref-namespace collisions refused both ways
    with pytest.raises(ValueError, match="already exists"):
        create_branch(out, "dev")
    with pytest.raises(ValueError, match="is a branch"):
        tag_snapshot(out, "dev")
    tag_snapshot(out, "v1")
    with pytest.raises(ValueError, match="already exists"):
        create_branch(out, "v1")
    # wrong-kind deletes refused; right-kind deletes work
    with pytest.raises(ValueError, match="use delete_branch"):
        delete_tag(out, "dev")
    with pytest.raises(ValueError, match="use delete_tag"):
        delete_branch(out, "v1")
    assert delete_branch(out, "dev") is True
    assert delete_branch(out, "dev") is False
    assert list_branches(out) == {}


def test_branch_write_isolation(spark, tmp_path):
    """Appends and deletes on a branch are invisible to main (and to
    main's defaults: tip reads, as_of, tagging), while the branch ref
    reads its own chain; main keeps committing correctly AFTER a
    trailing branch commit."""
    from sparkcodec.engine import (
        create_branch,
        decode_table,
        delete_rows,
        snapshot_id_as_of,
        snapshots,
        tag_snapshot,
    )

    out = str(tmp_path / "t")
    _mk(spark, out, n=300)
    create_branch(out, "dev")
    _append(spark, out, 300, 100, branch="dev")          # branch: +100
    delete_rows(spark, out, ("id", 0, 49), branch="dev")  # branch: -50
    assert decode_table(spark, out).count() == 300        # main untouched
    assert decode_table(spark, out, ref="dev").count() == 350
    # branch rows really are the branch's: spot-check the delete range
    # (decode's where prunes conservatively; exact filter composes)
    b = decode_table(spark, out, ref="dev", where=("id", 0, 59))
    assert b.where("id BETWEEN 0 AND 59").count() == 10  # 0..49 deleted
    # a commit on MAIN after trailing branch entries parents onto main's
    # tip, not the branch commit
    _append(spark, out, 1000, 50)
    snaps = snapshots(out)
    mains = [s for s in snaps if not s.get("branch")]
    assert mains[-1]["parent"] == mains[-2]["id"]
    assert decode_table(spark, out).count() == 350        # 300 + 50
    assert decode_table(spark, out, ref="dev").count() == 350  # unchanged
    # defaults ignore branch commits: as_of "now" and tag default both
    # resolve the main tip
    assert snapshot_id_as_of(out, 4e9) == mains[-1]["id"]
    assert tag_snapshot(out, "tip")["snapshot_id"] == mains[-1]["id"]


def test_branch_upsert_and_fast_forward(spark, tmp_path):
    """Upsert on a branch, then fast-forward: main atomically adopts the
    branch's net state; a second ff with no new branch commits is a
    no-op; more branch commits fast-forward again (the previous ff
    marker is recognized as this branch's)."""
    from sparkcodec.engine import (
        create_branch,
        decode_table,
        fast_forward,
        upsert_rows,
    )

    out = str(tmp_path / "t")
    _mk(spark, out, n=300)
    create_branch(out, "fix")
    up = spark.range(100).select(
        F.col("id"), F.lit(9).cast("long").alias("g"),
        (F.col("id") + 7).alias("v"),
    )
    r = upsert_rows(spark, up, out, "id", branch="fix",
                    cluster_by=["g"], salt_by=["id"], num_parts=1)
    assert r["rows_appended"] == 100 and r["rows_deleted"] == 100
    assert decode_table(spark, out).count() == 300  # main pre-ff
    ff = fast_forward(out, "fix")
    assert ff["fast_forwarded"] is True
    main = decode_table(spark, out)
    assert main.count() == 300
    assert main.where("g = 9").count() == 100  # upserted rows adopted
    assert main.where("id < 100 and v = id + 7").count() == 100
    # no new branch commits -> no-op
    ff2 = fast_forward(out, "fix")
    assert ff2["fast_forwarded"] is False
    # branch continues past the ff and fast-forwards again
    _append(spark, out, 500, 40, branch="fix")
    ff3 = fast_forward(out, "fix")
    assert ff3["fast_forwarded"] is True
    assert decode_table(spark, out).count() == 340


def test_fast_forward_diverged_refused(spark, tmp_path):
    from sparkcodec.engine import create_branch, fast_forward

    out = str(tmp_path / "t")
    _mk(spark, out, n=200)
    create_branch(out, "dev")
    _append(spark, out, 200, 50, branch="dev")
    _append(spark, out, 900, 50)  # main moves past the fork
    with pytest.raises(ValueError, match="main moved since"):
        fast_forward(out, "dev")


def test_branch_changefeed_and_cdc(spark, tmp_path):
    """The main changefeed delivers nothing for branch commits; the
    fast-forward entry delivers the branch's net NEW rows exactly once,
    and in CDC mode the branch's net deletes surface as delete events at
    the fast-forward snapshot."""
    from sparkcodec.datasource import SparkcodecDataSource
    from sparkcodec.engine import (
        create_branch,
        delete_rows,
        fast_forward,
        snapshots,
        table_changes,
    )

    spark.dataSource.register(SparkcodecDataSource)
    out = str(tmp_path / "t")
    _mk(spark, out, n=300)
    create_branch(out, "dev")
    _append(spark, out, 300, 100, branch="dev")
    delete_rows(spark, out, ("id", 0, 49), branch="dev")

    def drain(sink, ck):
        q = (spark.readStream.format("sparkcodec").load(out)
             .writeStream.format("parquet").option("path", sink)
             .option("checkpointLocation", ck)
             .trigger(availableNow=True).start())
        q.awaitTermination()
        return spark.read.parquet(sink)

    got = drain(str(tmp_path / "s1"), str(tmp_path / "c1"))
    assert got.count() == 300  # root only; branch commits invisible
    ff = fast_forward(out, "dev")
    got2 = drain(str(tmp_path / "s1"), str(tmp_path / "c1"))
    # incremental: exactly the branch's net-new rows, delivered once
    assert got2.count() == 400
    assert got2.where("id >= 300").count() == 100
    # CDC: the ff snapshot carries the branch's net deletes + inserts
    ch = table_changes(spark, out, "id",
                       start_snapshot=ff["snapshot_id"] - 1).collect()
    ops = {(r["op"], r["id"]) for r in ch}
    assert ("delete", 0) in ops and ("delete", 49) in ops
    assert ("insert", 300) in ops
    assert ("delete", 50) not in ops  # carried-through keys cancel
    n_del = sum(1 for op, _ in ops if op == "delete")
    assert n_del == 50
    # branch commits themselves emit no CDC events
    sids = {s["id"] for s in snapshots(out) if s.get("branch")}
    assert not [r for r in ch if r["snapshot_id"] in sids]


def test_branch_survives_expire(spark, tmp_path):
    """expire_snapshots protects branch TIPS like tags (materialized
    root with fork_base); the branch stays readable, keeps accepting
    commits, and still fast-forwards when main did not move."""
    from sparkcodec.engine import (
        create_branch,
        decode_table,
        expire_snapshots,
        fast_forward,
        list_branches,
        snapshots,
    )

    out = str(tmp_path / "t")
    _mk(spark, out, n=200)
    create_branch(out, "dev")
    _append(spark, out, 200, 50, branch="dev")
    _append(spark, out, 250, 50, branch="dev")
    expire_snapshots(out, keep_last=1)
    # branch tip materialized: still readable, intermediate gone
    assert decode_table(spark, out, ref="dev").count() == 300
    assert decode_table(spark, out).count() == 200
    tip = list_branches(out)["dev"]
    by_id = {s["id"]: s for s in snapshots(out)}
    assert by_id[tip].get("tag_only") and by_id[tip].get("branch") == "dev"
    assert by_id[tip].get("fork_base") == 1
    # keeps accepting commits and fast-forwards (main never moved)
    _append(spark, out, 300, 25, branch="dev")
    assert decode_table(spark, out, ref="dev").count() == 325
    ff = fast_forward(out, "dev")
    assert ff["fast_forwarded"] is True
    assert decode_table(spark, out).count() == 325


def test_changefeed_after_expire_then_fast_forward(spark, tmp_path):
    """Regression: expire_snapshots materializes an unmerged branch tip
    as a tag_only root, which the stream reader skips — so the branch's
    appended parts MUST be stamped back on that root (append_parts from
    the pre-squash log) for a later fast_forward to fold into its
    entry's append_parts. Before the fix, a routine expire between
    branch appends and the merge made the changefeed silently drop the
    branch's inserted rows (batch reads were always correct)."""
    from sparkcodec.datasource import SparkcodecDataSource
    from sparkcodec.engine import (
        create_branch,
        expire_snapshots,
        fast_forward,
        snapshots,
    )

    spark.dataSource.register(SparkcodecDataSource)
    out = str(tmp_path / "t")
    _mk(spark, out, n=300)
    create_branch(out, "dev")
    _append(spark, out, 300, 60, branch="dev")
    _append(spark, out, 360, 40, branch="dev")

    def drain(sink, ck):
        q = (spark.readStream.format("sparkcodec").load(out)
             .writeStream.format("parquet").option("path", sink)
             .option("checkpointLocation", ck)
             .trigger(availableNow=True).start())
        q.awaitTermination()
        return spark.read.parquet(sink)

    sink, ck = str(tmp_path / "s"), str(tmp_path / "c")
    assert drain(sink, ck).count() == 300  # pre-expire: root only
    expire_snapshots(out, keep_last=1)
    # the materialized branch root carries its exact appended set
    by_id = {s["id"]: s for s in snapshots(out)}
    root = next(s for s in by_id.values() if s.get("branch"))
    assert root.get("tag_only") and len(root["append_parts"]) > 0
    ff = fast_forward(out, "dev")
    assert ff["fast_forwarded"] is True
    got = drain(sink, ck)
    # the feed must now deliver the branch's 100 pre-expire inserts
    assert got.count() == 400
    assert got.where("id >= 300").count() == 100


def test_branch_rollback_refused_and_vacuum_safe(spark, tmp_path):
    """rollback targets main history only; vacuum_orphans never
    reclaims committed branch parts."""
    from sparkcodec.engine import (
        create_branch,
        decode_table,
        rollback_table,
        snapshots,
        vacuum_orphans,
    )

    out = str(tmp_path / "t")
    _mk(spark, out, n=200)
    create_branch(out, "dev")
    _append(spark, out, 200, 50, branch="dev")
    bsid = [s["id"] for s in snapshots(out) if s.get("branch")][0]
    with pytest.raises(ValueError, match="use fast_forward"):
        rollback_table(out, bsid)
    assert vacuum_orphans(out)["parts_vacuumed"] == 0
    assert decode_table(spark, out, ref="dev").count() == 250


def test_branch_cli_surface(spark, tmp_path, monkeypatch, capsys):
    """maintain_job drives the branch lifecycle without a Spark session:
    create at a pinned snapshot, list, fast-forward (no-op here: no
    branch commits), delete."""
    import json

    from jobs.maintain_job import main

    out = str(tmp_path / "t")
    _mk(spark, out, n=100)

    def run(*argv):
        monkeypatch.setattr("sys.argv", ["maintain_job.py", "--table", out,
                                         *argv])
        assert main() == 0
        return json.loads(capsys.readouterr().out.strip().splitlines()[-1])

    r = run("--create-branch", "dev:1", "--branches")
    assert r["create_branch"] == {"name": "dev", "snapshot_id": 1}
    assert r["branches"] == {"dev": 1}
    r = run("--fast-forward", "dev")
    assert r["fast_forward"]["fast_forwarded"] is False
    r = run("--delete-branch", "dev", "--branches")
    assert r["delete_branch"] is True and r["branches"] == {}
    # merge-branch + rename-column CLI twins (merge reuses the session)
    from sparkcodec.engine import decode_table

    run("--create-branch", "dev2")
    _append(spark, out, 100, 20, branch="dev2")
    r = run("--merge-branch", "dev2")
    assert r["merge_branch"]["fast_forwarded"] is True
    assert decode_table(spark, out).count() == 120
    r = run("--rename-column", "v:val")
    assert r["rename_column"]["renamed"] == ["v", "val"]
    assert decode_table(spark, out).where("val = id * 2").count() == 120


def test_branch_datasource_read_and_schema_evolution(spark, tmp_path):
    """The DataSource ref option reads branch tips; a schema evolution
    committed ON a branch (append with a new nullable column) stays off
    main until the fast-forward adopts the branch's schema — per-
    snapshot schema versioning routes each chain to its own columns."""
    from sparkcodec.datasource import SparkcodecDataSource
    from sparkcodec.engine import (
        create_branch,
        decode_table,
        encode_table,
        fast_forward,
    )

    spark.dataSource.register(SparkcodecDataSource)
    out = str(tmp_path / "t")
    _mk(spark, out, n=200)
    create_branch(out, "dev")
    wide = spark.range(200, 260).select(
        F.col("id"), (F.col("id") % 5).alias("g"), (F.col("id") * 2).alias("v"),
        F.lit(1).cast("long").alias("extra"),
    )
    encode_table(spark, wide, out, append=True, cluster_by=["g"],
                 salt_by=["id"], num_parts=1, branch="dev")
    # DataSource batch read resolves the branch ref
    ds = (spark.read.format("sparkcodec").option("ref", "dev").load(out))
    assert ds.count() == 260
    assert "extra" in ds.columns
    # main: still the pre-evolution schema and rows
    m = decode_table(spark, out)
    assert m.count() == 200 and "extra" not in m.columns
    fast_forward(out, "dev")
    m2 = decode_table(spark, out)
    assert m2.count() == 260 and "extra" in m2.columns
    assert m2.where("extra = 1").count() == 60  # old rows read as NULL


def test_rebase_branch_then_merge(spark, tmp_path):
    """Part-granular three-way merge: main appends AND deletes after the
    fork while the branch appends and deletes disjoint parts; rebase
    replays the branch's net diff onto the new main tip, fast-forward
    then completes the merge — both sides' changes land exactly once."""
    from sparkcodec.engine import (
        create_branch,
        decode_table,
        delete_rows,
        fast_forward,
        rebase_branch,
    )

    out = str(tmp_path / "t")
    # two widely separated id bands so the CoW deletes touch disjoint parts
    _mk(spark, out, n=200, parts=1)               # band A: 0..199 (part 1)
    _append(spark, out, 10_000, 200)              # band B: 10000..10199
    create_branch(out, "dev")
    # branch: new rows + delete inside band B only
    _append(spark, out, 20_000, 60, branch="dev")
    delete_rows(spark, out, ("id", 10_000, 10_049), branch="dev")
    # main diverges: new rows + delete inside band A only
    _append(spark, out, 30_000, 40)
    delete_rows(spark, out, ("id", 0, 24))
    with pytest.raises(ValueError, match="main moved since"):
        fast_forward(out, "dev")
    r = rebase_branch(out, "dev")
    assert r["rebased"] is True and r["conflicts"] == []
    # rebased branch sees BOTH sides' changes
    b = decode_table(spark, out, ref="dev")
    assert b.count() == 400 + 60 + 40 - 50 - 25
    assert b.where("id BETWEEN 0 AND 24").count() == 0        # main's delete
    assert b.where("id BETWEEN 10000 AND 10049").count() == 0  # branch's
    assert b.where("id >= 20000 AND id < 21000").count() == 60
    # main unchanged until the ff completes the merge
    assert decode_table(spark, out).count() == 400 + 40 - 25
    ff = fast_forward(out, "dev")
    assert ff["fast_forwarded"] is True
    assert decode_table(spark, out).count() == 425
    # idempotent: nothing further to rebase or forward
    assert rebase_branch(out, "dev")["rebased"] is False
    assert fast_forward(out, "dev")["fast_forwarded"] is False


def test_rebase_conflict_refused(spark, tmp_path):
    """Both sides rewriting the SAME part is a genuine conflict: the
    branch's rewrite was computed against rows main has since changed,
    so the rebase refuses with the part list."""
    from sparkcodec.engine import create_branch, delete_rows, rebase_branch

    out = str(tmp_path / "t")
    _mk(spark, out, n=200, parts=1)
    create_branch(out, "dev")
    delete_rows(spark, out, ("id", 0, 9), branch="dev")   # rewrites part 1
    delete_rows(spark, out, ("id", 100, 109))             # main rewrites it too
    with pytest.raises(ValueError, match="BOTH the branch and main"):
        rebase_branch(out, "dev")


def test_rebase_conflict_row_level_replay(spark, tmp_path):
    """With a SparkSession the conflict case no longer refuses: the
    branch's recorded logical ops (delete predicate, upsert batch)
    replay row-by-row on a fresh fork of the current tip — both sides'
    changes land (git-rebase semantics), and merge_branch publishes."""
    from pyspark.sql import functions as F

    from sparkcodec.engine import (
        create_branch,
        decode_table,
        merge_branch,
        delete_rows,
        upsert_rows,
    )

    out = str(tmp_path / "t")
    _mk(spark, out, n=200, parts=1)
    create_branch(out, "dev")
    delete_rows(spark, out, ("id", 0, 9), branch="dev")   # rewrites part 1
    up = spark.createDataFrame([(150, 0, -5), (900, 0, -5)],
                               "id long, g long, v long")
    upsert_rows(spark, up, out, "id", branch="dev",
                cluster_by=["g"], salt_by=["id"], num_parts=1)
    delete_rows(spark, out, ("id", 100, 109))             # main rewrites too
    r = merge_branch(out, "dev", spark=spark)
    assert r["fast_forwarded"] is True
    d = decode_table(spark, out)
    # main's delete AND both branch ops applied
    assert d.where("id < 10").count() == 0
    assert d.where("id BETWEEN 100 AND 109").count() == 0
    assert d.where("v = -5").count() == 2
    assert d.count() == 200 - 10 - 10 + 1  # id=900 is a new key
    # the throwaway replay ref is gone; only 'dev' remains
    from sparkcodec.engine import list_branches

    assert set(list_branches(out)) == {"dev"}


def test_rebase_replay_refuses_squashed_history(spark, tmp_path):
    """Replay needs the branch's per-commit op history: after an expire
    materialized the branch root (ops squashed away), a conflicting
    rebase must refuse loudly even with a session."""
    from sparkcodec.engine import (
        create_branch,
        delete_rows,
        expire_snapshots,
        rebase_branch,
    )

    out = str(tmp_path / "t")
    _mk(spark, out, n=200, parts=1)
    create_branch(out, "dev")
    delete_rows(spark, out, ("id", 0, 9), branch="dev")
    expire_snapshots(out, keep_last=1)  # branch tip -> tag_only root
    delete_rows(spark, out, ("id", 100, 109))  # main rewrites the root part
    with pytest.raises(ValueError, match="squash|fresh branch"):
        rebase_branch(out, "dev", spark=spark)


def test_rebase_empty_branch_moves_ref(spark, tmp_path):
    from sparkcodec.engine import create_branch, list_branches, rebase_branch

    out = str(tmp_path / "t")
    _mk(spark, out, n=100)
    create_branch(out, "dev")     # at snapshot 1
    _append(spark, out, 100, 50)  # main moves to snapshot 2
    r = rebase_branch(out, "dev")
    assert r["rebased"] is True and r["parts_added"] == 0
    assert list_branches(out)["dev"] == 2


def test_streaming_wap_into_branch(spark, tmp_path):
    """Streaming write-audit-publish: a stream ingests into a STAGING
    branch (one branch snapshot per micro-batch, exactly-once via the
    stream tag), main stays untouched for auditing, and fast_forward
    publishes the audited batches atomically."""
    from sparkcodec.engine import create_branch, decode_table, fast_forward
    from sparkcodec.streaming import encode_stream

    out = str(tmp_path / "t")
    _mk(spark, out, n=100, parts=1)
    create_branch(out, "staging")
    src = str(tmp_path / "src")
    spark.range(100, 160).select(
        F.col("id"), (F.col("id") % 5).alias("g"), (F.col("id") * 2).alias("v"),
    ).write.parquet(src)
    stream = (spark.readStream.schema("id long, g long, v long")
              .option("maxFilesPerTrigger", "1").parquet(src))
    q = encode_stream(stream, out, str(tmp_path / "ck"), trigger_once=True,
                      cluster_by=["g"], salt_by=["id"], num_parts=1,
                      branch="staging")
    q.awaitTermination()
    assert decode_table(spark, out).count() == 100          # audit window
    assert decode_table(spark, out, ref="staging").count() == 160
    ff = fast_forward(out, "staging")
    assert ff["fast_forwarded"] is True
    assert decode_table(spark, out).count() == 160
    # replay on the same checkpoint: exactly-once no-op on the branch too
    q2 = encode_stream(stream, out, str(tmp_path / "ck"), trigger_once=True,
                       cluster_by=["g"], salt_by=["id"], num_parts=1,
                       branch="staging")
    q2.awaitTermination()
    assert decode_table(spark, out, ref="staging").count() == 160


def test_resume_refuses_cross_chain_pending(spark, tmp_path):
    """A crashed append's _pending_append.json binds its part-id base to
    its TARGET CHAIN: a resume aimed at a different chain must refuse,
    or it would adopt the crashed run's checkpointed parts and commit
    another chain's rows onto this one."""
    import json as _json

    from sparkcodec.engine import create_branch

    out = str(tmp_path / "t")
    _mk(spark, out, n=100, parts=1)
    create_branch(out, "dev")
    # simulate a crashed MAIN append: pending marker without its commit
    meta = _json.load(open(f"{out}/_table_meta.json"))
    part_keys = ("num_parts", "layout", "cluster_by", "salt_by", "columns",
                 "zorder_by", "target_part_rows")
    cfg = {k: meta[k] for k in part_keys}
    cfg["num_parts"] = 1
    with open(f"{out}/_pending_append.json", "w") as fh:
        _json.dump({"base": 2, "config": cfg, "branch": None}, fh)
    with pytest.raises(ValueError, match="targeted 'main'"):
        _append(spark, out, 100, 50, branch="dev")
    # the matching chain resumes fine
    _append(spark, out, 100, 50)


def test_merge_branch_convenience(spark, tmp_path):
    """merge_branch = rebase (when diverged) + fast-forward, in one
    call; a non-diverged branch just fast-forwards."""
    from sparkcodec.engine import create_branch, decode_table, merge_branch

    out = str(tmp_path / "t")
    _mk(spark, out, n=200, parts=1)
    _append(spark, out, 10_000, 100)
    create_branch(out, "dev")
    _append(spark, out, 20_000, 60, branch="dev")
    _append(spark, out, 30_000, 40)  # main diverges
    r = merge_branch(out, "dev")
    assert r["rebased"] is True and r["fast_forwarded"] is True
    assert decode_table(spark, out).count() == 400
    # not diverged: plain ff path
    _append(spark, out, 40_000, 10, branch="dev")
    r2 = merge_branch(out, "dev")
    assert r2["rebased"] is False and r2["fast_forwarded"] is True
    assert decode_table(spark, out).count() == 410


def test_crashed_replay_ref_reaped_and_hidden(spark, tmp_path):
    """A crashed row-level replay leaves its throwaway __rebase_* ref
    behind; it must be invisible to list_branches and reaped by the
    next replay or expire — never pinning garbage history forever."""
    from sparkcodec.engine import (
        _read_refs,
        _write_ref,
        expire_snapshots,
        list_branches,
    )

    out = str(tmp_path / "t")
    _mk(spark, out, n=100)
    _write_ref(out, "__rebase_dead1", 1, kind="branch", force=False)
    assert "__rebase_dead1" not in list_branches(out)
    assert "__rebase_dead1" in _read_refs(out)
    expire_snapshots(out, keep_last=1)
    assert "__rebase_dead1" not in _read_refs(out)


def test_rebase_replay_refuses_schema_op_entries(spark, tmp_path):
    """A rename/add_column entry in a walked branch chain must refuse
    row-level replay with a named error — previously it fell through to
    the append arm with empty parts and silently vanished."""
    import pytest as _pytest

    from sparkcodec import engine as E

    out = str(tmp_path / "t")
    from pyspark.sql import functions as F

    df = spark.range(40).select(F.col("id"), (F.col("id") % 2).alias("g"))
    E.encode_table(spark, df, out, cluster_by=["g"], salt_by=["id"],
                   num_parts=1, resume=False)
    tip = E.snapshots(out)[-1]["id"]
    # hand-built walked chains containing schema-op entries
    for marker, match in (
        ({"rename_column": ["g", "h"]}, "renames"),
        ({"add_column": ["x", "i64"]}, "adds"),
        ({"drop_column": "g"}, "drops"),
    ):
        walked = [dict({"id": 99, "new_parts": [], "n_rows": 0}, **marker)]
        with _pytest.raises(ValueError, match=match):
            E._rebase_replay(spark, out, "dev", walked, tip)
