"""Manifest-versioned parquet tables (versioned.py): atomic snapshot
commits, time travel, optimistic-concurrency conflicts, vacuum."""

import os

import pytest

from etl_pipeline_for_retail_sales_data_spark import versioned as V


def _df(spark, rows):
    return spark.createDataFrame(rows, "k long, v string")


@pytest.fixture
def table(tmp_path):
    return str(tmp_path / "tbl")


def test_append_replace_and_time_travel(spark, table):
    assert V.commit(spark, _df(spark, [(1, "a")]), table) == 0
    assert V.commit(spark, _df(spark, [(2, "b")]), table, mode="append") == 1
    assert V.commit(spark, _df(spark, [(9, "z")]), table, mode="replace") == 2

    latest = {r.k for r in V.read_table(spark, table).collect()}
    assert latest == {9}
    v1 = {r.k for r in V.read_table(spark, table, version=1).collect()}
    assert v1 == {1, 2}
    v0 = {r.k for r in V.read_table(spark, table, version=0).collect()}
    assert v0 == {1}

    h = V.history(table)
    assert [e["version"] for e in h] == [0, 1, 2]
    assert [e["mode"] for e in h] == ["append", "append", "replace"]


def test_reader_pinned_to_snapshot_during_writes(spark, table):
    """A DataFrame read before a replace still sees ITS snapshot's files
    — commits add files and swap a pointer, they never mutate data."""
    V.commit(spark, _df(spark, [(1, "a"), (2, "b")]), table)
    pinned = V.read_table(spark, table)
    V.commit(spark, _df(spark, [(3, "c")]), table, mode="replace")
    assert {r.k for r in pinned.collect()} == {1, 2}
    assert {r.k for r in V.read_table(spark, table).collect()} == {3}


def test_concurrent_commit_conflict(spark, table, monkeypatch):
    """Two writers race for the same version: exactly one wins, the loser
    gets CommitConflict (never a torn/overwritten manifest). Simulated by
    pinning the loser's base-version read to a stale value — exactly the
    read-commit interleaving of a real race — while the winner's
    manifest (v1) already exists."""
    V.commit(spark, _df(spark, [(1, "a")]), table)
    V.commit(spark, _df(spark, [(2, "b")]), table, mode="append")  # the "winner"
    monkeypatch.setattr(V, "current_version", lambda td: 0)  # stale read
    with pytest.raises(V.CommitConflict, match="version 1"):
        V.commit(spark, _df(spark, [(3, "c")]), table, mode="append")
    monkeypatch.undo()
    # retry on top of the winner's snapshot succeeds with the next number
    assert V.commit(spark, _df(spark, [(3, "c")]), table, mode="append") == 2
    assert {r.k for r in V.read_table(spark, table).collect()} == {1, 2, 3}


def test_vacuum_reclaims_unreferenced_files(spark, table):
    V.commit(spark, _df(spark, [(1, "a")]), table)
    V.commit(spark, _df(spark, [(2, "b")]), table, mode="replace")
    V.commit(spark, _df(spark, [(3, "c")]), table, mode="replace")
    deleted = V.vacuum(table, keep_last=2)
    assert deleted > 0  # v0's files are unreferenced by v1/v2
    # retained versions still read fine; dropped version is gone
    assert {r.k for r in V.read_table(spark, table, version=2).collect()} == {3}
    assert {r.k for r in V.read_table(spark, table, version=1).collect()} == {2}
    with pytest.raises(FileNotFoundError):
        V.read_table(spark, table, version=0)


def test_empty_table_raises(spark, table):
    with pytest.raises(FileNotFoundError, match="no committed version"):
        V.read_table(spark, table)


def test_schema_evolution_across_commits(spark, table):
    """Append-only schema evolution: a later commit adds a column; with
    merge_schema the snapshot unions the schemas and old rows surface
    nulls for the new column."""
    V.commit(spark, _df(spark, [(1, "a")]), table)
    wider = spark.createDataFrame([(2, "b", 9.5)], "k long, v string, score double")
    V.commit(spark, wider, table, mode="append")
    rows = {r.k: r.score for r in V.read_table(spark, table, merge_schema=True).collect()}
    assert rows == {1: None, 2: 9.5}


def _range_df(spark, lo, hi):
    return spark.range(lo, hi).selectExpr("id AS k", "CAST(id AS STRING) AS v")


def test_commit_harvests_footer_stats(spark, table):
    V.commit(spark, _range_df(spark, 0, 100).coalesce(1), table, stats_cols=["k", "v"])
    m = V._read_manifest(table, 0)
    assert len(m["files"]) == 1
    st = m["stats"][m["files"][0]]
    assert st["k"] == [0, 99]
    assert st["v"][0] == "0" and st["v"][1] == "99"  # string min/max


def test_where_prunes_files_and_stays_exact(spark, table):
    # 4 range-partitioned files -> disjoint k ranges per file
    df = _range_df(spark, 0, 1000).repartitionByRange(4, "k")
    V.commit(spark, df, table, stats_cols=["k"])
    m = V._read_manifest(table, 0)
    assert len(m["files"]) == 4
    pruned = V.prune_files(m, ("k", "=", 17))
    assert len(pruned) == 1  # exactly one file's range covers 17
    assert V.prune_files(m, ("k", "<", 1)) != m["files"]
    # results identical to an unpruned filter
    got = sorted(r.k for r in V.read_table(spark, table, where=("k", "=", 17)).collect())
    assert got == [17]
    lt = V.read_table(spark, table, where=("k", "<", 250)).count()
    assert lt == 250


def test_append_carries_stats_forward(spark, table):
    V.commit(spark, _range_df(spark, 0, 10).coalesce(1), table, stats_cols=["k"])
    V.commit(spark, _range_df(spark, 1000, 1010).coalesce(1), table, mode="append", stats_cols=["k"])
    m = V._read_manifest(table, 1)
    assert len(m["stats"]) == 2  # both commits' files have stats
    pruned = V.prune_files(m, ("k", ">=", 1000))
    assert len(pruned) == 1


def test_where_without_stats_reads_everything_but_filters(spark, table):
    V.commit(spark, _range_df(spark, 0, 100).repartitionByRange(4, "k"), table)  # no stats_cols
    m = V._read_manifest(table, 0)
    assert V.prune_files(m, ("k", "=", 5)) == m["files"]  # conservative: no skipping
    assert [r.k for r in V.read_table(spark, table, where=("k", "=", 5)).collect()] == [5]


def test_where_pruning_all_files_yields_empty_with_schema(spark, table):
    V.commit(spark, _range_df(spark, 0, 100).coalesce(1), table, stats_cols=["k"])
    out = V.read_table(spark, table, where=("k", ">", 10_000))
    assert out.count() == 0
    assert set(out.columns) == {"k", "v"}


def test_where_rejects_unknown_op(spark, table):
    V.commit(spark, _range_df(spark, 0, 10).coalesce(1), table, stats_cols=["k"])
    with pytest.raises(ValueError, match="op must be"):
        V.read_table(spark, table, where=("k", "!=", 3)).collect()


def test_compact_rewrites_small_files_preserving_data(spark, table):
    # 5 append commits of 2 files each -> 10 small files
    for i in range(5):
        V.commit(spark, _range_df(spark, i * 10, i * 10 + 10).repartition(2), table, mode="append")
    before = V._read_manifest(table, V.current_version(table))
    assert len(before["files"]) == 10
    v = V.compact(spark, table, target_files=2, sort_by=["k"], stats_cols=["k"])
    after = V._read_manifest(table, v)
    assert len(after["files"]) == 2
    # same rows, new layout
    got = sorted(r.k for r in V.read_table(spark, table).collect())
    assert got == list(range(50))
    # pre-compaction snapshot still reachable (time travel)
    assert V.read_table(spark, table, version=v - 1).count() == 50


def test_compact_sorted_files_have_disjoint_ranges_for_pruning(spark, table):
    V.commit(spark, _range_df(spark, 0, 1000).repartition(8), table)
    v = V.compact(spark, table, target_files=4, sort_by=["k"], stats_cols=["k"])
    m = V._read_manifest(table, v)
    ranges = sorted(m["stats"][f]["k"] for f in m["files"])
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 < lo2  # range-partitioned + sorted -> non-overlapping
    assert len(V.prune_files(m, ("k", "=", 500))) == 1


def test_merge_into_upserts_and_inserts(spark, table):
    V.commit(spark, _df(spark, [(1, "a"), (2, "b"), (3, "c")]), table)
    src = _df(spark, [(2, "B2"), (9, "new")])
    v = V.merge_into(spark, table, src, key_cols=["k"])
    got = {r.k: r.v for r in V.read_table(spark, table).collect()}
    assert got == {1: "a", 2: "B2", 3: "c", 9: "new"}
    # pre-merge snapshot still readable
    old = {r.k: r.v for r in V.read_table(spark, table, version=v - 1).collect()}
    assert old == {1: "a", 2: "b", 3: "c"}


def test_merge_into_delete_mode(spark, table):
    V.commit(spark, _df(spark, [(1, "a"), (2, "b"), (3, "c")]), table)
    V.merge_into(spark, table, _df(spark, [(2, "x")]), key_cols=["k"], when_matched="delete")
    assert {r.k for r in V.read_table(spark, table).collect()} == {1, 3}


def test_merge_into_rejects_duplicate_source_keys(spark, table):
    V.commit(spark, _df(spark, [(1, "a")]), table)
    with pytest.raises(ValueError, match="duplicate keys"):
        V.merge_into(spark, table, _df(spark, [(2, "x"), (2, "y")]), key_cols=["k"])


def test_merge_into_deterministic_retry_is_idempotent(spark, table):
    V.commit(spark, _df(spark, [(1, "a"), (2, "b")]), table)
    src = _df(spark, [(2, "B"), (5, "e")])
    V.merge_into(spark, table, src, key_cols=["k"])
    V.merge_into(spark, table, src, key_cols=["k"])  # blind retry
    got = {r.k: r.v for r in V.read_table(spark, table).collect()}
    assert got == {1: "a", 2: "B", 5: "e"}


def test_merge_into_pruned_rewrites_only_overlapping_files(spark, table):
    # 4 sorted files with disjoint k ranges: [0,249] [250,499] [500,749] [750,999]
    V.commit(spark, _range_df(spark, 0, 1000), table)
    V.compact(spark, table, target_files=4, sort_by=["k"], stats_cols=["k"])
    before = V._read_manifest(table, V.current_version(table))
    src = _range_df(spark, 100, 110).selectExpr("k", "'UPD' AS v")
    v = V.merge_into(spark, table, src, key_cols=["k"], stats_cols=["k"], prune_on="k")
    after = V._read_manifest(table, v)
    carried = set(before["files"]) & set(after["files"])
    assert len(carried) == 3  # only the [0,249] file was rewritten
    # carried files keep their stats
    for f in carried:
        assert after["stats"][f]["k"] == before["stats"][f]["k"]
    got = {r.k: r.v for r in V.read_table(spark, table).collect()}
    assert len(got) == 1000
    assert all(got[k] == "UPD" for k in range(100, 110))
    assert got[99] == "99" and got[110] == "110"


def test_merge_into_pruned_inserts_outside_all_ranges(spark, table):
    V.commit(spark, _range_df(spark, 0, 100), table)
    V.compact(spark, table, target_files=2, sort_by=["k"], stats_cols=["k"])
    src = _range_df(spark, 5000, 5003).selectExpr("k", "'NEW' AS v")
    v = V.merge_into(spark, table, src, key_cols=["k"], stats_cols=["k"], prune_on="k")
    after = V._read_manifest(table, v)
    assert V.read_table(spark, table).count() == 103
    # both original files untouched (no range overlap with [5000,5002])
    assert len([f for f in after["files"] if f in set(V._read_manifest(table, v - 1)["files"])]) == 2


def test_merge_into_pruned_matches_unpruned_result(spark, table):
    V.commit(spark, _range_df(spark, 0, 500), table)
    V.compact(spark, table, target_files=4, sort_by=["k"], stats_cols=["k"])
    src = _range_df(spark, 480, 520).selectExpr("k", "'M' AS v")
    V.merge_into(spark, table, src, key_cols=["k"], stats_cols=["k"], prune_on="k")
    pruned = sorted((r.k, r.v) for r in V.read_table(spark, table).collect())
    V.merge_into(spark, table, src, key_cols=["k"])  # unpruned on top: idempotent merge
    unpruned = sorted((r.k, r.v) for r in V.read_table(spark, table).collect())
    assert pruned == unpruned


# ---------------------------------------------------------------------------
# Write-audit-publish (WAP)
# ---------------------------------------------------------------------------

from pyspark.sql import functions as F  # noqa: E402

from etl_pipeline_for_retail_sales_data_spark.operators import quality as Q  # noqa: E402


def _batch(spark, rows):
    return spark.createDataFrame(rows, "id long, amount double")


def test_wap_publishes_clean_batch_with_audit_in_manifest(spark, table):
    v = V.write_audit_publish(
        spark, _batch(spark, [(1, 5.0), (2, 6.0)]), table,
        [Q.not_null("id"), Q.non_negative("amount"), Q.unique("id")],
    )
    assert v == 0
    assert V.read_table(spark, table).count() == 2
    m = V._read_manifest(table, v)
    assert {a["check"] for a in m["audit"]} == {
        "not_null(id)", "non_negative(amount)", "unique(id)"
    }
    assert all(a["passed"] for a in m["audit"])


def test_wap_failing_audit_publishes_nothing_and_reports(spark, table):
    V.write_audit_publish(spark, _batch(spark, [(1, 5.0)]), table, [Q.not_null("id")])
    with pytest.raises(V.AuditFailed, match=r"non_negative\(amount\): 1 violations") as ei:
        V.write_audit_publish(
            spark, _batch(spark, [(2, -9.0), (None, 1.0)]), table,
            [Q.not_null("id"), Q.non_negative("amount")],
        )
    # table still at the clean version; staged files discarded
    assert V.current_version(table) == 0
    assert V.read_table(spark, table).count() == 1
    data_dirs = os.listdir(os.path.join(table, "data"))
    assert len(data_dirs) == 1  # only the published batch remains
    bad = {r["check"]: r for r in map(dict, (dict(x) for x in ei.value.report))}
    assert not bad["non_negative(amount)"]["passed"]
    assert bad["not_null(id)"]["n_violations"] == 1


def test_wap_audits_persisted_bytes_not_input_frame(spark, table):
    # the audit reads the staged parquet back: a float written as float32
    # column via schema coercion would surface here. Use a simple marker:
    # the staged read must see exactly the rows that will be published.
    df = _batch(spark, [(1, 1.0), (2, 2.0), (3, 3.0)])
    v = V.write_audit_publish(
        spark, df, table, [Q.satisfies("exactly_3_rows_seen", F.lit(True))]
    )
    assert V.read_table(spark, table, version=v).count() == 3


def test_wap_append_accumulates_versions(spark, table):
    checks = [Q.not_null("id")]
    V.write_audit_publish(spark, _batch(spark, [(1, 1.0)]), table, checks)
    V.write_audit_publish(spark, _batch(spark, [(2, 2.0)]), table, checks)
    assert V.current_version(table) == 1
    assert V.read_table(spark, table).count() == 2
    assert V.read_table(spark, table, version=0).count() == 1


def test_purge_keys_removes_rows_history_and_bytes(spark, table):
    V.commit(spark, _df(spark, [(1, "a"), (2, "b")]), table)
    V.commit(spark, _df(spark, [(3, "c"), (4, "d")]), table, mode="append")
    keys = spark.createDataFrame([(2,), (3,)], "k long")
    rep = V.purge_keys(spark, table, keys, ["k"])
    assert rep["n_purged"] == 2 and rep["n_remaining"] == 2
    # current snapshot clean
    left = {r["k"] for r in V.read_table(spark, table).collect()}
    assert left == {1, 4}
    # history truncated: time travel to any pre-purge version is gone
    assert len(V.history(table)) == 1
    # the PHYSICAL bytes are gone: scan every parquet left on disk
    raw = spark.read.parquet(os.path.join(table, "data", "*"))
    assert {r["k"] for r in raw.collect()} == {1, 4}


def test_purge_keys_unmatched_keys_are_noop(spark, table):
    V.commit(spark, _df(spark, [(1, "a")]), table)
    rep = V.purge_keys(spark, table, spark.createDataFrame([(9,)], "k long"), ["k"])
    assert rep["n_purged"] == 0 and rep["n_remaining"] == 1


def test_purge_keys_pruned_path(spark, table):
    V.commit(spark, _df(spark, [(i, "x") for i in range(10)]), table,
             stats_cols=["k"])
    keys = spark.createDataFrame([(0,), (1,)], "k long")
    rep = V.purge_keys(spark, table, keys, ["k"], prune_on="k", stats_cols=["k"])
    assert rep["n_purged"] == 2
    assert {r["k"] for r in V.read_table(spark, table).collect()} == set(range(2, 10))
