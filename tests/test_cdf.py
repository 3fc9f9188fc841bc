"""Change-data-feed between manifest versions (cdf.py):

* a pure MAINTENANCE rewrite (compaction) nets to an EMPTY feed —
  rows that merely moved between files are not changes;
* a MERGE emits delete-old + insert-new for updates and insert for
  new keys; a folded delete emits delete;
* the feed is metadata-planned: files in both versions are never read;
* vacuumed versions raise, like as-of time travel.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from columnar_analytics_engine_spark.cdf import changed_files, read_changes
from columnar_analytics_engine_spark.io import read_table, write_sorted
from columnar_analytics_engine_spark.layout import (
    cluster_compact,
    merge_upsert_files,
    vacuum_unindexed,
)
from columnar_analytics_engine_spark.manifest import current_version
from columnar_analytics_engine_spark.skipping import build_stats_index


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.fixture()
def table(spark, sf_small, tmp_path):
    """orders written unclustered (so compaction has work) + index v1."""
    data = str(tmp_path / "data")
    index = str(tmp_path / "idx")
    src = read_table(spark, sf_small, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    src.repartition(8).write.parquet(data)
    build_stats_index(spark, data, index)
    return data, index, src


def test_compaction_only_feed_is_empty(spark, table):
    """A re-cluster rewrites files but changes no rows: every moved row
    appears +1 in an added file and -1 in a removed file — the net
    feed must be EMPTY (the property that makes the feed consumable
    without layout knowledge)."""
    data, index, _src = table
    v1 = current_version(index)
    out = cluster_compact(spark, data, index, ["o_custkey"], max_files=8)
    assert out["rewritten"] > 0
    v2 = current_version(index)
    diff = changed_files(spark, index, v1, v2)
    assert diff["added"] and diff["removed"]  # files DID change...
    ch = read_changes(spark, data, index, v1, v2)
    assert ch.count() == 0  # ...rows did not
    assert "_change_type" in ch.columns and "_change_count" in ch.columns


def test_merge_feed_emits_logical_delta(spark, table):
    data, index, src = table
    v1 = current_version(index)
    updates = src.filter(F.col("o_orderkey") <= 200).withColumn(
        "o_totalprice", F.col("o_totalprice") + F.lit(1000.0)
    )
    inserts = spark.createDataFrame(
        [(77_000_001, 1, 42.0)], "o_orderkey bigint, o_custkey bigint, o_totalprice double"
    ).withColumn("o_orderkey", F.col("o_orderkey").cast("long")).withColumn(
        "o_custkey", F.col("o_custkey").cast("long")
    )
    # align types with the source frame
    inserts = inserts.select(
        F.col("o_orderkey").cast(dict(src.dtypes)["o_orderkey"]),
        F.col("o_custkey").cast(dict(src.dtypes)["o_custkey"]),
        F.col("o_totalprice").cast(dict(src.dtypes)["o_totalprice"]),
    ).toDF("o_orderkey", "o_custkey", "o_totalprice")
    merge_upsert_files(
        spark, data, index, updates.unionByName(inserts), "o_orderkey"
    )
    v2 = current_version(index)
    ch = read_changes(spark, data, index, v1, v2)
    expect = _rows(
        updates.select("*", F.lit("insert").alias("t"))
        .unionByName(inserts.select("*", F.lit("insert").alias("t")))
        .unionByName(
            src.filter(F.col("o_orderkey") <= 200).select(
                "*", F.lit("delete").alias("t")
            )
        )
    )
    got = _rows(
        ch.select("o_orderkey", "o_custkey", "o_totalprice", "_change_type")
    )
    assert got == expect
    # every net multiplicity is 1 (unique keys)
    assert ch.filter(F.col("_change_count") != 1).count() == 0


def test_same_version_and_vacuumed_version(spark, table):
    data, index, _src = table
    v1 = current_version(index)
    # from == to: empty feed with the right schema
    ch = read_changes(spark, data, index, v1, v1)
    assert ch.count() == 0
    # two maintenance rounds, then vacuum v1 away
    cluster_compact(spark, data, index, ["o_custkey"], max_files=8)
    cluster_compact(spark, data, index, ["o_orderkey"], max_files=8)
    vacuum_unindexed(spark, data, index, keep_versions=1)
    v_now = current_version(index)
    with pytest.raises(FileNotFoundError, match="version"):
        read_changes(spark, data, index, v1, v_now).collect()


def test_keyed_feed_classifies_updates(spark, table):
    """With a unique key declared, delete+insert pairs on one key
    classify as update_preimage/update_postimage; pure inserts and
    deletes keep their types."""
    data, index, src = table
    v1 = current_version(index)
    updates = src.filter(F.col("o_orderkey") <= 100).withColumn(
        "o_totalprice", F.col("o_totalprice") + F.lit(7.0)
    )
    new_row = src.filter(F.col("o_orderkey") <= 1).select(
        (F.col("o_orderkey") + 88_000_000).alias("o_orderkey"),
        "o_custkey",
        "o_totalprice",
    )
    merge_upsert_files(
        spark, data, index, updates.unionByName(new_row), "o_orderkey"
    )
    v2 = current_version(index)
    ch = read_changes(spark, data, index, v1, v2, key="o_orderkey")
    by_type = {
        r["_change_type"]: r["n"]
        for r in ch.groupBy("_change_type").agg(F.count("*").alias("n")).collect()
    }
    n_upd = updates.count()
    assert by_type.get("update_preimage") == n_upd
    assert by_type.get("update_postimage") == n_upd
    assert by_type.get("insert") == new_row.count()
    assert "delete" not in by_type
    # post-images carry the NEW values, pre-images the OLD
    post = ch.filter(
        (F.col("_change_type") == "update_postimage")
    ).select("o_orderkey", "o_totalprice")
    assert _rows(post) == _rows(updates.select("o_orderkey", "o_totalprice"))


def test_cursor_consumer_tracks_table_exactly(spark, table, tmp_path):
    """The consume → apply → advance loop: a consumer that folds each
    feed batch into a keyed state table reconstructs the table exactly
    after every maintenance cycle, without ever rescanning it; a
    replayed batch (crash before advance) is idempotent under net
    application."""
    from collections import Counter

    from columnar_analytics_engine_spark.cdf import (
        advance_cursor,
        consume_changes,
        read_cursor,
    )

    data, index, src = table
    cursor = str(tmp_path / "consumer" / "cursor")
    state: Counter = Counter()

    def apply(feed_df):
        for r in feed_df.collect():
            d = r.asDict()
            t, n = d.pop("_change_type"), d.pop("_change_count")
            state[tuple(d.values())] += n if t == "insert" else -n
        for k in [k for k, v in state.items() if v == 0]:
            del state[k]

    def table_rows():
        from columnar_analytics_engine_spark.skipping import read_indexed

        return Counter(tuple(r) for r in read_indexed(spark, data, index).collect())

    # bootstrap: first consumption emits the snapshot as inserts
    feed, frm, to = consume_changes(spark, data, index, cursor)
    assert frm == 0 and feed is not None
    apply(feed)
    advance_cursor(cursor, to)
    assert state == table_rows()

    # maintenance cycle 1: merge
    upd = src.filter(F.col("o_orderkey") <= 150).withColumn(
        "o_totalprice", F.col("o_totalprice") + F.lit(5.0)
    )
    merge_upsert_files(spark, data, index, upd, "o_orderkey")
    feed, frm, to = consume_changes(spark, data, index, cursor)
    assert feed is not None and frm == read_cursor(cursor)
    # crash-replay: apply the SAME batch twice without advancing —
    # net application must not double-count after re-consume
    snapshot = Counter(state)
    apply(feed)
    state2 = Counter(state)
    state.clear(); state.update(snapshot)
    feed2, _f, to2 = consume_changes(spark, data, index, cursor)
    apply(feed2)
    assert state == state2 and to2 == to
    advance_cursor(cursor, to)
    assert state == table_rows()

    # maintenance cycle 2: append a slab -> feed is pure inserts
    from columnar_analytics_engine_spark.skipping import update_stats_index

    slab = src.limit(40).select(
        (F.col("o_orderkey") + 55_000_000).alias("o_orderkey"),
        "o_custkey",
        "o_totalprice",
    )
    # repartition (not coalesce): limit() collapses to one partition,
    # and the compaction cycle below needs >=2 overlapping files
    slab.repartition(2).write.mode("append").parquet(data)
    update_stats_index(spark, data, index)
    feed, frm, to = consume_changes(spark, data, index, cursor)
    assert {r["_change_type"] for r in feed.select("_change_type").distinct().collect()} == {"insert"}
    apply(feed)
    advance_cursor(cursor, to)
    assert state == table_rows()

    # maintenance cycle 3: pure compaction -> empty feed, cursor moves
    out = cluster_compact(
        spark, data, index, ["o_orderkey"], max_files=8,
        target_file_bytes=2 * 1024,
    )
    assert out["rewritten"] > 0
    feed, frm, to = consume_changes(spark, data, index, cursor)
    assert feed is not None and feed.count() == 0  # rows didn't change
    advance_cursor(cursor, to)
    assert state == table_rows()

    # nothing new published -> None
    feed, frm, to = consume_changes(spark, data, index, cursor)
    assert feed is None and frm == to


def test_versioned_feed_attributes_commits(spark, table, tmp_path):
    """read_changes_versioned (round 14): per-commit attribution —
    each step's rows carry the version that published them and a
    monotone journaled timestamp; never-published orphan stages are
    skipped; the concatenation of steps nets to the plain feed."""
    from collections import Counter

    from columnar_analytics_engine_spark.cdf import read_changes_versioned
    from columnar_analytics_engine_spark.deletes import delete_keys
    from columnar_analytics_engine_spark.manifest import write_manifest

    data, index, src = table
    dv = str(tmp_path / "dv")
    v1 = current_version(index)
    upd = src.filter("o_orderkey <= 50").withColumn(
        "o_totalprice", F.col("o_totalprice") + F.lit(5.0)
    )
    merge_upsert_files(spark, data, index, upd, "o_orderkey")
    v2 = current_version(index)
    # an orphan STAGED version (publish=False) — must not appear as a step
    from columnar_analytics_engine_spark.manifest import read_manifest

    write_manifest(spark, index, read_manifest(spark, index), publish=False)
    losers = src.filter("o_orderkey > 500 AND o_orderkey <= 510").select(
        "o_orderkey"
    )
    delete_keys(spark, data, dv, losers, "o_orderkey", index_path=index)
    v3 = current_version(index)
    feed = read_changes_versioned(
        spark, data, index, v1, v3, key="o_orderkey"
    ).collect()
    versions = {r["_commit_version"] for r in feed}
    assert versions == {v2, v3}
    # timestamps monotone with version order
    ts = {r["_commit_version"]: r["_commit_timestamp"] for r in feed}
    assert ts[v2] <= ts[v3]
    # step concatenation nets to the plain interval feed
    plain = Counter(
        (r["o_orderkey"], r["_change_type"]) for r in
        read_changes(spark, data, index, v1, v3, key="o_orderkey").collect()
    )
    stepped = Counter(
        (r["o_orderkey"], r["_change_type"]) for r in feed
    )
    assert stepped == plain
