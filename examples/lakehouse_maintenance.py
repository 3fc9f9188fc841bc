"""Lakehouse-maintenance walkthrough: the round-12 consistency tier
end to end on plain Parquet.

Runs the full life of a maintained table — clustered write, stats
index, row-level deletes, physical fold, incremental re-clustering,
schema evolution, index-bounded MERGE, time travel, a two-table atomic
transaction, and retention vacuum — printing what each step publishes.
Every read goes through the versioned manifest, so at no point does a
reader see a torn state.

Usage: python examples/lakehouse_maintenance.py
"""

from __future__ import annotations

import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from columnar_analytics_engine_spark.deletes import (  # noqa: E402
    compact_deletes,
    delete_where,
    read_with_deletes,
)
from columnar_analytics_engine_spark.evolution import (  # noqa: E402
    add_column,
    read_evolved,
    rename_column,
)
from columnar_analytics_engine_spark.io import write_sorted  # noqa: E402
from columnar_analytics_engine_spark.layout import (  # noqa: E402
    cluster_compact,
    merge_upsert_files,
    vacuum_unindexed,
)
from columnar_analytics_engine_spark.manifest import (  # noqa: E402
    current_version,
    list_versions,
)
from columnar_analytics_engine_spark.session import get_spark  # noqa: E402
from columnar_analytics_engine_spark.skipping import (  # noqa: E402
    build_stats_index,
    read_indexed,
    read_skipping,
)
from columnar_analytics_engine_spark.transaction import (  # noqa: E402
    commit,
    snapshot_table,
)


def step(msg: str, **kv) -> None:
    print(f"== {msg}" + (f"  {json.dumps(kv)}" if kv else ""))


def main() -> None:
    spark = get_spark(app_name="cae-lakehouse-example")
    tmp = tempfile.mkdtemp(prefix="cae_lakehouse_")
    data, index = f"{tmp}/events", f"{tmp}/events_idx"
    dv = f"{tmp}/events_dv"

    df = spark.range(100_000).select(
        F.col("id"),
        (F.col("id") % 1000).alias("user_id"),
        (F.col("id") % 7).alias("kind"),
        (F.rand(42) * 100).alias("amount"),
    )
    write_sorted(df, data, ["user_id"], n_files=8)
    n_files = build_stats_index(spark, data, index)
    step("clustered write + stats index", files=n_files,
         version=current_version(index))

    # --- row-level delete without rewriting data -----------------------
    n = delete_where(spark, data, dv, "kind = 3")
    survivors = read_with_deletes(spark, data, dv, index_path=index).count()
    step("deletion vectors (merge-on-read)", tombstones=n, survivors=survivors)

    # --- fold tombstones into a bounded physical rewrite ---------------
    out = compact_deletes(spark, data, dv, index)
    step("physical fold", **out, version=current_version(index))

    # --- incremental re-clustering (index-driven) ----------------------
    out = cluster_compact(spark, data, index, ["user_id"], max_files=16)
    step("incremental re-cluster", **out, version=current_version(index))

    # --- time travel: pre-merge snapshot stays readable ----------------
    v_before = current_version(index)
    updates = (
        read_indexed(spark, data, index)
        .filter(F.col("id") < 1000)
        .withColumn("amount", F.col("amount") + 1000)
    )
    out = merge_upsert_files(spark, data, index, updates, "id")
    step("index-bounded MERGE", affected=out["affected_files"],
         pruned=out["pruned_files"], version=out["version"])
    pre = read_indexed(spark, data, index, as_of=v_before)
    cur = read_indexed(spark, data, index)
    step("time travel",
         pre_merge_max=round(pre.agg(F.max("amount")).first()[0], 1),
         current_max=round(cur.agg(F.max("amount")).first()[0], 1),
         retained_versions=list_versions(index))

    # --- metadata-only schema evolution --------------------------------
    add_column(spark, data, index, "source", "string", default="backfill")
    rename_column(spark, data, index, "kind", "event_kind")
    got = read_evolved(spark, data, index)
    step("schema evolution (zero data I/O)",
         columns=got.columns,
         backfilled=got.filter(F.col("source") == "backfill").count())

    # --- pruned reads still exact through it all -----------------------
    pruned = read_skipping(spark, data, index, "user_id le 10")
    step("index-pruned read", rows=pruned.count())

    # --- change-data-feed: incremental read of the merge's delta -------
    from columnar_analytics_engine_spark.cdf import read_changes

    feed = read_changes(spark, data, index, v_before,
                        current_version(index), key="id")
    by_type = {
        r["_change_type"]: r["n"]
        for r in feed.groupBy("_change_type").agg(
            F.count("*").alias("n")
        ).collect()
    }
    step("change-data-feed (merge delta, keyed)", **by_type)

    # --- cluster-spec evolution: switch the clustering column ----------
    from columnar_analytics_engine_spark.clusterspec import (
        cohort_cluster_report,
        set_cluster_spec,
    )

    set_cluster_spec(index, ["user_id"], since_version=0)
    # the table keeps growing: append a slab, then switch the spec
    slab = spark.range(100_000, 140_000).select(
        F.col("id"),
        (F.col("id") % 1000).alias("user_id"),
        (F.col("id") % 7).alias("event_kind"),
        (F.rand(7) * 100).alias("amount"),
        F.lit("ingest").alias("source"),
    )
    slab.repartition(4).write.mode("append").parquet(data)
    from columnar_analytics_engine_spark.skipping import update_stats_index

    update_stats_index(spark, data, index)
    set_cluster_spec(index, ["id"])  # the switch
    # lazy convergence under the new spec (cols=None → active spec);
    # small target so the new cohort is visibly multi-file
    out = cluster_compact(
        spark, data, index, max_files=4, target_file_bytes=256 * 1024
    )
    rep = [
        (r["spec_idx"], r["spec_cols"], r["probe_col"], round(r["avg_depth"], 2))
        for r in cohort_cluster_report(spark, index).collect()
    ]
    step("cluster-spec evolution (per-cohort depth)",
         rewritten=out["rewritten"], cohorts=rep)

    # --- two-table atomic transaction ----------------------------------
    cat = f"{tmp}/catalog.json"
    users = spark.range(1000).select(
        F.col("id").alias("user_id"), (F.col("id") % 5).alias("tier")
    )
    udata, uindex = f"{tmp}/users", f"{tmp}/users_idx"
    write_sorted(users, udata, ["user_id"], n_files=2)
    build_stats_index(spark, udata, uindex)
    commit(cat, {
        "events": {"data": data, "index": index,
                   "version": current_version(index)},
        "users": {"data": udata, "index": uindex,
                  "version": current_version(uindex)},
    })
    e = snapshot_table(spark, cat, "events")
    u = snapshot_table(spark, cat, "users")
    joined = e.join(u, "user_id").groupBy("tier").count().orderBy("tier")
    step("two-table snapshot join", rows_per_tier=[
        (r["tier"], r["count"]) for r in joined.collect()
    ])

    # --- round 14: versioned DV delete commit → feed at commit time ----
    import time

    from columnar_analytics_engine_spark.deletes import delete_keys

    t_before_delete = time.time()
    time.sleep(0.05)
    v_pre = current_version(index)
    doomed = read_indexed(spark, data, index).filter(
        F.col("id").between(500, 520)
    ).select("id")
    delete_keys(spark, data, dv, doomed, "id", index_path=index)
    v_commit = current_version(index)
    feed = read_changes(spark, data, index, v_pre, v_commit)
    step("versioned delete COMMIT (feed shows it before any fold)",
         commit_version=v_commit,
         feed_deletes=feed.filter(
             F.col("_change_type") == "delete").count())
    # TIMESTAMP AS OF: the instant before the delete still reads whole
    at_ts = read_with_deletes(
        spark, data, dv, index_path=index, as_of_ts=t_before_delete
    ).count()
    now = read_with_deletes(spark, data, dv, index_path=index).count()
    step("TIMESTAMP AS OF", rows_at_ts=at_ts, rows_now=now)

    # --- round 14: zero-copy branch, disjoint work, 3-way merge back ---
    from columnar_analytics_engine_spark.branch import (
        clone_table,
        family_health,
        merge_back,
    )

    branch = f"{tmp}/events_branch_idx"
    clone_table(spark, index, branch)
    # source and branch both advance — on DISJOINT keys
    src_upd = read_indexed(spark, data, index).filter(
        F.col("id") < 100
    ).withColumn("amount", F.col("amount") + 5)
    merge_upsert_files(spark, data, index, src_upd, "id")
    br_upd = read_indexed(spark, data, branch).filter(
        F.col("id").between(2000, 2100)
    ).withColumn("amount", F.col("amount") + 9)
    merge_upsert_files(spark, data, branch, br_upd, "id")
    health = family_health(spark, data, index, "id")
    step("branch family health", branches=[
        {k: r[k] for k in ("updates", "deletes", "src_changed_keys",
                           "conflict_keys")}
        for r in health
    ])
    out = merge_back(spark, data, index, branch, "id")  # 3-way, no force
    step("three-way merge back (disjoint keys, no force)", **out)

    # --- retention vacuum: the only place bytes die --------------------
    from columnar_analytics_engine_spark.branch import family_indexes

    removed = vacuum_unindexed(
        spark, data, index, keep_versions=1,
        extra_indexes=tuple(family_indexes(index)),
    )
    step("vacuum (branch-aware)", reclaimed_files=len(removed),
         retained_versions=list_versions(index))
    print("done:", tmp)


if __name__ == "__main__":
    main()
