"""CLI parity tests (reference src/cli.cpp write/scan/query)."""

from __future__ import annotations

import json

from columnar_analytics_engine_spark import cli
from columnar_analytics_engine_spark.io import read_csv, read_json, write_csv, write_json


def test_cli_write_scan_query_roundtrip(spark, tmp_path, capsys):
    out = str(tmp_path / "synth.parquet")
    cli.main(["write", out, "500", "7"])
    assert "wrote 500 rows" in capsys.readouterr().out

    cli.main(["scan", out])
    meta = json.loads(capsys.readouterr().out)
    assert meta["total_rows"] == 500
    assert set(meta["schema"]) == {"id", "value", "category", "region", "status"}

    cli.main(
        [
            "query",
            out,
            "--where",
            "value,GT,5000",
            "--groupby",
            "region",
            "--agg",
            "sum,value",
        ]
    )
    lines = capsys.readouterr().out.strip().splitlines()
    # header + ≤4 regions, key-sorted group-by output
    assert lines[0].split("\t") == ["region", "count", "sum", "min", "max"]
    keys = [ln.split("\t")[0] for ln in lines[1:]]
    assert keys == sorted(keys)


def test_cli_projection_and_filter(spark, tmp_path, capsys):
    out = str(tmp_path / "s2.parquet")
    cli.main(["write", out, "100"])
    capsys.readouterr()
    cli.main(["query", out, "--select", "id,region", "--where", "id,LT,5"])
    lines = capsys.readouterr().out.strip().splitlines()
    assert lines[0] == "id\tregion"
    assert len(lines) == 6  # header + 5 rows


def test_csv_roundtrip(spark, tmp_path):
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, name string")
    path = str(tmp_path / "csv_out")
    write_csv(df, path)
    back = read_csv(spark, path, schema="id long, name string")
    assert sorted((r["id"], r["name"]) for r in back.collect()) == [(1, "a"), (2, "b")]


def test_json_roundtrip(spark, tmp_path):
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, name string")
    path = str(tmp_path / "json_out")
    write_json(df, path)
    back = read_json(spark, path, schema="id long, name string")
    assert sorted((r["id"], r["name"]) for r in back.collect()) == [(1, "a"), (2, "b")]


def test_cli_explain_prints_plan(capsys, spark, sf_small):
    from columnar_analytics_engine_spark.cli import main

    main(["explain", "scan_full_count", sf_small])
    out = capsys.readouterr().out
    assert "Physical Plan" in out and "Scan parquet" in out


def test_cli_explain_unknown_query_lists_names(capsys, spark):
    import pytest

    from columnar_analytics_engine_spark.cli import main

    with pytest.raises(SystemExit):
        main(["explain", "no_such_query"])
    assert "choose from" in capsys.readouterr().out


def test_cli_run_prints_and_writes(tmp_path, capsys):
    from columnar_analytics_engine_spark.cli import main

    main(["run", "agg_global", "/root/testdata/sf0.001"])
    out = capsys.readouterr().out
    assert "count" in out.splitlines()[0]

    dest = str(tmp_path / "out.parquet")
    main(["run", "dedup_exact", "/root/testdata/sf0.001", "--out", dest])
    out = capsys.readouterr().out
    assert "wrote" in out and dest in out


def test_cli_run_preview_is_driver_bounded(capsys):
    """``run`` without --out previews via limit(21) — the full result
    (millions of pairs for dedup_minhash_lsh at scale) never lands on
    the driver; output is capped at 20 rows + a truncation marker."""
    from columnar_analytics_engine_spark.cli import main

    main(["run", "scan_projection", "/root/testdata/sf0.001"])
    out = capsys.readouterr().out
    lines = out.strip().splitlines()
    assert len(lines) <= 22  # header + 20 rows + marker
    assert "more than 20 rows" in out

    # the verdict's concrete scenario: a pair-producing dedup query
    main(["run", "dedup_minhash_lsh", "/root/testdata/sf0.001"])
    out = capsys.readouterr().out
    assert len(out.strip().splitlines()) <= 22


def test_cli_run_unknown_query_lists_registry(capsys):
    import pytest as _pytest

    from columnar_analytics_engine_spark.cli import main

    with _pytest.raises(SystemExit):
        main(["run", "nope_not_a_query"])
    assert "choose from" in capsys.readouterr().out


def test_cli_sql_prints_writes_and_explains(tmp_path, capsys):
    from columnar_analytics_engine_spark.cli import main

    main([
        "sql",
        "SELECT r_name, COUNT(*) AS n FROM region GROUP BY r_name ORDER BY r_name",
        "/root/testdata/sf0.001",
    ])
    out = capsys.readouterr().out
    assert out.splitlines()[0] == "r_name\tn"
    assert len(out.splitlines()) == 6  # header + 5 regions

    # joins across registered views work and --out writes parquet
    dest = str(tmp_path / "sqlout.parquet")
    main([
        "sql",
        "SELECT n.n_name, r.r_name FROM nation n JOIN region r"
        " ON n.n_regionkey = r.r_regionkey",
        "/root/testdata/sf0.001",
        "--out", dest,
    ])
    out = capsys.readouterr().out
    assert "wrote 25 rows" in out

    main(["sql", "SELECT 1 AS one", "/root/testdata/sf0.001", "--explain"])
    assert "Physical Plan" in capsys.readouterr().out


def test_cli_sql_limit_marks_truncation(capsys):
    from columnar_analytics_engine_spark.cli import main

    main([
        "sql",
        "SELECT o_orderkey FROM orders ORDER BY o_orderkey",
        "/root/testdata/sf0.001",
        "--limit", "3",
    ])
    out = capsys.readouterr().out
    assert len([l for l in out.splitlines() if l.isdigit()]) == 3
    assert "more than 3 rows" in out


def test_cli_index_build_plan_update_and_skipping_query(spark, tmp_path, capsys):
    """index build → plan (dry-run pruning counts) → query --index
    (pruned scan, same rows) → update after an append."""
    from pyspark.sql import functions as F

    data = str(tmp_path / "clustered")
    index = str(tmp_path / "idx")
    spark.range(1000).select(
        F.col("id"), (F.col("id") % 4).alias("part"), (F.col("id") * 2).alias("value")
    ).repartitionByRange(4, "id").sortWithinPartitions("id").write.parquet(data)

    cli.main(["index", "build", data, index])
    assert json.loads(capsys.readouterr().out)["files_indexed"] == 4

    cli.main(["index", "plan", data, index, "--predicate", "id lt 10"])
    plan = json.loads(capsys.readouterr().out)
    assert plan["files_total"] == 4
    assert plan["files_pruned"] == 3
    assert plan["files_kept"] == 1

    cli.main(["query", data, "--index", index, "--where", "id,LT,10",
              "--agg", "count,id"])
    lines = capsys.readouterr().out.strip().splitlines()
    assert lines[1].split("\t")[0] == "10"

    spark.range(1000, 1100).select(
        F.col("id"), (F.col("id") % 4).alias("part"), (F.col("id") * 2).alias("value")
    ).coalesce(1).write.mode("append").parquet(data)
    cli.main(["index", "update", data, index])
    assert json.loads(capsys.readouterr().out) == {"added": 1, "removed": 0}


def test_cli_optimize_and_cluster_report(spark, tmp_path, capsys):
    raw = str(tmp_path / "raw.parquet")
    cli.main(["write", raw, "2000", "3"])
    capsys.readouterr()
    zo = str(tmp_path / "zo")
    zidx = str(tmp_path / "zidx")
    cli.main(
        ["optimize", raw, zo, "--zorder", "id,value", "--files", "8",
         "--index", zidx]
    )
    out = json.loads(capsys.readouterr().out)
    assert out["layout"] == {
        "zorder": ["id", "value"], "bits": 16, "method": "linear",
    }
    assert out["files_indexed"] >= 1

    cli.main(["cluster-report", zidx, "--columns", "id,value"])
    rows = json.loads(capsys.readouterr().out)
    by_col = {r["probe_col"]: r for r in rows}
    assert set(by_col) == {"id", "value"}
    for r in rows:
        assert 1.0 <= r["avg_depth"] <= r["n_files"]

    # clustered output returns the same data
    src = spark.read.parquet(raw)
    dst = spark.read.parquet(zo)
    assert dst.count() == src.count() == 2000
    assert sorted(tuple(r) for r in dst.collect()) == sorted(
        tuple(r) for r in src.collect()
    )


def test_cli_optimize_requires_exactly_one_layout(tmp_path, capsys):
    import pytest

    with pytest.raises(SystemExit):
        cli.main(["optimize", str(tmp_path), str(tmp_path / "o")])
    with pytest.raises(SystemExit):
        cli.main(
            ["optimize", str(tmp_path), str(tmp_path / "o"),
             "--sort", "a", "--zorder", "a,b"]
        )


def test_cli_compact_and_vacuum(spark, tmp_path, capsys):
    raw = str(tmp_path / "raw")
    cli.main(["write", raw, "2000", "5"])
    capsys.readouterr()
    idx = str(tmp_path / "idx")
    cli.main(["index", "build", raw, idx])
    capsys.readouterr()
    cli.main(
        ["compact", raw, idx, "--cols", "id,value", "--max-files", "64",
         "--vacuum"]
    )
    out = json.loads(capsys.readouterr().out)
    assert out["rewritten"] >= 0 and out["vacuumed"] == 0
    assert spark.read.parquet(raw).count() == 2000


def test_cli_bloom_build_update_and_plan(spark, tmp_path, capsys):
    raw = str(tmp_path / "raw")
    cli.main(["write", raw, "2000", "9"])
    capsys.readouterr()
    idx = str(tmp_path / "idx")
    blm = str(tmp_path / "blm")
    cli.main(["index", "build", raw, idx])
    capsys.readouterr()
    cli.main(["index", "build-bloom", raw, blm, "--columns", "id"])
    assert json.loads(capsys.readouterr().out)["bloom_rows"] >= 1
    cli.main(
        ["index", "plan", raw, idx, "--predicate", "id eq 7", "--bloom", blm]
    )
    plan = json.loads(capsys.readouterr().out)
    assert plan["files_kept"] < plan["files_total"]
    cli.main(["index", "update-bloom", raw, blm])
    assert json.loads(capsys.readouterr().out) == {"added": 0, "removed": 0}


def test_cli_delete_and_fold(spark, tmp_path, capsys):
    raw = str(tmp_path / "raw")
    cli.main(["write", raw, "1000", "11"])
    capsys.readouterr()
    idx = str(tmp_path / "idx")
    dv = str(tmp_path / "dv")
    cli.main(["index", "build", raw, idx])
    capsys.readouterr()
    total = spark.read.parquet(raw).count()
    doomed = spark.read.parquet(raw).filter("value > 8000").count()
    assert 0 < doomed < total
    cli.main(["delete", raw, dv, "--where", "value > 8000"])
    assert json.loads(capsys.readouterr().out)["tombstones_added"] == doomed
    cli.main(["delete", raw, dv, "--compact", "--index", idx, "--vacuum"])
    out = json.loads(capsys.readouterr().out)
    assert out["tombstones_cleared"] == doomed
    assert out["vacuumed"] >= 1  # folded originals reclaimed
    assert spark.read.parquet(raw).count() == total - doomed


def test_cli_upsert(spark, tmp_path, capsys):
    raw = str(tmp_path / "raw")
    cli.main(["write", raw, "1000", "13"])
    capsys.readouterr()
    idx = str(tmp_path / "idx")
    cli.main(["index", "build", raw, idx])
    capsys.readouterr()
    from pyspark.sql import functions as F

    src_dir = str(tmp_path / "src")
    spark.read.parquet(raw).limit(5).withColumn(
        "value", F.lit(99999).cast("long")
    ).write.parquet(src_dir)
    cli.main(["upsert", raw, idx, src_dir, "--key", "id"])
    out = json.loads(capsys.readouterr().out)
    assert out["new_files"] >= 1 and out["version"] == 2
    # merged originals persist until vacuum (grace period); history
    # shows both versions, vacuum reclaims, plain reads exact again
    cli.main(["history", idx])
    hist = json.loads(capsys.readouterr().out)
    assert hist["current"] == 2 and len(hist["versions"]) == 2
    cli.main(["vacuum", raw, idx])
    vac = json.loads(capsys.readouterr().out)
    assert vac["removed"] >= 1
    assert spark.read.parquet(raw).filter("value = 99999").count() == 5
    assert spark.read.parquet(raw).count() == 1000


def test_cli_evolve_lifecycle(spark, tmp_path, capsys):
    raw = str(tmp_path / "raw")
    idx = str(tmp_path / "idx")
    cli.main(["write", raw, "500", "17"])
    capsys.readouterr()
    cli.main(["index", "build", raw, idx])
    capsys.readouterr()
    cli.main(["evolve", "add", raw, idx, "--column", "score",
              "--type", "double", "--default", "1.5"])
    spec = json.loads(capsys.readouterr().out)
    assert spec["columns"][-1] == {
        "name": "score", "type": "double", "default": 1.5, "sources": [],
    }
    cli.main(["evolve", "rename", raw, idx, "--column", "region", "--to", "zone"])
    spec = json.loads(capsys.readouterr().out)
    assert any(
        c["name"] == "zone" and c["sources"] == ["region"]
        for c in spec["columns"]
    )
    from columnar_analytics_engine_spark.evolution import read_evolved

    got = read_evolved(spark, raw, idx)
    assert "zone" in got.columns and "region" not in got.columns
    assert got.filter("score = 1.5").count() == 500
    cli.main(["evolve", "drop", raw, idx, "--column", "status"])
    capsys.readouterr()
    cli.main(["evolve", "show", raw, idx])
    spec = json.loads(capsys.readouterr().out)
    assert "status" not in [c["name"] for c in spec["columns"]]


def test_cli_catalog_pin_and_snapshot(spark, tmp_path, capsys):
    raw = str(tmp_path / "raw")
    idx = str(tmp_path / "idx")
    cat = str(tmp_path / "cat.json")
    cli.main(["write", raw, "400", "19"])
    capsys.readouterr()
    cli.main(["index", "build", raw, idx])
    capsys.readouterr()
    cli.main(["catalog", "pin", cat, "--table", "t", "--data", raw,
              "--index", idx])
    pinned = json.loads(capsys.readouterr().out)
    assert pinned["version"] == 1
    cli.main(["catalog", "show", cat])
    shown = json.loads(capsys.readouterr().out)
    assert shown["tables"]["t"]["version"] == 1
    cli.main(["catalog", "snapshot", cat, "--table", "t"])
    snap = json.loads(capsys.readouterr().out)
    assert snap["rows"] == 400


def test_cli_changes_and_cohort_report(spark, tmp_path, capsys):
    """changes: keyed CDF between versions via the CLI;
    cluster-report --cohorts: per-spec-cohort depth after a spec
    switch."""
    from pyspark.sql import functions as F

    from columnar_analytics_engine_spark.clusterspec import set_cluster_spec
    from columnar_analytics_engine_spark.io import write_sorted
    from columnar_analytics_engine_spark.layout import (
        cluster_compact,
        merge_upsert_files,
    )
    from columnar_analytics_engine_spark.skipping import build_stats_index

    data = str(tmp_path / "data")
    idx = str(tmp_path / "idx")
    df = spark.range(2000).select(
        F.col("id"), (F.col("id") % 50).alias("grp"),
        (F.col("id") * 2.0).alias("val"),
    )
    write_sorted(df, data, ["grp"], n_files=6)
    build_stats_index(spark, data, idx)
    upd = df.filter(F.col("id") < 100).withColumn("val", F.col("val") + 1.0)
    merge_upsert_files(spark, data, idx, upd, "id")

    cli.main(["changes", data, idx, "--from-version", "1", "--limit", "5"])
    lines = capsys.readouterr().out.strip().splitlines()
    summary = json.loads(lines[-1])
    assert summary["from_version"] == 1 and summary["to_version"] == 2
    assert summary["files_added"] >= 1 and summary["files_removed"] >= 1
    assert summary["change_rows_shown"] == 5
    row = json.loads(lines[0])
    assert "_change_type" in row and "_change_count" in row

    set_cluster_spec(idx, ["grp"], since_version=0)
    set_cluster_spec(idx, ["id"])
    # append two id-overlapping files so convergence has candidates
    from columnar_analytics_engine_spark.skipping import update_stats_index

    slab = spark.range(2000, 2400).select(
        F.col("id"), (F.col("id") % 50).alias("grp"),
        (F.col("id") * 2.0).alias("val"),
    )
    slab.repartition(2).write.mode("append").parquet(data)
    update_stats_index(spark, data, idx)
    cluster_compact(spark, data, idx, max_files=6, target_file_bytes=4 * 1024)
    cli.main(["cluster-report", idx, "--cohorts"])
    rows = json.loads(capsys.readouterr().out)
    specs = {r["spec_idx"] for r in rows}
    assert 0 in specs and 1 in specs
    for r in rows:
        assert r["avg_depth"] >= 1.0
        assert r["spec_cols"] in ("grp", "id")


def test_cli_branch_clone_and_merge_back(spark, tmp_path, capsys):
    from pyspark.sql import functions as F

    from columnar_analytics_engine_spark.io import write_sorted
    from columnar_analytics_engine_spark.layout import merge_upsert_files
    from columnar_analytics_engine_spark.skipping import (
        build_stats_index,
        read_indexed,
    )

    data = str(tmp_path / "data")
    idx = str(tmp_path / "idx")
    br = str(tmp_path / "branch")
    df = spark.range(1000).select(
        F.col("id"), (F.col("id") * 3.0).alias("val")
    )
    write_sorted(df, data, ["id"], n_files=4)
    build_stats_index(spark, data, idx)

    cli.main(["branch", "clone", idx, br])
    out = json.loads(capsys.readouterr().out)
    assert out == {"branch": br, "version": 1}

    cli.main(["branch", "family", idx])
    fam = json.loads(capsys.readouterr().out)
    assert br in fam and idx in [f for f in fam]

    upd = df.filter(F.col("id") < 20).withColumn("val", F.lit(-1.0))
    merge_upsert_files(spark, data, br, upd, "id")
    cli.main(["branch", "merge-back", idx, br, "--data", data, "--key", "id"])
    out = json.loads(capsys.readouterr().out)
    assert out["upserted"] == 20 and out["deleted"] == 0
    got = read_indexed(spark, data, idx)
    assert got.filter((F.col("id") < 20) & (F.col("val") != -1.0)).count() == 0


def test_cli_branch_health_and_as_of_ts(spark, tmp_path, capsys):
    """Round 14: `branch health` reports feed-derived divergence and
    conflicts; `query --as-of-ts` reads the snapshot at an instant;
    `history` round-trips the instants it reports (version_at of each
    published_at resolves back to that version or a later republish)."""
    import time

    from pyspark.sql import functions as F

    from columnar_analytics_engine_spark.io import write_sorted
    from columnar_analytics_engine_spark.layout import merge_upsert_files
    from columnar_analytics_engine_spark.manifest import version_at
    from columnar_analytics_engine_spark.skipping import build_stats_index

    data = str(tmp_path / "data")
    idx = str(tmp_path / "idx")
    br = str(tmp_path / "branch")
    df = spark.range(1000).select(
        F.col("id"), (F.col("id") * 3.0).alias("val")
    )
    write_sorted(df, data, ["id"], n_files=4)
    build_stats_index(spark, data, idx)
    time.sleep(0.05)
    t_mid = time.time()
    time.sleep(0.05)
    cli.main(["branch", "clone", idx, br])
    capsys.readouterr()
    upd_src = df.filter(F.col("id") < 30).withColumn("val", F.lit(-1.0))
    merge_upsert_files(spark, data, idx, upd_src, "id")
    upd_br = df.filter(F.col("id") >= 990).withColumn("val", F.lit(-2.0))
    merge_upsert_files(spark, data, br, upd_br, "id")

    cli.main(["branch", "health", idx, "--data", data, "--key", "id"])
    health = json.loads(capsys.readouterr().out)
    assert len(health) == 1
    assert health[0]["updates"] == 10
    assert health[0]["src_changed_keys"] == 30
    assert health[0]["conflict_keys"] == 0

    # TIMESTAMP AS OF through the CLI query surface
    cli.main([
        "query", data, "--index", idx, "--as-of-ts", str(t_mid),
        "--agg", "SUM,val",
    ])
    out_ts = capsys.readouterr().out
    cli.main(["query", data, "--index", idx, "--agg", "SUM,val"])
    out_now = capsys.readouterr().out
    base_sum = sum(i * 3.0 for i in range(1000))
    now_sum = base_sum - sum(i * 3.0 for i in range(30)) + 30 * -1.0
    assert str(base_sum) in out_ts
    assert str(now_sum) in out_now

    # history round-trips its instants
    cli.main(["history", idx])
    hist = json.loads(capsys.readouterr().out)
    for v in hist["versions"]:
        if v["published_at"] is not None:
            assert version_at(idx, v["published_at"]) >= v["version"]
