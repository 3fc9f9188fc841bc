"""Multi-table atomic transactions: one catalog pointer over versioned
manifests.

Single-table maintenance publishes with one atomic pointer flip
(``manifest.write_manifest``).  When one logical change must move TWO
tables together — an orders + lineitem ingest pair, a fact table and
its rollup — flipping two ``_CURRENT`` pointers is not atomic: a crash
between the flips publishes one table's new state without the other's,
and a reader joining the pair sees a mixed snapshot.  The table-format
answer (Delta's commit marker, Iceberg's atomic catalog swap) is a
single CATALOG pointer above the per-table manifests:

1. STAGE each table's next manifest version unpublished
   (``layout.merge_upsert_files(..., publish=False)``,
   ``layout.publish_rewrite(..., publish=False)`` — the version dir
   exists, no per-table pointer moves);
2. COMMIT one catalog file with ``os.replace`` — the single
   indivisible step that pins every table to its new version;
3. readers resolve versions THROUGH the catalog
   (:func:`snapshot_table`) and therefore see either all-old or
   all-new, never a mix.

A crash before step 2 leaves the catalog (and every per-table
``_CURRENT``) on the old versions; the stranded staged version dirs
are expired by ``manifest.expire_versions`` / ``layout
.vacuum_unindexed`` like any other crashed-maintenance garbage.  After
a commit, :func:`commit` also rolls each table's ``_CURRENT`` forward
(convergence for single-table readers); that step is not atomic across
tables, but the catalog is the transactional source of truth.

The catalog is a small JSON file — at 100 TB the commit object is
metadata-scale (bytes per table), exactly like a Delta log entry, and
the ``os.replace`` contract maps to the conditional-put every object
store offers.
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession


def read_catalog(catalog_path: str) -> dict:
    """The committed catalog: ``{"tables": {name: {"data": path,
    "index": path, "version": N}}}`` (empty when no commit exists)."""
    try:
        with open(catalog_path) as fh:
            return json.load(fh)
    except FileNotFoundError:
        return {"tables": {}}


def commit(catalog_path: str, tables: dict[str, dict]) -> dict:
    """Atomically publish a new catalog state: the current catalog with
    ``tables`` entries replaced/added (each ``{"data": ..., "index":
    ..., "version": N}``), written via tmp-file + ``os.replace`` — ONE
    indivisible step for any number of tables.  Validates every pinned
    version is staged before committing.  After the commit, each
    table's own ``_CURRENT`` rolls forward too (so single-table,
    non-catalog readers converge); the catalog remains authoritative.
    Returns the committed catalog dict.

    Concurrency: the read-merge-write runs under a catalog lock
    (``manifest.mkdir_lock``), so two racing commits — even to
    disjoint table sets — serialize instead of the later ``os.replace``
    silently dropping the earlier commit's entries.  Each commit
    appends a record to the catalog's ``history`` with a strictly
    increasing ``seq``, making the commit order inspectable (and
    testable) as a linear log.  The convergence pointer roll is
    monotonic-under-lock (``publish_version(monotonic=True)``), so
    interleaved commits can never move a table's ``_CURRENT``
    backwards."""
    from columnar_analytics_engine_spark.manifest import (
        list_versions,
        mkdir_lock,
        publish_version,
    )

    for name, entry in tables.items():
        if entry["version"] not in list_versions(entry["index"]):
            raise FileNotFoundError(
                f"cannot commit {name}: version {entry['version']} is not "
                f"staged at {entry['index']}"
            )
    with mkdir_lock(f"{catalog_path}.lock"):
        cat = read_catalog(catalog_path)
        cat.setdefault("tables", {}).update(
            {name: dict(entry) for name, entry in tables.items()}
        )
        seq = int(cat.get("seq", 0)) + 1
        cat["seq"] = seq
        cat.setdefault("history", []).append(
            {
                "seq": seq,
                "tables": {
                    name: entry["version"] for name, entry in tables.items()
                },
            }
        )
        tmp = f"{catalog_path}.tmp-{uuid.uuid4().hex[:8]}"
        with open(tmp, "w") as fh:
            json.dump(cat, fh, indent=2, sort_keys=True)
        os.replace(tmp, catalog_path)
    # convergence: roll per-table pointers forward (monotonic only)
    for entry in tables.values():
        publish_version(entry["index"], entry["version"], monotonic=True)
    return cat


def pinned_versions(catalog_path: str, index_path: str) -> tuple[int, ...]:
    """Every version the committed catalog pins for tables whose index
    lives at ``index_path`` — pass to
    ``layout.vacuum_unindexed(protect_versions=...)`` so retention
    cannot destroy a snapshot a committed catalog still references."""
    import os as _os

    norm = _os.path.normpath(index_path)
    return tuple(
        sorted(
            e["version"]
            for e in read_catalog(catalog_path)["tables"].values()
            if _os.path.normpath(e["index"]) == norm
        )
    )


def snapshot_table(
    spark: SparkSession,
    catalog_path: str,
    name: str,
    predicate: str | None = None,
    bloom_path: str | None = None,
) -> DataFrame:
    """Read table ``name`` at the version the committed catalog pins —
    the multi-table-consistent read path.  Joins between
    ``snapshot_table`` frames of one catalog state are snapshot-
    consistent by construction.  ``predicate`` prunes the pinned
    version's file manifest through the stats index
    (``skipping.read_skipping(as_of=...)``) — snapshot isolation and
    file skipping compose."""
    from columnar_analytics_engine_spark.skipping import (
        read_indexed,
        read_skipping,
    )

    entry = read_catalog(catalog_path)["tables"].get(name)
    if entry is None:
        raise KeyError(f"table {name!r} not in catalog {catalog_path}")
    if predicate is not None:
        return read_skipping(
            spark, entry["data"], entry["index"], predicate,
            bloom_path=bloom_path, as_of=entry["version"],
        )
    return read_indexed(
        spark, entry["data"], entry["index"], as_of=entry["version"]
    )
