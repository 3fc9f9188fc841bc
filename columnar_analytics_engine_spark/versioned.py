"""Versioned Parquet tables: snapshot writes, as-of reads, history,
retention, and row-level diffs — the lakehouse time-travel primitives on
plain Parquet (this image has no Delta/Iceberg; the layout IS the
public table-format recipe: one immutable directory per version,
``_SUCCESS`` as the atomic publish marker, exactly the convention the
record-archive streaming source relies on for exactly-once pickup).

Layout:  ``{table}/v=N/part-*.parquet`` + ``_SUCCESS``

* a version is visible only after its ``_SUCCESS`` exists (Spark writes
  it last), so readers never see a half-written snapshot;
* versions are immutable — a new write always allocates ``max+1``;
* retention (``vacuum``) deletes whole version directories, never files
  inside one.

Relationship to the round-12 manifest tier (``manifest.py``): this
module snapshots WHOLE datasets (each version a full copy — right for
nightly deliverables and diff feeds); the manifest tier versions the
FILE LIST of one live table (copy-free — right for in-place
maintenance: compaction, deletes, MERGE, schema evolution).  For
time travel over a maintained table use
``skipping.read_indexed(as_of=N)``; use this module when each version
must be an independently shippable dataset.

At 100 TB this is the nightly-snapshot pattern: each version is a
complete partitioned dataset, ``diff_versions`` (one full-outer key
join, bucketed storage makes it shuffle-free) feeds incremental
downstream rebuilds, and ``vacuum(keep_last=k)`` bounds storage.

Deployment constraint: the version-directory bookkeeping
(``list_versions`` / ``vacuum`` / ``table_history``) walks the table
path with driver-local ``os``/``shutil``, so ``table_path`` must be a
POSIX filesystem visible from the driver (local disk, NFS, or an
object store mounted via FUSE/NFS gateway).  For a native object-store
deployment (s3a/abfss/gs), route these directory ops through the
Hadoop ``FileSystem`` API (``spark._jvm.org.apache.hadoop.fs``) —
the data reads/writes themselves already go through Spark and work on
any supported filesystem.
"""

from __future__ import annotations

import os
import re
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_V_RE = re.compile(r"^v=(\d+)$")


def _version_dir(table_path: str, version: int) -> str:
    return os.path.join(table_path, f"v={version}")


def list_versions(table_path: str) -> list[int]:
    """Committed versions (ascending): directories whose ``_SUCCESS``
    marker exists.  A crashed write leaves no marker and is invisible."""
    if not os.path.isdir(table_path):
        return []
    out = []
    for name in os.listdir(table_path):
        m = _V_RE.match(name)
        if m and os.path.exists(os.path.join(table_path, name, "_SUCCESS")):
            out.append(int(m.group(1)))
    return sorted(out)


def write_version(df: DataFrame, table_path: str, version: int | None = None) -> int:
    """Write ``df`` as the next (or given) snapshot version; returns the
    version number.  Versions are immutable: writing an existing one
    raises rather than silently rewriting history."""
    versions = list_versions(table_path)
    if version is None:
        version = (versions[-1] + 1) if versions else 0
    elif version in versions:
        raise ValueError(
            f"version {version} of {table_path} already committed; "
            "versions are immutable — write a new one"
        )
    df.write.mode("error").parquet(_version_dir(table_path, version))
    return version


def read_version(
    spark: SparkSession, table_path: str, version: int | None = None
) -> DataFrame:
    """Read a snapshot: the latest committed version by default, or an
    as-of ``version``.  Raises on unknown/vacuumed versions."""
    versions = list_versions(table_path)
    if not versions:
        raise FileNotFoundError(f"no committed versions under {table_path}")
    if version is None:
        version = versions[-1]
    elif version not in versions:
        raise FileNotFoundError(
            f"version {version} of {table_path} not committed (have {versions})"
        )
    return spark.read.parquet(_version_dir(table_path, version))


def table_history(spark: SparkSession, table_path: str) -> DataFrame:
    """One row per committed version: file count and on-disk bytes —
    the ``DESCRIBE HISTORY`` twin (driver-side directory metadata, no
    data scan)."""
    rows = []
    for v in list_versions(table_path):
        d = _version_dir(table_path, v)
        files = [
            f for f in os.listdir(d)
            if f.endswith(".parquet") and not f.startswith(("_", "."))
        ]
        n_bytes = sum(os.path.getsize(os.path.join(d, f)) for f in files)
        rows.append((v, len(files), n_bytes))
    return spark.createDataFrame(
        rows, "version long, n_files long, n_bytes long"
    )


def vacuum(table_path: str, keep_last: int = 1) -> list[int]:
    """Delete all but the newest ``keep_last`` versions; returns the
    versions removed.  Whole-directory removal only — never files
    inside a committed version."""
    if keep_last < 1:
        raise ValueError("keep_last must be >= 1 (cannot vacuum the head)")
    versions = list_versions(table_path)
    doomed = versions[:-keep_last] if len(versions) > keep_last else []
    for v in doomed:
        shutil.rmtree(_version_dir(table_path, v))
    return doomed


def _contains_map(dt) -> bool:
    """True if ``dt`` is or transitively contains a MapType — maps can
    hide inside struct fields and array/map element types, and a nested
    map breaks the digest exactly like a top-level one."""
    name = dt.typeName()
    if name == "map":
        return True
    if name == "struct":
        return any(_contains_map(f.dataType) for f in dt.fields)
    if name == "array":
        return _contains_map(dt.elementType)
    return False


def _row_digest(df: DataFrame, key: str):
    """Deterministic digest of every non-key column (NAME-ordered JSON
    encoding → md5); NULL-safe and engine-stable for same column SET,
    so a cross-version column reorder does not mark every row changed.
    Columns containing a map type ANYWHERE in their schema (top-level,
    inside a struct, inside an array) are unsupported in
    ``diff_versions``: ``to_json`` serializes map entries in
    engine-internal order, so equal maps can digest differently."""
    cols = sorted(c for c in df.columns if c != key)
    for f in df.schema.fields:
        if f.name in cols and _contains_map(f.dataType):
            raise ValueError(
                f"diff_versions does not support map-typed (or map-nested) "
                f"column {f.name!r} (to_json map entry order is "
                "engine-internal); cast to array_sort(map_entries(...)) first"
            )
    return F.md5(F.to_json(F.struct(*[F.col(c) for c in cols])))


def diff_versions(
    spark: SparkSession,
    table_path: str,
    from_version: int,
    to_version: int,
    key: str,
) -> DataFrame:
    """Row-level delta between two snapshots keyed on ``key``:
    (key, change_type ∈ added|removed|changed).  One full-outer join on
    the key; change detection compares a single md5 row digest, so the
    shuffle carries 32 bytes per row instead of the full width — the
    scale trick that makes a 100 TB nightly diff key-bounded.
    """
    a = read_version(spark, table_path, from_version)
    b = read_version(spark, table_path, to_version)
    left = a.select(F.col(key), _row_digest(a, key).alias("_da"))
    right = b.select(F.col(key), _row_digest(b, key).alias("_db"))
    j = left.join(right, key, "full_outer")
    return j.select(
        key,
        F.when(F.col("_da").isNull(), F.lit("added"))
        .when(F.col("_db").isNull(), F.lit("removed"))
        .when(F.col("_da") != F.col("_db"), F.lit("changed"))
        .alias("change_type"),
    ).filter(F.col("change_type").isNotNull())
