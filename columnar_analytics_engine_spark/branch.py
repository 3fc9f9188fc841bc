"""Zero-copy table branches: clone a manifest snapshot, diverge, and
vacuum without destroying either branch.

A manifest version IS the table (an immutable file list behind a
pointer — ``manifest.py``), so "copy the table" needs no data I/O:
:func:`clone_table` writes the source's current (or ``as_of``)
manifest as version 1 of a NEW index, and the clone is immediately a
first-class table over the SAME parquet files — readable through every
index-planned surface, writable through every maintenance op
(``merge_upsert_files``, ``cluster_compact``, deletes, evolution), and
snapshot-isolated from the source: each branch's writes publish new
files under its own manifest, and rewrites never mutate shared bytes
(the publish discipline stages new files and only ever DROPS
references).  This is Delta's shallow clone / Iceberg's snapshot-ref
branching on plain Parquet — the primitive behind dev/test sandboxes
over a 100 TB production table (clone in milliseconds, experiment,
throw away) and write-audit-publish flows.

The one shared-storage hazard is RETENTION, same as Delta documents
for shallow clones: the source's ``vacuum_unindexed`` only knows the
source's retained versions, so it would happily delete files only a
branch still references (and a branch's vacuum, the source's).
``layout.vacuum_unindexed(extra_indexes=...)`` is the branch-aware
answer: every index over the directory joins the referenced-files
union — one listing, one plan, nothing a live branch references dies.
:func:`family_indexes` records the family in a ``_BRANCHES`` sidecar
at clone time so an operator can pass it without bookkeeping.

Schema/cluster-spec sidecars (``_SCHEMA``, ``_CLUSTER_SPEC``) are
copied at clone time: the branch starts with the source's logical
schema and layout spec and may evolve both independently afterward.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid

from pyspark.sql import SparkSession

_BRANCHES = "_BRANCHES"
_SIDE_FILES = ("_SCHEMA", "_CLUSTER_SPEC")


def _register_branch(src_index: str, dest_index: str) -> None:
    """Record ``dest_index`` in the source's branch registry (atomic
    read-modify-replace under the source's publish lock)."""
    from columnar_analytics_engine_spark.manifest import publish_lock

    reg = os.path.join(src_index, _BRANCHES)
    with publish_lock(src_index):
        try:
            with open(reg) as fh:
                entries = json.load(fh)
        except FileNotFoundError:
            entries = []
        dest = os.path.abspath(dest_index)
        if dest not in entries:
            entries.append(dest)
        tmp = f"{reg}.tmp-{uuid.uuid4().hex[:8]}"
        with open(tmp, "w") as fh:
            json.dump(entries, fh, indent=2)
        os.replace(tmp, reg)


def family_indexes(index_path: str) -> list[str]:
    """Every index known to share this table's data directory: this
    one plus the branches registered at clone time (absolute paths;
    vanished branch dirs are dropped).  Pass to
    ``vacuum_unindexed(extra_indexes=...)`` so retention is
    branch-aware."""
    reg = os.path.join(index_path, _BRANCHES)
    out = [os.path.abspath(index_path)]
    try:
        with open(reg) as fh:
            entries = json.load(fh)
    except FileNotFoundError:
        entries = []
    for e in entries:
        if os.path.isdir(e):
            out.append(e)
    return out


def clone_table(
    spark: SparkSession,
    src_index: str,
    dest_index: str,
    as_of: int | None = None,
) -> int:
    """Create a zero-copy branch: the source's current (or ``as_of``)
    manifest snapshot becomes version 1 of ``dest_index``.  No data
    file is read or written — the clone cost is one manifest row-set
    (metadata scale at any table size).  Returns the branch's version
    number (1).  The branch is registered in the source's
    ``_BRANCHES`` sidecar so :func:`family_indexes` can make vacuum
    branch-aware; schema and cluster-spec sidecars are copied so the
    branch starts from the source's logical state."""
    from columnar_analytics_engine_spark.manifest import (
        read_manifest,
        write_manifest,
    )

    if os.path.abspath(dest_index) == os.path.abspath(src_index):
        raise ValueError("clone destination must differ from the source")
    snapshot = read_manifest(spark, src_index, as_of=as_of)
    version = write_manifest(spark, dest_index, snapshot)
    for name in _SIDE_FILES:
        src_f = os.path.join(src_index, name)
        if os.path.exists(src_f):
            tmp = os.path.join(
                dest_index, f"{name}.tmp-{uuid.uuid4().hex[:8]}"
            )
            shutil.copyfile(src_f, tmp)
            os.replace(tmp, os.path.join(dest_index, name))
    _register_branch(src_index, dest_index)
    return version
