"""Generation-versioned publish for INDEX ARTIFACTS (persisted
MinHash band tables, streaming state tables) — the concurrency story
``manifest.py`` gives data tables, applied to the auxiliary parquet
directories that are not row-level manifests.

Round 12's table tier publishes every maintenance rewrite as an
immutable manifest version behind an atomic pointer, but the artifact
compactors (``queries/llm.py compact_minhash_index``,
``streaming/maintenance.py compact_batch_partitions``) still swapped
directories in place (``rename src→old; rename tmp→src; rmtree old``):
a reader that planned before the swap — or that landed in the
no-directory window between the two renames — failed, and the
immediate ``rmtree`` pulled files out from under any in-flight scan.
Same hazard class the manifest tier just eliminated.

This module is the same discipline with SIBLING generation
directories (the artifact itself stays a plain parquet dataset a
``spark.read.parquet`` can always scan — generations must not nest
inside it, or partition discovery would trip over them):

* Layout for an artifact at ``P`` (e.g. ``.../bands.parquet``):
  the original flat directory is generation 0; compactions publish
  sibling dirs ``P.gen-00000001/``, ``P.gen-00000002/``, …; the text
  pointer file ``P._GEN`` names the published generation and is
  swapped with ``os.replace`` (atomic).  No pointer → generation 0
  (the flat dir) — every pre-existing artifact keeps working
  unchanged.
* Readers resolve once at plan time (:func:`resolve_artifact`) and
  scan a directory no writer will ever mutate or delete out from
  under them, until an explicit :func:`vacuum_generations` past the
  retention window — exactly the manifest tier's contract.
* Generation numbers are claimed with an atomic ``os.mkdir`` (two
  racing compactors cannot interleave files into one directory); the
  pointer flip serializes under ``manifest.mkdir_lock``.
* A crash mid-build strands an unpublished ``P.gen-N`` sibling —
  vacuum-able garbage, never a half-swapped artifact.

Writer concurrency is unchanged: appends land in the CURRENT
generation, so a compactor racing an appender can still lose the
append to the flip (documented single-maintenance-owner discipline,
same as before).  What this module fixes is the READER hazard — plan
against generation N, survive a concurrent compaction to N+1.
"""

from __future__ import annotations

import os
import re
import shutil

from columnar_analytics_engine_spark.manifest import mkdir_lock

_GEN_RE = re.compile(r"\.gen-(\d{8})$")
_POINTER = "._GEN"


def _gen_dir(path: str, gen: int) -> str:
    return f"{path.rstrip('/')}.gen-{gen:08d}"


def _pointer_path(path: str) -> str:
    return f"{path.rstrip('/')}{_POINTER}"


def list_generations(path: str) -> list[int]:
    """All staged generations on disk (published or not), ascending.
    Generation 0 (the flat original dir) is listed when it exists."""
    parent = os.path.dirname(path.rstrip("/")) or "."
    base = os.path.basename(path.rstrip("/"))
    out = []
    if os.path.isdir(path):
        out.append(0)
    if os.path.isdir(parent):
        for name in os.listdir(parent):
            m = _GEN_RE.search(name)
            if (
                m
                and name == f"{base}.gen-{int(m.group(1)):08d}"
                and os.path.isdir(os.path.join(parent, name))
            ):
                out.append(int(m.group(1)))
    return sorted(out)


def current_generation(path: str) -> int:
    """The published generation (0 when no pointer exists — the flat
    original directory)."""
    try:
        with open(_pointer_path(path)) as fh:
            return int(fh.read().strip())
    except (FileNotFoundError, ValueError):
        return 0


def resolve_artifact(path: str) -> str:
    """The directory a reader should scan: the published generation's
    sibling dir, or ``path`` itself for a never-compacted artifact.
    Resolve ONCE at plan time — the resolved dir is immutable until
    vacuum expires it."""
    gen = current_generation(path)
    return path if gen == 0 else _gen_dir(path, gen)


def publish_generation(path: str, build) -> int:
    """Publish the next generation of the artifact at ``path``:
    allocate a fresh sibling dir with an atomic ``os.mkdir``, let
    ``build(gen_dir)`` fill it (Spark writers should use
    ``mode="append"`` — an overwrite would delete-and-recreate the
    claimed dir, reopening the allocation race), then flip the pointer
    under the publish lock.  Prior generations stay intact for
    in-flight readers until :func:`vacuum_generations`.

    The flip is MONOTONIC (mirrors ``manifest.publish_version(
    monotonic=True)``): when two racing compactors claim generations
    N+1 and N+2 and N+1's build finishes LAST, flipping to N+1 would
    park the pointer on the older generation and leave the newer one
    above it for ``vacuum_generations`` to silently reclaim — so a
    flip that would move the pointer backwards (or nowhere) is skipped.
    Returns the built generation number either way; the caller can
    compare against :func:`current_generation` when it needs to know
    whether its build is the published one."""
    gens = list_generations(path)
    gen = (gens[-1] if gens else 0) + 1
    while True:
        try:
            os.mkdir(_gen_dir(path, gen))
            break
        except FileExistsError:
            gen += 1
    build(_gen_dir(path, gen))
    lock = f"{path.rstrip('/')}.lock"
    with mkdir_lock(lock):
        if gen <= current_generation(path):
            return gen  # a newer generation already published — keep it
        tmp = f"{_pointer_path(path)}.tmp-{os.getpid()}"
        with open(tmp, "w") as fh:
            fh.write(f"{gen}\n")
        os.replace(tmp, _pointer_path(path))
    return gen


def vacuum_generations(
    path: str,
    keep_last: int = 2,
    orphan_grace_sec: float | None = None,
) -> list[str]:
    """Reclaim generation dirs beyond the newest ``keep_last`` at or
    below the published one — never the current generation.
    UNPUBLISHED generations above the pointer are reclaimed only once
    older than the in-flight grace window (a young one is most likely
    a concurrent build between claim and flip; an old one is a crashed
    build).  Generation 0 (the flat original dir) is emptied of
    parquet files rather than removed, so the artifact path itself —
    which cache-existence checks key on — survives.  Run it on the
    maintenance owner's schedule, after the longest query expected to
    overlap a compaction (the manifest tier's retention contract).
    Returns the reclaimed paths."""
    import time

    from columnar_analytics_engine_spark.manifest import ORPHAN_GRACE_SEC

    grace = ORPHAN_GRACE_SEC if orphan_grace_sec is None else orphan_grace_sec
    cur = current_generation(path)
    if cur == 0:
        return []  # nothing ever published: the flat dir is the artifact
    gens = list_generations(path)
    retained = set([g for g in gens if g <= cur][-max(1, keep_last):])
    retained.add(cur)
    reclaimed = []
    now = time.time()
    for g in gens:
        if g in retained:
            continue
        if g > cur:
            try:
                if now - os.stat(_gen_dir(path, g)).st_mtime < grace:
                    continue  # presumed in-flight build
            except FileNotFoundError:
                continue
        if g == 0:
            # keep the flat dir (cache keys check its existence); drop
            # its now-superseded data files
            for root, _d, files in os.walk(path):
                for f in files:
                    if f.endswith(".parquet"):
                        os.remove(os.path.join(root, f))
                        reclaimed.append(os.path.join(root, f))
        else:
            d = _gen_dir(path, g)
            shutil.rmtree(d, ignore_errors=True)
            reclaimed.append(d)
    return reclaimed
