"""Churn-aware driver-window rotation support.

The driver verifies the FIRST 50 keys of ``all_queries()`` each round,
so key order decides what gets re-checked.  Pure round-staleness ranking
has a blind spot (VERDICT r7): a query whose implementation was
REWRITTEN after its last green round keeps a green-looking driver row
while running unverified code.  This module fingerprints each query's
implementation so rotation can put changed-since-green queries ahead of
merely-stale ones.

Mechanism: ``source_fingerprint`` hashes the query fn's source, its
oracle SQL, and (transitively) the source of every package function it
references — via globals for top-level imports and via a regex over
``from columnar_analytics_engine_spark... import`` lines for the
function-local import pattern the query modules use.  A fingerprint
snapshot per round lives in ``QUERY_HASHES.json`` (written by
``scripts/update_query_hashes.py`` before each round's driver run);
"churned" means the current fingerprint differs from the snapshot taken
the round the driver last verified the query.
"""

from __future__ import annotations

import functools
import hashlib
import inspect
import json
import os
import re

_PKG = "columnar_analytics_engine_spark"
_LOCAL_IMPORT_RE = re.compile(
    rf"from\s+({_PKG}[\w.]*)\s+import\s+\(?([\w,\s]+?)\)?\s*(?:#.*)?$",
    re.MULTILINE,
)

# Queries whose implementation changed after their last driver-green
# round but BEFORE fingerprint snapshots existed (no QUERY_HASHES.json
# entry for those rounds, so churn can't be computed).  Round-10
# status: EMPTY — every previous entry re-greened in the snapshotted
# round 9 (CORRECTNESS_r09 + QUERY_HASHES.json rounds.9), so churn is
# now computed from fingerprints for all of them.  Add names here only
# when a query's last green round again predates its newest rewrite
# AND that round has no snapshot.
FORCE_REVERIFY_PRE_SNAPSHOT: frozenset[str] = frozenset()


def _closure_sources(fn) -> list[str]:
    """Source text of ``fn`` and every package callable it transitively
    references — the material ``source_fingerprint`` hashes."""
    seen: set[int] = set()
    parts: list[str] = []

    def visit(obj) -> None:
        if id(obj) in seen:
            return
        seen.add(id(obj))
        try:
            src = inspect.getsource(obj)
        except (OSError, TypeError):
            return
        parts.append(src)
        code = getattr(obj, "__code__", None)
        g = getattr(obj, "__globals__", {})
        if code is not None:
            import types

            for name in code.co_names:
                ref = g.get(name)
                if callable(ref) and (getattr(ref, "__module__", "") or "").startswith(_PKG):
                    visit(ref)
                elif isinstance(ref, types.ModuleType) and ref.__name__.startswith(_PKG):
                    # module-attribute calls (``D.jaccard_pairs(...)``):
                    # co_names holds both the module alias and the
                    # attribute names, so probe every co_name against
                    # the module — over-approximate but deterministic,
                    # and a superset only strengthens the fingerprint
                    for attr in code.co_names:
                        sub = getattr(ref, attr, None)
                        if callable(sub) and (
                            getattr(sub, "__module__", "") or ""
                        ).startswith(_PKG):
                            visit(sub)
        for m in _LOCAL_IMPORT_RE.finditer(src):
            try:
                import importlib

                mod = importlib.import_module(m.group(1))
            except ImportError:
                continue
            for nm in m.group(2).split(","):
                ref = getattr(mod, nm.strip(), None)
                if callable(ref):
                    visit(ref)

    visit(fn)
    return parts


def source_fingerprint(fn, sql: str | None) -> str:
    """Stable 16-hex digest of a query's implementation closure.

    Walks from ``fn`` through every callable it references that lives in
    this package (module-global references and module-attribute calls
    via ``__code__.co_names``, function-local ``from pkg.x import y``
    imports via source regex) and hashes the concatenated sources plus
    the oracle SQL.  Renames, reformatting, and helper-function edits
    all change the digest; a testdata or artifact change does not.
    """
    material = [sql or ""] + _closure_sources(fn)
    return hashlib.sha256("\n".join(material).encode()).hexdigest()[:16]


def _repo_root() -> str:
    return os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@functools.lru_cache(maxsize=1)
def load_snapshots() -> dict[str, dict[str, str]]:
    """round (as str) -> {query name -> fingerprint} from QUERY_HASHES.json."""
    path = os.path.join(_repo_root(), "QUERY_HASHES.json")
    try:
        with open(path) as f:
            data = json.load(f)
    except (OSError, ValueError):
        return {}
    rounds = data.get("rounds", {})
    return rounds if isinstance(rounds, dict) else {}


_churn_cache: dict[tuple[str, int], bool] = {}


def is_churned(name: str, spec, last_green_round: int) -> bool:
    """True when ``name``'s implementation changed since the round the
    driver last verified it (or that round predates snapshots and the
    query is on the manual pre-snapshot list).  Memoized per process —
    source files don't change under a running session, and the sweep
    calls ``all_queries()`` hundreds of times."""
    key = (name, last_green_round)
    if key not in _churn_cache:
        snap = load_snapshots().get(str(last_green_round))
        if snap is None:
            _churn_cache[key] = name in FORCE_REVERIFY_PRE_SNAPSHOT
        else:
            recorded = snap.get(name)
            _churn_cache[key] = recorded is None or recorded != source_fingerprint(
                spec.fn, spec.sql
            )
    return _churn_cache[key]
