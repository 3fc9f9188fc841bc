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
# entry for those rounds, so churn can't be computed) — the commit
# fb08c85 plan rewrites plus this round's merge_upsert tiebreaker
# (VERDICT r7 "What's missing" item 1).  Drop entries as they re-green
# in a snapshotted round.
FORCE_REVERIFY_PRE_SNAPSHOT = frozenset({
    "tpch_q2_min_cost_supplier",
    "tpch_q11_important_stock",
    "tpch_q20_excess_suppliers",
    "events_merge_upsert",
    "pipeline_attrition_report",
    "customers_rfm_segments",
    "dedup_lsh_quality_report",
    "similarity_pq_codes",
    "similarity_pq_adc_topk",
    "similarity_ivfpq_topk",
    # round 8: signature persist added to the query plan after its r07
    # green row (bench cache-isolation work)
    "dedup_containment_lsh",
    # round 8: survivor-frame persist added after its r04 green row
    "pipeline_clean_corpus",
    # round 8: train-count + test-token persists added after its r07
    # green row (the three-consumer train pass now runs once)
    "classifier_nb_confusion",
    # round 8: duplicate-expensive-subtree sweep fixes (per-doc size /
    # model-count tables persisted; plans changed after last green)
    "dedup_jaccard_exact",
    "dedup_ngram_jaccard",
    "dedup_containment",
    "text_unigram_lm_quality",
    "text_bigram_lm_quality",
    # round 8 (late): multi-consumer frame persists added to the former
    # "deferred to round 9" duplicate-subtree tier after last green
    "market_basket_pairs",
    "events_segment_overlap",
    "events_seasonal_naive_eval",
    "events_burst_detection",
    # round 8 (late): Lloyd-loop persists in _km_final_assignment
    # (exploded table + per-round centroids) after last green
    "kmeans_embeddings",
    "dedup_semantic_clusters",
    "sample_cluster_balanced",
    # round 8 (late): CMS rebuilt from the per-user aggregate (one
    # events scan, per-user hashing) after last green
    "sketch_heavy_hitters",
    # round 9: connected_components' per-round checkpoint went lazy
    # (eager=False; the convergence count materializes it) after these
    # queries' last green rounds, which predate fingerprint snapshots
    "dedup_clusters",
    "dedup_cluster_size_histogram",
    "training_leakage_safe_split",
    # round 9 (late): MinHash k-family evaluated as one array expression
    # (affine_hash_array) — every query whose closure reaches
    # minhash_signatures changed after its last snapshotted green round
    # (closure-scan list; all re-swept green at sf0.01 in-session)
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_keeper_assignment",
    "dedup_cross_source_matrix",
    "dedup_minhash_calibration",
})


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
