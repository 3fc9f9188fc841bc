"""Property-based tests for the dedup operator family: on arbitrary
small corpora (not just fixtures), the operators must agree with
from-scratch Python set arithmetic.

Properties pinned:
* exact_duplicates groups exactly by trimmed-text equality;
* jaccard_pairs emits exactly the pairs whose token-set Jaccard clears
  the threshold (integer-exact boundary via _rational_threshold);
* minhash_near_duplicates never emits a FALSE POSITIVE (its verify
  stage recomputes exact Jaccard; LSH may only lose candidates) and
  every emitted pair is ordered d1 < d2.
"""

from __future__ import annotations

from fractions import Fraction

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

TOKENS = ["a", "b", "c", "dd", "κ", "e"]

DOCS = st.lists(
    st.lists(st.sampled_from(TOKENS), min_size=0, max_size=8).map(" ".join),
    min_size=0,
    max_size=10,
)

SETTINGS = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)


def _mk(spark, texts):
    return spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )


def _true_jaccard_pairs(texts, threshold):
    """All (i, j, frac) with i<j and token-set Jaccard >= threshold,
    computed with exact rational arithmetic (the operator's boundary
    contract).

    Tokenizer contract mirrored exactly: ``split(trim(text), '\\s+')``
    yields the single empty token for empty/whitespace text in Spark AND
    DuckDB, so two empty documents share token set {""} and are mutual
    duplicates — the reference must model that, not Python's
    token-free ``str.split()``."""
    import re

    sets = {i: frozenset(re.split(r"\s+", t.strip())) for i, t in enumerate(texts)}
    thr = Fraction(threshold).limit_denominator(10**6)
    out = {}
    ids = sorted(sets)
    for ai, i in enumerate(ids):
        for j in ids[ai + 1 :]:
            inter = len(sets[i] & sets[j])
            union = len(sets[i] | sets[j])
            if union and Fraction(inter, union) >= thr:
                out[(i, j)] = Fraction(inter, union)
    return out


@pytest.mark.parametrize("dummy", [0])  # keep fixture session-scoped usable
@given(texts=DOCS)
@SETTINGS
def test_exact_duplicates_group_exactly_by_trimmed_text(spark, dummy, texts):
    from columnar_analytics_engine_spark.operators.dedup import exact_duplicates

    rows = exact_duplicates(_mk(spark, texts)).collect()
    # python reference: group ids by trimmed text
    groups = {}
    for i, t in enumerate(texts):
        groups.setdefault(t.strip(), []).append(i)
    expected = sorted((min(v), len(v)) for v in groups.values())
    got = sorted((r["keeper_id"], r["n_copies"]) for r in rows)
    assert got == expected


@pytest.mark.parametrize("threshold", [0.5, 0.8])
@given(texts=DOCS)
@SETTINGS
def test_jaccard_pairs_match_rational_reference(spark, threshold, texts):
    from columnar_analytics_engine_spark.operators.dedup import jaccard_pairs

    rows = jaccard_pairs(_mk(spark, texts), threshold=threshold).collect()
    expected = _true_jaccard_pairs(texts, threshold)
    got = {(r["d1"], r["d2"]): r["jaccard"] for r in rows}
    assert set(got) == set(expected)
    for pair, frac in expected.items():
        assert got[pair] == pytest.approx(float(frac), abs=1e-12)


@given(texts=DOCS)
@SETTINGS
def test_minhash_emits_no_false_positives_and_is_ordered(spark, texts):
    from columnar_analytics_engine_spark.operators.dedup import (
        minhash_near_duplicates,
    )

    rows = minhash_near_duplicates(_mk(spark, texts), threshold=0.8).collect()
    truth = _true_jaccard_pairs(texts, 0.8)
    for r in rows:
        assert r["d1"] < r["d2"]
        # the verify stage recomputes exact Jaccard: no false positives
        assert (r["d1"], r["d2"]) in truth
