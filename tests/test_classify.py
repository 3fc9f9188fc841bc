"""Classifier surface: NB exactness edges + MLlib LR structure.

The NB query's full oracle parity is covered by the test_oracle.py
sweep; here we pin the edges the sweep can't reach (null/empty text,
degenerate splits) and the rows-only LR twin's structural contract.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from columnar_analytics_engine_spark.queries.classify import (
    _nb_predictions,
    classifier_mllib_lr,
    classifier_nb_confusion,
)


def _docs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )


def test_nb_null_and_empty_text_docs_still_classified(spark):
    docs = _docs(
        spark,
        [
            (0, "aa aa bb", "en", "s", 8),
            (2, "cc cc dd", "fr", "s", 8),
            (1, None, "en", "s", 0),  # null text: scores on priors alone
            (3, "", "fr", "s", 0),  # empty text: single "" token, OOV-safe
            (5, "aa bb aa", "en", "s", 8),
        ],
    )
    pred = _nb_predictions(docs).orderBy("doc_id").collect()
    # every odd-doc_id test row classified exactly once
    assert [r.doc_id for r in pred] == [1, 3, 5]
    # doc 5 shares all tokens with the 'en' training doc
    assert pred[2].predicted == "en"
    # priors are equal (1 doc each) => null-text doc tie-breaks to 'en'
    assert pred[0].predicted == "en"


def test_nb_prediction_is_deterministic_under_repartition(spark):
    docs = _docs(
        spark,
        [(i, f"tok{i % 7} tok{i % 3} common", ["en", "fr", "de"][i % 3], "s", 20)
         for i in range(60)],
    )
    a = _nb_predictions(docs).orderBy("doc_id").collect()
    b = _nb_predictions(docs.repartition(7)).orderBy("doc_id").collect()
    assert a == b


def test_mllib_lr_structure_and_determinism(spark, sf_small):
    m1 = classifier_mllib_lr(spark, sf_small)
    rows1 = m1.collect()
    rows2 = classifier_mllib_lr(spark, sf_small).collect()
    assert rows1 == rows2  # zero-init L-BFGS: run-to-run deterministic

    from columnar_analytics_engine_spark.queries._util import t

    docs = t(spark, sf_small, "documents")
    n_test = docs.filter(F.col("doc_id") % 2 == 1).count()
    assert sum(r.n_docs for r in rows1) == n_test
    train_langs = {
        r.lang for r in docs.filter(F.col("doc_id") % 2 == 0).select("lang").distinct().collect()
    }
    assert {r.predicted for r in rows1} <= train_langs


def test_nb_and_lr_share_output_schema(spark, sf_small):
    nb = classifier_nb_confusion(spark, sf_small)
    lr = classifier_mllib_lr(spark, sf_small)
    assert nb.columns == lr.columns == ["actual", "predicted", "n_docs"]


def test_nb_matches_brute_force_python_reference(spark):
    """Replay the NB decomposition in pure Python (same micro-nat
    rounding) on a seeded random corpus and demand identical
    predictions — the brute-force cross-check that the sparse
    vocabulary-join decomposition implements textbook multinomial NB."""
    import math
    import random
    from collections import Counter

    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(30)]
    langs = ["de", "en", "fr"]
    rows = []
    for i in range(120):
        lang = langs[i % 3]
        # skew token choice by label so classes are learnable
        bias = langs.index(lang) * 10
        toks = [vocab[(rng.randrange(12) + bias) % 30] for _ in range(rng.randrange(3, 15))]
        rows.append((i, " ".join(toks), lang, "s", 0))
    docs = _docs(spark, rows)
    got = {r.doc_id: r.predicted for r in _nb_predictions(docs).collect()}

    train = [(d, t, l) for d, t, l, _, _ in rows if d % 2 == 0]
    test = [(d, t, l) for d, t, l, _, _ in rows if d % 2 == 1]
    c = Counter()
    n_l = Counter()
    docs_l = Counter()
    vocab_set = set()
    for _d, t, l in train:
        toks = t.split()
        vocab_set.update(toks)
        for tok in toks:
            c[(tok, l)] += 1
            n_l[l] += 1
        docs_l[l] += 1
    v = len(vocab_set)
    mln = lambda x: round(math.log(x) * 1e6)
    classes = sorted(docs_l)
    prior = {l: mln(docs_l[l] / len(train)) for l in classes}
    lnden = {l: mln(n_l[l] + v) for l in classes}
    expected = {}
    for d, t, _l in test:
        counts = Counter(tok for tok in t.split() if tok in vocab_set)
        n_known = sum(counts.values())
        scores = {}
        for l in classes:
            s = prior[l] - n_known * lnden[l]
            for tok, cnt in counts.items():
                if (tok, l) in c:
                    s += cnt * mln(c[(tok, l)] + 1)
            scores[l] = s
        expected[d] = max(classes, key=lambda l: (scores[l], [-ord(ch) for ch in l]))
    assert got == expected
