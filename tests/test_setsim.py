"""Prefix-filter candidate generation (operators/setsim.py, r16).

Two contracts: (1) LOSSLESS — every pair meeting the containment
threshold is a candidate, for arbitrary corpora; (2) the boilerplate
pin — a shingle shared by EVERY document produces ~zero candidates
because the rarity order puts it outside every prefix (the quadratic
fan-out VERDICT r15 Next #4 flagged in the raw self-join)."""

from __future__ import annotations

import numpy as np
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from wukong_spark.operators.setsim import prefix_filter_candidates

SETTINGS = dict(max_examples=15, deadline=None)


def _shingle_df(spark, sets: dict[int, set[str]]):
    rows = [(d, s) for d, shs in sets.items() for s in shs]
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "sh"])
    )


def _brute_pairs(sets: dict[int, set[str]], t_num: int, t_den: int):
    ids = sorted(sets)
    out = set()
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            inter = len(sets[a] & sets[b])
            small = min(len(sets[a]), len(sets[b]))
            if small and inter * t_den >= t_num * small:
                out.add((a, b))
    return out


def test_boilerplate_shingle_no_quadratic_fanout(spark):
    """60 docs, each = 1 universal boilerplate shingle + 19 unique ones.
    True containment between any pair is 1/20 < 1/4, and the boilerplate
    shingle ranks last in every doc's prefix order — candidates must be
    EMPTY where the raw self-join would emit C(60,2)=1770 pairs."""
    sets = {
        d: {"BOILER"} | {f"u{d}_{j}" for j in range(19)} for d in range(60)
    }
    cand = prefix_filter_candidates(_shingle_df(spark, sets))
    assert cand.count() == 0


def test_contained_short_doc_is_candidate(spark):
    """The asymmetric signature pair: a short doc fully inside a long one
    (containment 1.0, Jaccard 4/100) must surface as a candidate."""
    long_doc = {f"s{i}" for i in range(100)}
    short_doc = {f"s{i}" for i in range(4)}
    sets = {0: long_doc, 1: short_doc}
    got = {
        (r.doc_a, r.doc_b)
        for r in prefix_filter_candidates(_shingle_df(spark, sets)).collect()
    }
    assert (0, 1) in got


def test_threshold_boundary_pair_is_candidate(spark):
    """Exactly-at-threshold pair (inter·4 == min) must be a candidate —
    the lemma is ≥, not >."""
    a = {f"x{i}" for i in range(8)}          # |A| = 8
    b = {"x0", "x1"} | {f"y{i}" for i in range(6)}  # |B| = 8, inter = 2
    sets = {0: a, 1: b}                       # containment = 2/8 = 1/4
    got = {
        (r.doc_a, r.doc_b)
        for r in prefix_filter_candidates(_shingle_df(spark, sets)).collect()
    }
    assert (0, 1) in got


@given(
    n_docs=st.integers(2, 12),
    vocab=st.integers(4, 30),
    seed=st.integers(0, 10_000),
    t=st.sampled_from([(1, 4), (1, 2), (3, 4)]),
)
@settings(**SETTINGS)
def test_candidates_are_lossless_superset(spark, n_docs, vocab, seed, t):
    """For random corpora and several thresholds, the candidate set must
    contain EVERY pair whose exact containment meets the threshold."""
    t_num, t_den = t
    rng = np.random.default_rng(seed)
    sets = {}
    for d in range(n_docs):
        k = int(rng.integers(1, vocab))
        sets[d] = {
            f"w{int(w)}" for w in rng.choice(vocab, size=k, replace=False)
        }
    want = _brute_pairs(sets, t_num, t_den)
    got = {
        (r.doc_a, r.doc_b)
        for r in prefix_filter_candidates(
            _shingle_df(spark, sets), t_num=t_num, t_den=t_den
        ).collect()
    }
    assert want <= got, (sorted(want - got), sorted(got))
