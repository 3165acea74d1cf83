"""Scale-shape gates for the near-dedup verify stage (VERDICT r1 #2).

At 100 TB the exact-Jaccard verify must be candidate-restricted: a
boilerplate shingle shared by half the corpus must not fan out into a
quadratic pair count before the LSH candidate list can prune. These tests
pin (a) the plan shape — the verify join is DRIVEN from the candidate
list, no post-aggregation semi-join; (b) the blast radius — the verify
output is bounded by |candidates| even under a 50%-hot shingle; and
(c) value parity — the restricted path scores exactly what the all-pairs
path scores on the surviving pairs.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from __spider_spark.operators.dedup import (
    lsh_candidate_pairs,
    minhash_signatures,
    near_dedup_keep,
    ngram_jaccard_pairs,
)


def _plan(df) -> str:
    jvm = df.sparkSession._jvm
    return jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted")


@pytest.fixture(scope="module")
def hot_corpus(spark):
    """200 docs; every even doc shares one boilerplate shingle ('subscribe
    to our newsletter today') but is otherwise unique — the classic web
    footer. Near-dup pairs exist only among docs 0..9 (clones)."""
    boiler = "subscribe to our newsletter today"
    rows = []
    for i in range(200):
        if i < 10:
            body = "identical clone body shared by the first ten documents"
        else:
            body = " ".join(f"w{i}x{j}" for j in range(30))
        text = f"{body} {boiler}" if i % 2 == 0 else body
        rows.append((i, text))
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_verify_join_driven_from_candidates(spark, hot_corpus):
    """Plan shape: with candidates supplied there is no post-agg LeftSemi —
    the shingle⋈shingle intersection only exists on the all-pairs path."""
    sig = minhash_signatures(hot_corpus, "text", "doc_id", n_hashes=16)
    cand = lsh_candidate_pairs(sig, n_bands=8, rows_per_band=2)
    verified = ngram_jaccard_pairs(hot_corpus, "text", "doc_id",
                                   threshold=0.5, candidates=cand)
    plan = _plan(verified)
    assert "LeftSemi" not in plan, (
        "candidate restriction regressed to a post-aggregation semi-join")


def test_hot_shingle_bounded_by_candidates(spark, hot_corpus):
    """Blast radius: 100 docs co-share the boilerplate shingle (≈5k
    co-shingling pairs), but the verify output must stay within the LSH
    candidate count."""
    sig = minhash_signatures(hot_corpus, "text", "doc_id", n_hashes=16)
    cand = lsh_candidate_pairs(sig, n_bands=8, rows_per_band=2)
    n_cand = cand.count()
    verified = ngram_jaccard_pairs(hot_corpus, "text", "doc_id",
                                   threshold=0.0, candidates=cand)
    n_verified = verified.count()
    assert n_verified <= n_cand
    # the hot shingle alone co-shingles C(100,2)=4950 pairs; candidates
    # must be far below that for the restriction to mean anything here
    assert n_cand < 1000


def test_candidate_path_matches_allpairs_scores(spark, hot_corpus):
    """Value parity: for every candidate pair the restricted path computes
    the same jaccard as the exact all-pairs path."""
    sig = minhash_signatures(hot_corpus, "text", "doc_id", n_hashes=16)
    cand = lsh_candidate_pairs(sig, n_bands=8, rows_per_band=2)
    restricted = ngram_jaccard_pairs(hot_corpus, "text", "doc_id",
                                     threshold=0.3, candidates=cand)
    allpairs = ngram_jaccard_pairs(hot_corpus, "text", "doc_id",
                                   threshold=0.3, candidates=None)
    allpairs_on_cand = allpairs.join(cand, ["doc_a", "doc_b"], "left_semi")
    got = {tuple(r) for r in restricted.collect()}
    want = {tuple(r) for r in allpairs_on_cand.collect()}
    assert got == want and len(got) > 0


def test_near_dedup_keeps_min_id_under_boilerplate(spark, hot_corpus):
    """End-to-end: only the clone group (docs 0..9) collapses; the 190
    boilerplate-sharing-but-unique docs all survive."""
    survivors = {
        r["doc_id"]
        for r in near_dedup_keep(hot_corpus, "text", "doc_id",
                                 n_hashes=16, n_bands=8, rows_per_band=2,
                                 threshold=0.5).collect()
    }
    assert 0 in survivors
    # clones 1..9 deduped away (9 losers); everything else survives
    assert survivors == {0} | set(range(10, 200))
