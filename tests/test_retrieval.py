"""BM25 retrieval invariants: ranking order, top-k shape, and the
planted-relevance sanity check (a doc saturated with the query terms
must outrank one that merely mentions them)."""

from __future__ import annotations

from mpi_mapreduce_spark.operators import retrieval as R


def test_bm25_planted_relevance(spark):
    docs = spark.createDataFrame(
        [
            (1, "hash join hash join hash join probe build"),
            (2, "hash table once and a join appears in passing "
                "among many many other unrelated filler words here"),
            (3, "no relevant words at all in this document body"),
        ],
        "doc_id long, text string",
    )
    out = R.bm25_topk(docs, queries=[(1, "hash join")], k=3).collect()
    by_rank = {r.rnk: r.doc_id for r in out}
    assert by_rank[1] == 1  # saturated doc wins
    assert by_rank[2] == 2
    assert 3 not in {r.doc_id for r in out}  # no matching term, no row


def test_bm25_topk_shape_and_order(spark, sf_dir):
    rows = R.text_bm25_topk(spark, sf_dir).collect()
    assert rows, "query workload must match fixture vocabulary"
    per_query: dict[int, list] = {}
    for r in rows:
        per_query.setdefault(r.query_id, []).append(r)
    for qid, rs in per_query.items():
        assert len(rs) <= R.BM25_TOPK
        rs.sort(key=lambda r: r.rnk)
        scores = [r.score for r in rs]
        assert scores == sorted(scores, reverse=True)
        # tie-break determinism: equal scores ranked by doc_id asc
        for a, b in zip(rs, rs[1:]):
            if a.score == b.score:
                assert a.doc_id < b.doc_id


def test_bm25_idf_guard_nonnegative(spark):
    # a term present in EVERY doc gets the guarded idf ln(1 + ...) > 0,
    # so scores never flip sign (Lucene variant, not the raw Robertson
    # idf which goes negative at df > N/2)
    docs = spark.createDataFrame(
        [(i, "common filler") for i in range(1, 6)],
        "doc_id long, text string",
    )
    out = R.bm25_topk(docs, queries=[(1, "common")], k=5).collect()
    assert len(out) == 5
    assert all(r.score > 0 for r in out)
