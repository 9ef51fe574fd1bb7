"""Unit tests for dedup/similarity operators on constructed inputs
with known answers (the synthetic corpus has no true near-dups, so
these fixtures plant them)."""

from __future__ import annotations

from pyspark.sql import functions as F

from big_data_bowl_2026_analytics_spark.operators.dedup import (
    exact_duplicates,
    jaccard_similar_pairs,
    lsh_bands,
    lsh_candidate_pairs,
    minhash_signatures,
    shingles,
    simhash,
)
from big_data_bowl_2026_analytics_spark.operators.similarity import (
    ann_topk,
    brute_force_topk,
)


def _docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog", "en"),
        (2, "the quick brown fox jumps over the lazy dog", "en"),  # exact dup of 1
        (3, "the quick brown fox jumps over the lazy cat", "en"),  # near dup of 1
        (4, "completely different words here nothing shared", "en"),
        (5, "short", "en"),  # fewer than 3 tokens -> no shingles
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_exact_duplicates(spark):
    out = exact_duplicates(_docs(spark)).collect()
    by_keep = {r["keep_id"]: r["n_copies"] for r in out}
    assert by_keep[1] == 2  # docs 1 and 2 collapse
    assert by_keep[3] == 1
    assert len(out) == 4  # 4 distinct texts


def test_shingles_short_doc_empty_not_descending(spark):
    df = _docs(spark).select("doc_id", shingles(F.col("text"), 3).alias("sh"))
    row = {r["doc_id"]: r["sh"] for r in df.collect()}
    assert row[5] == []  # not a descending-sequence artifact
    assert row[1][0] == "the quick brown"


def test_minhash_lsh_finds_planted_near_dup(spark):
    docs = _docs(spark)
    sig = minhash_signatures(docs, n_hashes=8, shingle_n=3)
    pairs = lsh_candidate_pairs(lsh_bands(sig, 8, 2)).collect()
    pairset = {(r["doc_a"], r["doc_b"]) for r in pairs}
    assert (1, 2) in pairset  # exact dup always collides on all bands
    full = {(r["doc_a"], r["doc_b"]): r["n_shared_bands"] for r in pairs}
    assert full[(1, 2)] == 4


def test_jaccard_pairs_exact_values(spark):
    out = jaccard_similar_pairs(_docs(spark), threshold=0.5, block_col="lang")
    vals = {(r["doc_a"], r["doc_b"]): r["jaccard"] for r in out.collect()}
    assert vals[(1, 2)] == 1.0
    # docs 1 and 3: 8-token sets, 7 shared -> 7/9
    assert abs(vals[(1, 3)] - 7 / 9) < 1e-12


def test_simhash_identical_docs_equal_hash(spark):
    out = {r["doc_id"]: r["simhash"] for r in simhash(_docs(spark)).collect()}
    assert out[1] == out[2]
    assert 0 <= out[1] < 2**16
    # near-dup should be closer in Hamming distance than unrelated doc
    ham = lambda a, b: bin(a ^ b).count("1")  # noqa: E731
    assert ham(out[1], out[3]) <= ham(out[1], out[4])


def _vectors(spark):
    import numpy as np

    rng = np.random.RandomState(7)
    base = rng.randn(6, 8)
    base[1] = base[0] + 0.01 * rng.randn(8)  # vec 1 ~ vec 0
    rows = [(i, [float(x) for x in base[i]]) for i in range(6)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_brute_force_topk_nearest_is_planted(spark):
    vecs = _vectors(spark)
    out = brute_force_topk(vecs, vecs.where(F.col("vec_id") == 0), k=2)
    rows = sorted(out.collect(), key=lambda r: r["rank"])
    assert rows[0]["neighbor_id"] == 1
    assert rows[0]["cosine"] > 0.99


def test_ann_topk_subset_of_bruteforce_scores(spark):
    vecs = _vectors(spark)
    q = vecs.where(F.col("vec_id") == 0)
    exact = {r["neighbor_id"]: r["cosine"] for r in brute_force_topk(vecs, q, k=5).collect()}
    approx = ann_topk(vecs, q, k=5, n_planes=4, dim=8).collect()
    for r in approx:  # every ANN result must carry the exact cosine
        assert r["neighbor_id"] in exact
        assert abs(r["cosine"] - exact[r["neighbor_id"]]) < 1e-9


def test_duplicate_clusters_multi_hop_chain(spark):
    """A-B and B-C edges must collapse into ONE cluster labeled by the
    minimum id, even though A and C never share an edge (transitivity
    needs >1 propagation round)."""
    from big_data_bowl_2026_analytics_spark.operators.dedup import (
        duplicate_clusters,
    )

    nodes = spark.createDataFrame([(i,) for i in range(1, 8)], "doc_id long")
    pairs = spark.createDataFrame(
        [(1, 5), (5, 3), (3, 7), (2, 6)],  # chain 1-5-3-7 and pair 2-6
        "doc_a long, doc_b long",
    )
    out = {r["doc_id"]: r["cluster_id"] for r in duplicate_clusters(pairs, nodes).collect()}
    assert out[1] == out[5] == out[3] == out[7] == 1
    assert out[2] == out[6] == 2
    assert out[4] == 4  # isolated node keeps its own label


def test_lsh_bucket_cap_bounds_degenerate_bucket(spark):
    """Adversarial fixture: every doc is identical, so all 4 bands of
    every doc land in the same bucket. Uncapped that's C(40,2) pairs
    per band; with max_bucket_size=4 each band emits at most C(4,2)."""
    docs = spark.createDataFrame(
        [(i, "the same boilerplate text repeated verbatim") for i in range(40)],
        ["doc_id", "text"],
    )
    bands = lsh_bands(minhash_signatures(docs, 8), 8, 2)
    capped = lsh_candidate_pairs(bands, max_bucket_size=4).collect()
    # 4 bands x C(4,2)=6 pairs, deduped to the same 6 doc pairs
    assert len(capped) == 6
    kept = {d for r in capped for d in (r["doc_a"], r["doc_b"])}
    # deterministic: the cap keeps the smallest doc ids
    assert kept == {0, 1, 2, 3}
    assert all(r["n_shared_bands"] == 4 for r in capped)
    # the plan bounds the join input BEFORE the self-join
    uncapped = lsh_candidate_pairs(bands).collect()
    assert len(uncapped) == 40 * 39 // 2


def test_lsh_bucket_cap_noop_on_healthy_buckets(spark):
    """Buckets smaller than the cap are untouched: capped == uncapped."""
    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon"),
            (2, "alpha beta gamma delta zeta"),
            (3, "totally different words here now"),
        ],
        ["doc_id", "text"],
    )
    bands = lsh_bands(minhash_signatures(docs, 8), 8, 2)
    capped = sorted(
        map(tuple, lsh_candidate_pairs(bands, max_bucket_size=10).collect())
    )
    uncapped = sorted(map(tuple, lsh_candidate_pairs(bands).collect()))
    assert capped == uncapped


def test_star_cc_matches_min_label_on_path_graph(spark):
    """Property check on a high-diameter fixture: a 24-node path
    (diameter 23). Star contraction must produce the identical
    clustering with far fewer rounds than O(diameter)."""
    from big_data_bowl_2026_analytics_spark.operators.dedup import (
        _star_cc,
        duplicate_clusters,
        duplicate_clusters_star,
    )

    n = 24
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)] + [(100, 101)], ["doc_a", "doc_b"]
    )
    nodes = spark.createDataFrame(
        [(i,) for i in range(n)] + [(100,), (101,), (999,)], ["doc_id"]
    )
    base = {
        r["doc_id"]: r["cluster_id"]
        for r in duplicate_clusters(pairs, nodes, max_iterations=30).collect()
    }
    star = {
        r["doc_id"]: r["cluster_id"]
        for r in duplicate_clusters_star(pairs, nodes).collect()
    }
    assert star == base
    assert star[23] == 0 and star[101] == 100 and star[999] == 999
    # convergence rate: O(log^2 n) rounds, not O(diameter)
    _, rounds = _star_cc(pairs, max_iterations=12)
    assert rounds <= 6


def test_star_cc_arbitrary_components(spark):
    """Random-ish mixed topology (star, triangle+tail, singletons):
    same labels from both algorithms."""
    from big_data_bowl_2026_analytics_spark.operators.dedup import (
        duplicate_clusters,
        duplicate_clusters_star,
    )

    edges = [(5, 2), (2, 9), (9, 5), (9, 14), (20, 21), (21, 22), (22, 20), (30, 7)]
    pairs = spark.createDataFrame(edges, ["doc_a", "doc_b"])
    node_ids = sorted({x for e in edges for x in e} | {50})
    nodes = spark.createDataFrame([(i,) for i in node_ids], ["doc_id"])
    base = {
        r["doc_id"]: r["cluster_id"]
        for r in duplicate_clusters(pairs, nodes, max_iterations=30).collect()
    }
    star = {
        r["doc_id"]: r["cluster_id"]
        for r in duplicate_clusters_star(pairs, nodes).collect()
    }
    assert star == base
    assert star[14] == 2 and star[22] == 20 and star[30] == 7 and star[50] == 50


class TestPrefixFilterJaccard:
    def _naive(self, spark, docs, t):
        from pyspark.sql import functions as F

        tok = docs.select(
            "doc_id", F.explode(F.array_distinct(F.split("text", " "))).alias("tok")
        )
        sizes = tok.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
        a = tok.select(F.col("doc_id").alias("doc_a"), "tok")
        b = tok.select(F.col("doc_id").alias("doc_b"), "tok")
        inter = (
            a.join(b, "tok")
            .where(F.col("doc_a") < F.col("doc_b"))
            .groupBy("doc_a", "doc_b")
            .agg(F.count(F.lit(1)).alias("inter"))
        )
        sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na"))
        sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb"))
        j = inter.join(sa, "doc_a").join(sb, "doc_b").withColumn(
            "jaccard", F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter"))
        )
        return {
            (r.doc_a, r.doc_b, r.inter)
            for r in j.where(F.col("jaccard") >= t).collect()
        }

    def test_matches_naive_all_pairs(self, spark):
        import random

        from big_data_bowl_2026_analytics_spark.operators.dedup import (
            prefix_filter_jaccard_pairs,
        )

        rnd = random.Random(11)
        vocab = [f"w{i}" for i in range(60)]
        rows = []
        for i in range(80):
            base = rnd.sample(vocab, 12)
            rows.append((i, " ".join(base)))
            if i % 3 == 0:  # planted near-dup: one-token mutation
                mut = list(base)
                mut[0] = rnd.choice(vocab)
                rows.append((1000 + i, " ".join(mut)))
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        got = {
            (r.doc_a, r.doc_b, r.inter)
            for r in prefix_filter_jaccard_pairs(docs, threshold=0.8).collect()
        }
        assert got == self._naive(spark, docs, 0.8)
        assert got  # fixture actually produces qualifying pairs

    def test_hot_token_stays_out_of_prefix(self, spark):
        # every doc shares one ultra-hot token; the naive token join is
        # quadratic in it, the prefix probe side must exclude it.
        from pyspark.sql import functions as F

        from big_data_bowl_2026_analytics_spark.operators.dedup import (
            prefix_filter_jaccard_pairs,
        )

        rows = [
            (i, "hot " + " ".join(f"u{i}_{k}" for k in range(9)))
            for i in range(60)
        ]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        # all pairs share only 'hot': jaccard = 1/19 — nothing qualifies
        out = prefix_filter_jaccard_pairs(docs, threshold=0.8)
        assert out.count() == 0


class TestLevenshteinNeardup:
    def _docs(self, spark, seed=7, n=50):
        import random

        rnd = random.Random(seed)
        rows = []
        for i in range(n):
            base = "".join(rnd.choice("abcdef ") for _ in range(rnd.randint(40, 120)))
            lang = rnd.choice(["en", "fr"])
            rows.append((i, base, lang, len(base)))
            if i % 4 == 0:
                # planted near-dup: in-place edits + a small length change
                chars = list(base)
                for _ in range(rnd.randint(1, 6)):
                    chars[rnd.randrange(len(chars))] = rnd.choice("abcdef")
                mut = "".join(chars) + "xy" * rnd.randint(0, 3)
                rows.append((1000 + i, mut, lang, len(mut)))
        return spark.createDataFrame(
            rows, "doc_id long, text string, lang string, n_chars long"
        )

    def test_blocked_matches_naive_all_pairs(self, spark):
        # The oracle shares the blocking, so recall 1 vs the UNBLOCKED
        # quadratic form must be proven here.
        from pyspark.sql import functions as F

        from big_data_bowl_2026_analytics_spark.operators.dedup import (
            levenshtein_neardup_pairs,
        )

        docs = self._docs(spark)
        k = 12
        got = {
            (r.doc_a, r.doc_b, r.edit_dist)
            for r in levenshtein_neardup_pairs(docs, max_dist=k).collect()
        }
        a = docs.select(
            F.col("doc_id").alias("doc_a"), F.col("text").alias("ta"), "lang"
        )
        b = docs.select(
            F.col("doc_id").alias("doc_b"), F.col("text").alias("tb"), "lang"
        )
        naive = {
            (r.doc_a, r.doc_b, r.d)
            for r in a.join(b, "lang")
            .where(F.col("doc_a") < F.col("doc_b"))
            .select("doc_a", "doc_b", F.levenshtein("ta", "tb").alias("d"))
            .where(F.col("d") <= k)
            .collect()
        }
        assert got == naive
        assert got  # planted near-dups actually qualify

    def test_lsh_content_block_subsets_length_blocking(self, spark):
        # Composing an LSH-band block_col (q124) can only DROP pairs
        # relative to pure length blocking — and planted heavy
        # near-dups (many shared shingles => near-certain band
        # collision) must survive the composition.
        from pyspark.sql import functions as F

        from big_data_bowl_2026_analytics_spark.operators.dedup import (
            levenshtein_neardup_pairs,
            lsh_bands,
            minhash_signatures,
        )

        import random

        rnd = random.Random(11)
        rows = []
        words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]
        for i in range(30):
            toks = [rnd.choice(words) for _ in range(20)]
            text = " ".join(toks)
            rows.append((i, text, len(text)))
            if i % 3 == 0:
                # single-token substitution: 17 of 18 shingles shared
                mut = list(toks)
                mut[10] = rnd.choice(words)
                mtext = " ".join(mut)
                rows.append((1000 + i, mtext, len(mtext)))
        docs = spark.createDataFrame(rows, "doc_id long, text string, n_chars long")

        k = 12
        plain = {
            (r.doc_a, r.doc_b)
            for r in levenshtein_neardup_pairs(
                docs, max_dist=k, block_col=None
            ).collect()
        }
        sig = minhash_signatures(docs, n_hashes=8, shingle_n=3)
        bands = lsh_bands(sig, n_hashes=8, band_size=2)
        blocked = docs.join(bands, "doc_id").select(
            "doc_id",
            "text",
            "n_chars",
            F.concat_ws("|", F.col("band_id").cast("string"), "bucket").alias(
                "_block"
            ),
        )
        composed = {
            (r.doc_a, r.doc_b)
            for r in levenshtein_neardup_pairs(
                blocked, max_dist=k, block_col="_block"
            ).collect()
        }
        assert composed <= plain
        planted = {(i, 1000 + i) for i in range(0, 30, 3)} & plain
        assert planted  # fixture really plants qualifying pairs
        assert planted <= composed  # heavy near-dups survive LSH blocking

    def test_bucket_width_below_threshold_rejected(self, spark):
        import pytest

        from big_data_bowl_2026_analytics_spark.operators.dedup import (
            levenshtein_neardup_pairs,
        )

        with pytest.raises(ValueError):
            levenshtein_neardup_pairs(self._docs(spark), max_dist=20, bucket_width=8)


class TestContainmentPairs:
    def test_fragment_found_where_jaccard_blind(self, spark):
        from big_data_bowl_2026_analytics_spark.operators.dedup import (
            containment_pairs,
            jaccard_similar_pairs,
        )

        long_doc = " ".join(f"w{i}" for i in range(200))
        fragment = " ".join(f"w{i}" for i in range(40, 60))  # 20 toks ⊂ long
        other = " ".join(f"x{i}" for i in range(50))
        docs = spark.createDataFrame(
            [(1, long_doc, "en"), (2, fragment, "en"), (3, other, "en")],
            "doc_id long, text string, lang string",
        )
        got = {
            (r.doc_a, r.doc_b): (r.containment_ab, r.containment_ba)
            for r in containment_pairs(docs, threshold=0.9).collect()
        }
        # the fragment (doc 2, the SMALLER side = doc_b's direction)
        assert got == {(1, 2): (20 / 200, 1.0)}
        # symmetric Jaccard at any near-dup threshold misses it
        jac = jaccard_similar_pairs(docs, threshold=0.5).collect()
        assert jac == []

    def test_direction_labels_follow_id_order(self, spark):
        from big_data_bowl_2026_analytics_spark.operators.dedup import (
            containment_pairs,
        )

        # same fixture, ids swapped: containment_ab must now be the
        # fragment's direction (doc_a is the smaller doc).
        long_doc = " ".join(f"w{i}" for i in range(100))
        fragment = " ".join(f"w{i}" for i in range(10, 20))
        docs = spark.createDataFrame(
            [(2, long_doc, "en"), (1, fragment, "en")],
            "doc_id long, text string, lang string",
        )
        [r] = containment_pairs(docs, threshold=0.9).collect()
        assert (r.doc_a, r.doc_b) == (1, 2)
        assert r.containment_ab == 1.0 and r.containment_ba == 0.1


def test_containment_matches_naive_on_random_docs(spark):
    # random fixture: blocked operator output must equal the naive
    # all-pairs python computation exactly (integer-ratio semantics).
    import random

    from big_data_bowl_2026_analytics_spark.operators.dedup import (
        containment_pairs,
    )

    rnd = random.Random(17)
    vocab = [f"w{i}" for i in range(30)]
    rows = []
    for i in range(40):
        toks = rnd.sample(vocab, rnd.randint(3, 12))
        rows.append((i, " ".join(toks), rnd.choice(["en", "fr"])))
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    got = {
        (r.doc_a, r.doc_b): (r.inter, r.containment_ab, r.containment_ba)
        for r in containment_pairs(docs, threshold=0.5).collect()
    }
    sets = {i: (set(t.split()), lang) for i, t, lang in rows}
    want = {}
    for a in range(40):
        for b in range(a + 1, 40):
            sa, la = sets[a]
            sb, lb = sets[b]
            if la != lb:
                continue
            inter = len(sa & sb)
            if inter == 0:
                continue
            cab, cba = inter / len(sa), inter / len(sb)
            if cab >= 0.5 or cba >= 0.5:
                want[(a, b)] = (inter, cab, cba)
    assert got == want
    assert want  # fixture produces qualifying pairs
