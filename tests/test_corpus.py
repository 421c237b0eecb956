"""Training-corpus operators: deterministic-sampling properties and a
plain-Python reference for stream-slice packing."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from odin_rs_spark.operators import corpus, dedup


def _draw(key: str) -> float:
    return int(hashlib.md5(key.encode()).hexdigest()[:15], 16) / 2**60


def test_hash_sample_deterministic_and_exact(spark):
    df = spark.range(2000).select(F.col("id").alias("k"))
    kept = {r.k for r in corpus.hash_sample(df, 0.3, key="k").collect()}
    # exact membership per the portable hash, not approximate
    want = {i for i in range(2000) if _draw(str(i)) < 0.3}
    assert kept == want
    # rerun → identical (no RNG state)
    again = {r.k for r in corpus.hash_sample(df, 0.3, key="k").collect()}
    assert again == kept


def test_source_mix_rates(spark):
    rows = [Row(doc_id=i, source=f"s{i % 3}") for i in range(3000)]
    df = spark.createDataFrame(rows)
    out = corpus.source_mix(
        df, {"s0": 1.0, "s1": 0.0}, key="doc_id", default_rate=0.5
    )
    got = out.groupBy("source").count().collect()
    counts = {r.source: r["count"] for r in got}
    assert counts["s0"] == 1000
    assert "s1" not in counts
    want_s2 = sum(1 for i in range(3000) if i % 3 == 2 and _draw(str(i)) < 0.5)
    assert counts["s2"] == want_s2


def test_contamination_detects_planted_overlap(spark):
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text=base),  # full overlap
            Row(doc_id=2, text="totally different words here entirely now"),
            Row(doc_id=3, text="alpha beta gamma delta xx yy zz"),  # partial
        ]
    )
    bench = spark.createDataFrame([Row(doc_id=100, text=base)])
    hits = {
        (r.doc_id, r.n_shared)
        for r in corpus.contamination(docs, bench, min_hits=2).collect()
    }
    ids = {d for d, _ in hits}
    assert 1 in ids and 2 not in ids and 3 in ids
    # doc 1 shares all 8 shingles; doc 3 shares the 2 fully-contained ones
    assert (1, 8) in hits and (3, 2) in hits


def test_pack_sequences_matches_reference(spark):
    import random

    rng = random.Random(11)
    rows = [Row(doc_id=i, n_tokens=rng.randrange(1, 120)) for i in range(200)]
    out = corpus.pack_sequences(
        spark.createDataFrame(rows), max_tokens=100
    ).collect()
    got = {r.doc_id: (r.chunk_id, r.chunk_pos) for r in out}
    # reference: cumsum of capped counts, chunk = ceil(run/cap) - 1
    run = 0
    want: dict[int, tuple[int, int]] = {}
    pos: dict[int, int] = {}
    for r in sorted(rows, key=lambda x: x.doc_id):
        run += min(r.n_tokens, 100)
        chunk = max(-(-run // 100) - 1, 0)
        want[r.doc_id] = (chunk, pos.get(chunk, 0))
        pos[chunk] = pos.get(chunk, 0) + 1
    assert got == want
    # every doc present exactly once, chunk ids contiguous from 0
    chunks = {c for c, _ in got.values()}
    assert chunks == set(range(max(chunks) + 1))


def test_connected_components_star_forest(spark):
    from odin_rs_spark.operators.dedup import connected_components

    # chain (forces multiple rounds), clique, pair, and reversed-order
    # edges; node 99 is isolated (absent from edges → absent from output)
    edges = [
        (1, 2), (2, 3), (3, 4), (4, 5),          # chain → comp 1
        (10, 11), (10, 12), (11, 12),            # clique → comp 10
        (21, 20),                                # reversed pair → comp 20
        (31, 30), (32, 31), (33, 30),            # mixed orientation → comp 30
    ]
    df = spark.createDataFrame([Row(id_a=a, id_b=b) for a, b in edges])
    want = (
        {(n, 1) for n in (1, 2, 3, 4, 5)}
        | {(n, 10) for n in (10, 11, 12)}
        | {(n, 20) for n in (20, 21)}
        | {(n, 30) for n in (30, 31, 32, 33)}
    )
    # both paths must agree: distributed alternating-star and the
    # small-graph driver union-find
    for thr in (None, 1_000_000):
        got = {
            (r.node, r.component)
            for r in connected_components(
                df, "id_a", "id_b", driver_threshold=thr
            ).collect()
        }
        assert got == want, f"driver_threshold={thr}"


def test_connected_components_empty_and_self_loop(spark):
    from pyspark.sql.types import LongType, StructField, StructType

    from odin_rs_spark.operators.dedup import connected_components

    schema = StructType(
        [StructField("id_a", LongType()), StructField("id_b", LongType())]
    )
    empty = spark.createDataFrame([], schema)
    assert connected_components(empty).count() == 0
    # self-loops are dropped, real edge survives
    df = spark.createDataFrame([Row(id_a=7, id_b=7), Row(id_a=8, id_b=9)])
    got = {(r.node, r.component) for r in connected_components(df).collect()}
    assert got == {(8, 8), (9, 8)}


def test_lsh_bucket_cap_drops_degenerate_buckets(spark):
    """A corpus dominated by one identical boilerplate doc puts every copy
    in the same LSH bucket per band; the cap must drop those buckets before
    the quadratic in-bucket expansion, keep genuine near-dup pairs, and the
    audit twin must report the dropped buckets."""
    from odin_rs_spark.operators import dedup

    boiler = "subscribe to our newsletter for daily updates and offers " * 5
    rows = [Row(doc_id=i, text=boiler) for i in range(40)]
    # one genuine near-dup pair, textually far from the boilerplate
    a = "the quick brown fox jumps over the lazy dog near the river bank today"
    rows += [Row(doc_id=100, text=a), Row(doc_id=101, text=a + " again")]
    df = spark.createDataFrame(rows)

    capped = dedup.lsh_candidate_pairs(df, max_bucket_size=10).collect()
    got = {(r.id_a, r.id_b) for r in capped}
    assert (100, 101) in got
    # every 40-copy boilerplate bucket is over the cap → none of its pairs
    assert all(p == (100, 101) for p in got)

    uncapped = {
        (r.id_a, r.id_b) for r in dedup.lsh_candidate_pairs(df).collect()
    }
    assert (0, 1) in uncapped and len(uncapped) > len(got)

    dropped = dedup.lsh_oversized_buckets(df, max_bucket_size=10).collect()
    assert len(dropped) > 0 and all(r.n_ids == 40 for r in dropped)


def test_near_dup_join_symmetric_cap_and_audit(spark):
    """Round-3 ADVICE fix: the join-path cap must apply to BOTH sides —
    a boilerplate bucket dominated by the incoming batch used to still
    join every new id against up to `cap` base ids per band — and the
    drop must be auditable via near_dup_join_oversized_buckets."""
    boiler = "subscribe to our newsletter for daily updates and offers " * 5
    a = "the quick brown fox jumps over the lazy dog near the river bank today"
    new = spark.createDataFrame(
        [Row(doc_id=i, text=boiler) for i in range(30)] + [Row(doc_id=100, text=a)]
    )
    base = spark.createDataFrame(
        [Row(doc_id=1000 + i, text=boiler) for i in range(5)]
        + [Row(doc_id=1100, text=a + " again")]
    )
    capped = dedup.near_dup_join(new, base, threshold=0.7, max_bucket_size=10)
    got = {(r.new_id, r.base_id) for r in capped.collect()}
    # base-side boiler bucket is only 5 (under cap) — the NEW side's 30
    # must trigger the drop; only the genuine pair survives
    assert got == {(100, 1100)}
    audit = dedup.near_dup_join_oversized_buckets(
        new, base, max_bucket_size=10
    ).collect()
    assert audit and all(r.n_new == 30 and r.n_base == 5 for r in audit)


def test_jaccard_prefix_bucket_audit_degenerate_corpus(spark):
    """VERDICT #6: the exact-Jaccard prefix join must not cap (exactness),
    so its scale safety valve is the audit — a degenerate same-text corpus
    shows up as quadratic-cost buckets, while the join itself stays exact."""
    text = "identical boilerplate document body repeated verbatim in every row"
    df = spark.createDataFrame([Row(doc_id=i, text=text) for i in range(50)])
    audit = dedup.jaccard_prefix_buckets(df, min_bucket_size=40).collect()
    assert audit and all(r.n_ids == 50 and r.est_pairs == 1225 for r in audit)
    # and the join still finds every pair (50*49/2), uncapped by design
    assert dedup.jaccard_join_pairs(df, threshold=0.9).count() == 1225


def test_jaccard_prefix_epsilon_guard(spark):
    """Round-3 ADVICE fix: ceil(size*t) in fp can round an exactly-integer
    real product UP (25*0.56 → 14.000000000000002 → ceil 15), silently
    shortening the prefix and losing recall. The guarded form errs only
    toward longer prefixes."""
    assert 25 * 0.56 > 14  # the fp hazard this guards against is real
    row = spark.range(1).select(
        F.ceil(F.lit(25) * F.lit(0.56)).alias("naive"),
        F.ceil(F.lit(25) * F.lit(0.56) - F.lit(1e-9)).alias("guarded"),
    ).collect()[0]
    assert row.naive == 15  # the bug: one extra overlap demanded
    assert row.guarded == 14  # the guard restores the exact requirement


def test_repetition_stats_and_pii(spark):
    from odin_rs_spark.operators import text as text_ops

    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text="spam spam spam spam spam spam"),  # one bigram repeated
            Row(doc_id=2, text="all words here are fully distinct tokens"),
            Row(doc_id=3, text="short"),  # < 2 words → excluded
        ]
    )
    rep = {r.doc_id: r for r in text_ops.repetition_stats(docs).collect()}
    assert set(rep) == {1, 2}
    assert rep[1].top_ngram_frac == 1.0 and rep[1].distinct_ngrams == 1
    assert rep[2].top_ngram_frac < 0.2 and rep[2].distinct_ngram_frac == 1.0

    pii = spark.createDataFrame(
        [Row(doc_id=1, text="mail a.b@test.org or 555-123-4567 at 10.0.0.1 ok")]
    )
    row = pii.select(
        text_ops.pii_count("text", "email").alias("e"),
        text_ops.pii_count("text", "phone").alias("p"),
        text_ops.pii_count("text", "ipv4").alias("i"),
        text_ops.redact_pii(F.col("text")).alias("red"),
    ).collect()[0]
    assert (row.e, row.p, row.i) == (1, 1, 1)
    assert row.red == "mail [EMAIL] or [PHONE] at [IPV4] ok"


def test_chunk_documents_overlap_semantics(spark):
    df = spark.createDataFrame([Row(doc_id=1, text=" ".join(f"w{i}" for i in range(10)))])
    got = {
        r.chunk_id: r
        for r in corpus.chunk_documents(df, chunk_size=4, stride=3).collect()
    }
    # starts 0,3,6,9 → 4 chunks; every word covered; overlap of 1 word
    assert set(got) == {0, 1, 2, 3}
    assert got[0].chunk_text == "w0 w1 w2 w3"
    assert got[1].chunk_text == "w3 w4 w5 w6"
    assert got[3].chunk_text == "w9" and got[3].n_words == 1
    covered = set()
    for r in got.values():
        covered.update(r.chunk_text.split(" "))
    assert covered == {f"w{i}" for i in range(10)}


def test_temperature_mix_flattens_distribution(spark):
    # 1000 'big' vs 40 'rare' docs; alpha=0.5 → rare keeps 100%,
    # big keeps ~sqrt(40/1000) ≈ 20%
    rows = [Row(doc_id=i, source="big") for i in range(1000)]
    rows += [Row(doc_id=10_000 + i, source="rare") for i in range(40)]
    df = spark.createDataFrame(rows)
    kept = corpus.temperature_mix(df, alpha=0.5).groupBy("source").count()
    got = {r.source: r["count"] for r in kept.collect()}
    assert got["rare"] == 40  # rarest source: rate 1, nothing dropped
    expected_big = 1000 * (40 / 1000) ** 0.5  # ≈ 200
    assert abs(got["big"] - expected_big) < 50  # hash-Bernoulli tolerance
    # alpha=1 keeps everything (rates all 1)
    all_kept = corpus.temperature_mix(df, alpha=1.0).count()
    assert all_kept == 1040


def test_jaccard_join_exactness_vs_brute_force(spark):
    import itertools
    import random

    from odin_rs_spark.operators.dedup import jaccard_join_pairs

    random.seed(7)
    vocab = [f"tok{i}" for i in range(40)]
    texts = {}
    for i in range(25):
        texts[i] = " ".join(random.choices(vocab, k=random.randint(5, 30)))
    # planted near-dups: small perturbations of doc 0 at varying overlap
    texts[100] = texts[0]
    texts[101] = texts[0] + " extra words here"
    texts[102] = " ".join(texts[0].split()[2:])
    df = spark.createDataFrame([Row(doc_id=k, text=v) for k, v in texts.items()])

    def sh2(t):
        w = t.lower().split()
        if len(w) < 2:
            return {w[0]}
        return {f"{w[i]} {w[i+1]}" for i in range(len(w) - 1)}

    expect = set()
    for a, b in itertools.combinations(sorted(texts), 2):
        A, B = sh2(texts[a]), sh2(texts[b])
        if len(A & B) / len(A | B) >= 0.5:
            expect.add((a, b))
    got = {
        (r.id_a, r.id_b)
        for r in jaccard_join_pairs(df, shingle_n=2, threshold=0.5).collect()
    }
    assert expect and got == expect  # recall 1 AND precision 1 (exact join)


def test_semantic_dedup_clusters_planted(spark):
    import random

    from odin_rs_spark.operators.similarity import semantic_dedup_clusters

    random.seed(3)
    rows = [
        Row(vec_id=i, embedding=[random.gauss(0, 1) for _ in range(64)])
        for i in range(30)
    ]
    # plant: 100 = 2×(vec 0), 101 = -3×(vec 5) (opposite direction: NOT a dup)
    rows.append(Row(vec_id=100, embedding=[2.0 * x for x in rows[0].embedding]))
    rows.append(Row(vec_id=101, embedding=[-3.0 * x for x in rows[5].embedding]))
    df = spark.createDataFrame(rows)
    got = {(r.node, r.component) for r in semantic_dedup_clusters(df, threshold=0.99).collect()}
    assert got == {(0, 0), (100, 0)}


def test_repeated_substring_spans_merging(spark):
    from odin_rs_spark.operators.dedup import repeated_substring_spans

    shared = " ".join(f"s{i}" for i in range(10))  # 10-word shared phrase
    rows = [
        Row(doc_id=1, text=shared + " unique tail words here alpha beta"),
        Row(doc_id=2, text="other prefix words gamma delta " + shared),
        Row(doc_id=3, text=" ".join(f"u{i}" for i in range(20))),  # no dups
    ]
    df = spark.createDataFrame(rows)
    got = {
        r.doc_id: (r.span_start, r.span_end_excl, r.n_windows)
        for r in repeated_substring_spans(df, window_k=4).collect()
    }
    # docs 1 and 2 share the 10-word phrase -> 7 dup windows of size 4
    # merge into ONE maximal span of 10 tokens; doc 3 emits nothing
    assert set(got) == {1, 2}
    assert got[1] == (0, 10, 7)
    assert got[2][2] == 7 and got[2][1] - got[2][0] == 10
    assert got[2][0] == 5  # phrase starts after the 5-word prefix


def test_source_quota_cap_and_determinism(spark):
    rows = [Row(doc_id=i, source=f"s{i % 3}") for i in range(90)]
    df = spark.createDataFrame(rows)
    a = corpus.source_quota(df, n_max=10)
    b = corpus.source_quota(df, n_max=10)
    ga = sorted((r.source, r.doc_id) for r in a.collect())
    gb = sorted((r.source, r.doc_id) for r in b.collect())
    assert ga == gb  # deterministic
    from collections import Counter

    counts = Counter(s for s, _ in ga)
    assert counts == {"s0": 10, "s1": 10, "s2": 10}


def test_ivfpq_probes_restrict_candidates(spark):
    import random

    from odin_rs_spark.operators.similarity import ivfpq_fixed_topk

    random.seed(5)
    rows = [
        Row(vec_id=i, embedding=[random.gauss(0, 1) for _ in range(16)])
        for i in range(60)
    ]
    df = spark.createDataFrame(rows)
    queries = df.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    cents = [3, 17, 29, 41]
    out = ivfpq_fixed_topk(
        df, queries, cents, cents, k=5, num_sub=4, nprobe=2
    ).collect()
    assert {r.query_id for r in out} == {0, 1}
    for qid in (0, 1):
        ranks = sorted(r.rank for r in out if r.query_id == qid)
        assert ranks == [1, 2, 3, 4, 5]
        # monotone distance in rank order
        ds = [r.approx_dist for r in sorted(
            (x for x in out if x.query_id == qid), key=lambda x: x.rank)]
        assert ds == sorted(ds)


def test_containment_join_exactness_vs_brute_force(spark):
    # exact recall: the asymmetric prefix filter must reproduce the
    # brute-force directed containment over the same 2-gram shingles
    texts = [
        (1, "the quick brown fox jumps over the lazy dog tonight"),
        (2, "quick brown fox jumps over the lazy dog"),  # near-subset of 1
        (3, "a completely different sentence about spark engines"),
        (4, "different sentence about spark engines and scale"),
        (5, "the quick brown fox"),  # short excerpt of 1/2
    ]
    df = spark.createDataFrame(texts, ["doc_id", "text"])

    def sh2(t):
        w = t.lower().split()
        return {" ".join(w[i : i + 2]) for i in range(max(len(w) - 1, 1))}

    want = set()
    for a, ta in texts:
        for b, tb in texts:
            if a != b:
                sa, sb = sh2(ta), sh2(tb)
                if len(sa & sb) / len(sa) >= 0.6:
                    want.add((a, b))
    got = {
        (r.id_a, r.id_b)
        for r in dedup.containment_join_pairs(df, shingle_n=2, threshold=0.6).collect()
    }
    assert got == want
    # the defining asymmetric case: the short excerpt (5) is contained
    # in the long doc (1) but their Jaccard is far below 0.6
    assert (5, 1) in got
    jac = {
        (r.id_a, r.id_b)
        for r in dedup.jaccard_join_pairs(df, shingle_n=2, threshold=0.6).collect()
    }
    assert (1, 5) not in jac and (5, 1) not in jac


def test_containment_postings_audit_degenerate_corpus(spark):
    # a same-text corpus puts every shingle in every prefix AND every
    # full posting list: the audit must surface the quadratic cost
    df = spark.createDataFrame(
        [(i, "alpha beta gamma delta epsilon zeta") for i in range(40)],
        ["doc_id", "text"],
    )
    audit = dedup.containment_postings_audit(
        df, shingle_n=3, threshold=0.6, min_cost=100
    ).collect()
    assert audit, "degenerate corpus must trip the postings audit"
    assert all(r.est_candidates == r.n_prefix * r.n_full for r in audit)
    assert max(r.n_full for r in audit) == 40


def test_stratified_sample_exact_counts_and_determinism(spark):
    import math

    rows = [(i, "en" if i % 3 else "de") for i in range(300)]
    df = spark.createDataFrame(rows, ["doc_id", "lang"])
    kept = corpus.stratified_sample(df, ["lang"], 0.25, key="doc_id", salt="s")
    by_lang = {r.lang: r.n for r in kept.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    totals = {r.lang: r.n for r in df.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    for lang, n in totals.items():
        assert by_lang[lang] == math.ceil(n * 0.25 - 1e-9)
    # partitioning-invariant membership (pure function of key+salt)
    again = corpus.stratified_sample(
        df.repartition(13), ["lang"], 0.25, key="doc_id", salt="s"
    )
    assert {r.doc_id for r in again.collect()} == {r.doc_id for r in kept.collect()}
    # matches the portable-hash reference rank per stratum
    for lang, n in totals.items():
        ids = [i for i, l in rows if l == lang]
        ids.sort(key=lambda i: (_draw(f"{i}s"), i))
        want = set(ids[: math.ceil(n * 0.25 - 1e-9)])
        got = {r.doc_id for r in kept.filter(F.col("lang") == lang).collect()}
        assert got == want


def test_matryoshka_full_rerank_equals_brute_force(spark, sf_dir):
    # with rerank_k >= corpus size stage 1 keeps everyone, so the
    # two-stage result must equal exact brute-force cosine top-k
    from odin_rs_spark.operators import similarity as sim
    from odin_rs_spark.sources.tables import load_table

    emb = load_table(spark, "embeddings", sf_dir)
    n = emb.count()
    q = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = {
        (r.query_id, r.vec_id, r.rank)
        for r in sim.cosine_topk(emb, q, k=3).collect()
    }
    two_stage = {
        (r.query_id, r.vec_id, r.rank)
        for r in sim.matryoshka_topk(
            emb, q, prefix_dim=16, rerank_k=n, k=3
        ).collect()
    }
    assert two_stage == exact


def test_matryoshka_coarse_recall_grows_with_rerank_k(spark, sf_dir):
    # the driver knob: recall@1 must be monotone-improving in rerank_k
    # and substantial once the coarse cut is generous. (The synthetic
    # embeddings are NOT Matryoshka-trained — a 16-dim prefix of random
    # directions keeps ~25% of the cosine signal — so the meaningful
    # invariant is the knob's shape, not an absolute recall bar.)
    from odin_rs_spark.operators import similarity as sim
    from odin_rs_spark.sources.tables import load_table

    emb = load_table(spark, "embeddings", sf_dir)
    q = emb.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact1 = {
        (r.query_id, r.vec_id)
        for r in sim.cosine_topk(emb, q, k=1).collect()
    }

    def recall(rk: int) -> float:
        approx = {
            (r.query_id, r.vec_id)
            for r in sim.matryoshka_topk(
                emb, q, prefix_dim=16, rerank_k=rk, k=1
            ).collect()
        }
        return len(exact1 & approx) / len(exact1)

    r20, r100 = recall(20), recall(100)
    assert r100 >= r20
    assert r100 >= 0.6


def test_quantize_int8_error_bound_and_cos(spark, sf_dir):
    # symmetric max-abs int8: per-element error is bounded by s/254 and
    # cosine preservation on real embeddings stays near 1
    import numpy as np

    from odin_rs_spark.operators import similarity as sim
    from odin_rs_spark.sources.tables import load_table

    emb = load_table(spark, "embeddings", sf_dir)
    X = np.array([r.embedding for r in emb.collect()], dtype=np.float64)
    s = np.abs(X).max(axis=0)
    out = sim.quantize_int8_stats(emb).collect()
    bound = float((s[s > 0] / 254.0).max()) + 1e-12
    for r in out:
        assert r.max_abs_err <= bound + 5e-7  # 6dp rounding slack
        assert r.avg_cos_keep > 0.999
    # cross-check one aggregate against the numpy reference
    with np.errstate(invalid="ignore"):
        Q = np.where(s > 0, np.floor(X / s * 127.0 + 0.5), 0.0)
        R = np.where(s > 0, Q * s / 127.0, 0.0)
    maxerr = np.abs(X - R).max()
    got_max = max(r.max_abs_err for r in out)
    assert abs(got_max - round(float(maxerr), 6)) <= 1e-9


def test_select_until_budget_matches_global_cumsum(spark):
    # distributed two-phase prefix sum == plain global-order cumsum,
    # regardless of how many range partitions the corpus splits into
    rows = [(i, (i * 37) % 100 + 1, (i * 13) % 50 + 1) for i in range(400)]
    df = spark.createDataFrame(rows, ["doc_id", "score", "tok"])
    ordered = sorted(rows, key=lambda r: (-r[1], r[0]))
    want, cum = set(), 0
    for i, _, tok in ordered:
        cum += tok
        if cum > 3000:
            break
        want.add(i)
    for nr in (1, 7, 32):
        kept = corpus.select_until_budget(
            df, "score", "tok", budget=3000, key="doc_id", num_ranges=nr
        )
        assert {r.doc_id for r in kept.collect()} == want, f"num_ranges={nr}"


def test_select_until_budget_boundary_doc_excluded(spark):
    # the doc that would overflow the budget is dropped, later smaller
    # docs are NOT back-filled (prefix semantics, not knapsack)
    df = spark.createDataFrame(
        [(1, 10, 40), (2, 9, 40), (3, 8, 40), (4, 7, 5)],
        ["doc_id", "score", "tok"],
    )
    kept = {r.doc_id for r in corpus.select_until_budget(
        df, "score", "tok", budget=85, key="doc_id", num_ranges=2
    ).collect()}
    assert kept == {1, 2}  # 40+40 fits; doc 3 overflows; doc 4 never reached


def test_int8_adc_topk_matches_numpy_reference(spark, sf_dir):
    import numpy as np

    from odin_rs_spark.operators import similarity as sim
    from odin_rs_spark.sources.tables import load_table

    emb = load_table(spark, "embeddings", sf_dir)
    rows = emb.collect()
    X = np.array([r.embedding for r in rows], dtype=np.float64)
    ids = np.array([r.vec_id for r in rows])
    s = np.abs(X).max(axis=0)
    with np.errstate(invalid="ignore"):
        R = np.where(s > 0, np.floor(X / s * 127.0 + 0.5) * s / 127.0, 0.0)
    q = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    got = {
        (r.query_id, r.vec_id, r.rank)
        for r in sim.int8_adc_topk(emb, q, k=3).collect()
    }
    want = set()
    for r in rows:
        if r.vec_id >= 3:
            continue
        qv = np.array(r.embedding, dtype=np.float64)
        mask = ids != r.vec_id
        cos = (R[mask] @ qv) / (
            np.linalg.norm(R[mask], axis=1) * np.linalg.norm(qv)
        )
        order = sorted(zip(-cos, ids[mask]))
        for rank, (_, vid) in enumerate(order[:3], 1):
            want.add((r.vec_id, int(vid), rank))
    assert got == want


def test_int8_adc_injected_scales_match_derived(spark, sf_dir):
    import numpy as np

    from odin_rs_spark.operators import similarity as sim
    from odin_rs_spark.sources.tables import load_table

    emb = load_table(spark, "embeddings", sf_dir)
    X = np.array([r.embedding for r in emb.collect()], dtype=np.float64)
    scales = [float(v) for v in np.abs(X).max(axis=0)]
    q = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    derived = sim.int8_adc_topk(emb, q, k=3).collect()
    injected = sim.int8_adc_topk(emb, q, k=3, scales=scales).collect()
    key = lambda r: (r.query_id, r.rank)
    assert sorted([(r.query_id, r.vec_id, r.rank) for r in derived]) == sorted(
        [(r.query_id, r.vec_id, r.rank) for r in injected]
    )


def test_shingle_oracle_short_doc_parity(spark):
    """Regression (round-3 review): the oracle shingle CTEs used
    `w[i] || ' ' || w[i+1] || ...`, which NULLs out for sub-3-word docs
    (DuckDB strips the NULL, leaving an EMPTY shingle set) while Spark's
    try_element_at + concat_ws yields the whole-text shingle. The
    list_slice form must agree with Spark on exactly these docs."""
    import duckdb
    import pandas as pd

    from odin_rs_spark.operators.dedup import containment_join_pairs
    from odin_rs_spark.plans.catalog import Q106_SQL

    docs = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4],
            "text": ["alpha beta", "alpha beta", "alpha beta gamma delta", "solo"],
        }
    )
    con = duckdb.connect()
    con.register("documents", docs)
    d_rows = {(a, b, round(c, 9)) for a, b, c in con.sql(Q106_SQL).fetchall()}
    sdf = spark.createDataFrame(docs)
    s_rows = {
        (r.id_a, r.id_b, round(r.containment, 9))
        for r in containment_join_pairs(sdf, threshold=0.6).collect()
    }
    assert s_rows == d_rows
    # the defining case: two identical 2-word docs must pair up (the old
    # CTE silently dropped them)
    assert (1, 2, 1.0) in s_rows and (2, 1, 1.0) in s_rows


def test_center_embeddings_geometry(spark, sf_dir):
    import numpy as np

    from odin_rs_spark.operators import similarity as sim
    from odin_rs_spark.sources.tables import load_table

    emb = load_table(spark, "embeddings", sf_dir)
    out = sim.center_embeddings(emb, renormalize=True).collect()
    X = np.array([r.embedding for r in out], dtype=np.float64)
    C = np.array([r.centered for r in out], dtype=np.float64)
    mu = X.mean(axis=0)
    R = X - mu
    nz = np.linalg.norm(R, axis=1) > 0
    R[nz] = R[nz] / np.linalg.norm(R[nz], axis=1, keepdims=True)
    assert np.allclose(C, R, atol=1e-9)
    # unit norms and (near-)zero mean direction after centering
    assert np.allclose(np.linalg.norm(C[nz], axis=1), 1.0, atol=1e-9)
    # injected means path matches derived
    injected = sim.center_embeddings(
        emb, means=[float(m) for m in mu], renormalize=True
    ).collect()
    C2 = np.array([r.centered for r in injected], dtype=np.float64)
    assert np.allclose(C, C2, atol=0)


def test_center_embeddings_rejects_wrong_means_length(spark, sf_dir):
    import pytest as _pytest

    from odin_rs_spark.operators import similarity as sim
    from odin_rs_spark.sources.tables import load_table

    emb = load_table(spark, "embeddings", sf_dir)
    with _pytest.raises(ValueError, match="dimensions"):
        sim.center_embeddings(emb, means=[0.0] * 63)


def test_embedding_ops_empty_corpus_no_crash(spark):
    from pyspark.sql.types import (
        ArrayType,
        FloatType,
        IntegerType,
        LongType,
        StructField,
        StructType,
    )

    from odin_rs_spark.operators import similarity as sim

    schema = StructType(
        [
            StructField("vec_id", LongType()),
            StructField("embedding", ArrayType(FloatType())),
            StructField("label", IntegerType()),
        ]
    )
    empty = spark.createDataFrame([], schema)
    assert sim.center_embeddings(empty).count() == 0
    assert sim.quantize_int8_stats(empty).count() == 0


def test_sketch_builds_tolerate_null_keys(spark):
    """NULL keys hash to NULL positions; the builds must drop them
    instead of emitting NULL-index rows that crash the probes' dense
    fill (round-3 review finding)."""
    from odin_rs_spark.operators.dedup import bloom_build, bloom_probe
    from odin_rs_spark.operators.sketches import cms_build, cms_query

    keys = spark.createDataFrame(
        [("a",), ("b",), (None,), ("a",)], ["k"]
    )
    bloom = bloom_build(keys, "k", m_bits=6000, k=3)
    probed = bloom_probe(
        spark.createDataFrame([("a",), ("zz",)], ["k"]), "k", bloom,
        m_bits=6000, k=3,
    ).collect()
    got = {r.k: r.maybe_member for r in probed}
    assert got["a"] is True  # present key must hit (no false negatives)
    cms = cms_build(keys, "k", width=64, depth=3)
    est = {
        r.k: r.cms_est
        for r in cms_query(
            spark.createDataFrame([("a",), ("b",)], ["k"]), "k", cms,
            width=64, depth=3,
        ).collect()
    }
    assert est["a"] >= 2 and est["b"] >= 1  # never underestimates


def test_greedy_kcenter_covers_clusters(spark):
    """Three tight clusters + k=3 must pick one exemplar per cluster
    (farthest-point never picks two from the same tight cluster before
    covering the others); seed is the min id; dist decreases
    monotonically after rank 1."""
    from odin_rs_spark.operators.similarity import greedy_kcenter_select

    pts = []
    for cid, base in enumerate([0.0, 10.0, 20.0]):
        for j in range(5):
            pts.append((cid * 10 + j, [base + j * 0.01, base - j * 0.01]))
    emb = spark.createDataFrame(pts, "vec_id long, embedding array<double>")
    sel = greedy_kcenter_select(emb, k=3).collect()
    assert [r.sel_rank for r in sel] == [0, 1, 2]
    assert sel[0].vec_id == 0 and sel[0].dist == 0.0
    clusters = {r.vec_id // 10 for r in sel}
    assert clusters == {0, 1, 2}
    assert sel[1].dist >= sel[2].dist


def test_greedy_kcenter_k_exceeds_n(spark):
    from odin_rs_spark.operators.similarity import greedy_kcenter_select

    emb = spark.createDataFrame(
        [(1, [0.0, 0.0]), (2, [1.0, 1.0])], "vec_id long, embedding array<double>"
    )
    sel = greedy_kcenter_select(emb, k=5).collect()
    assert [r.vec_id for r in sel] == [1, 2]  # stops when exhausted


def test_source_minhash_signature_merges(spark):
    """Corpus-level MinHash (dedup.source_signatures): sig(A∪B) must
    equal the elementwise min of sig(A) and sig(B) — the mergeability
    that makes per-shard sketches foldable without re-reading text."""
    from odin_rs_spark.operators import dedup as dd

    docs = [(i, "a", f"alpha w{i} beta w{i+1} gamma w{i+2} delta") for i in range(8)]
    docs += [(i + 100, "b", f"alpha w{i*3} beta w{i*3+1} gamma w{i*3+2} delta") for i in range(8)]
    df = spark.createDataFrame(docs, "doc_id long, source string, text string")
    both = df.withColumn("source", F.lit("ab"))
    sep = {(r.source, r.pos): r.v for r in dd.source_signatures(df, 16).collect()}
    uni = {r.pos: r.v for r in dd.source_signatures(both, 16).collect()}
    for pos in range(16):
        assert uni[pos] == min(sep[("a", pos)], sep[("b", pos)])


def test_source_jaccard_matrix_exact_and_estimate(spark):
    from odin_rs_spark.operators import dedup as dd

    # source b = source a's text verbatim (same shingle set), source c
    # disjoint -> exact jaccard 1.0 / 0.0, and the estimate must agree
    # at the extremes (identical sets -> identical signatures)
    rows = [
        (1, "a", "one two three four five six seven eight"),
        (2, "b", "one two three four five six seven eight"),
        (3, "c", "nine ten eleven twelve thirteen fourteen fifteen"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = {(r.source_a, r.source_b): r for r in dd.source_jaccard_matrix(df, 32).collect()}
    assert set(out) == {("a", "b"), ("a", "c"), ("b", "c")}
    ab, ac = out[("a", "b")], out[("a", "c")]
    assert ab.jaccard_exact == 1.0 and ab.jaccard_est == 1.0 and ab.agree == 32
    assert ac.jaccard_exact == 0.0 and ac.n_inter == 0


def test_weighted_sample_aes_semantics(spark):
    """A-ES: deterministic, without replacement, and weight-monotone —
    scaling every weight by a constant changes nothing, while a row
    with overwhelming weight is (essentially) always selected."""
    import hashlib
    import math

    from odin_rs_spark.operators.corpus import weighted_sample

    rows = [(i, float(1 + (i * 7) % 13)) for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id long, w double")
    got = weighted_sample(df, 10, "w").collect()
    assert len(got) == 10 and len({r.doc_id for r in got}) == 10
    # replay the clock formula row by row (the oracle's view)
    def clock(i, w):
        h = int(hashlib.md5(f"{i}wsample".encode()).hexdigest()[:15], 16)
        return -math.log((h + 0.5) / 2**60) / w
    want = sorted(rows, key=lambda r: clock(*r))[:10]
    assert {r.doc_id for r in got} == {i for i, _ in want}
    for r in got:
        assert r.clock == pytest.approx(clock(r.doc_id, r.w), rel=1e-12)
    # scale invariance of the selected SET (clocks all scale by 1/c)
    df2 = df.withColumn("w", F.col("w") * 1000.0)
    got2 = {r.doc_id for r in weighted_sample(df2, 10, "w").collect()}
    assert got2 == {r.doc_id for r in got}
    # zero/negative weights are never selected
    df3 = df.withColumn("w", F.when(F.col("doc_id") < 55, -1.0).otherwise(F.col("w")))
    got3 = {r.doc_id for r in weighted_sample(df3, 5, "w").collect()}
    assert got3 == {55, 56, 57, 58, 59}


def test_lsh_band_plan_scurve(spark):
    """Planner facts: P is monotone in J, b=num_perm (r=1) is the most
    permissive plan, and the reference values match closed form."""
    from odin_rs_spark.operators.dedup import lsh_band_plan

    out = lsh_band_plan(spark, 16, (0.5, 0.8)).collect()
    rows = {(r.bands, r.rows_per_band, r.j): r for r in out}
    assert len(rows) == 5 * 2  # divisors of 16 x 2 J levels
    # closed form at (b=4, r=4): P = 1-(1-j^4)^4
    got = rows[(4, 4, 0.8)]
    assert got.p_candidate == pytest.approx(1 - (1 - 0.8**4) ** 4)
    assert got.j_threshold == pytest.approx((1 / 4) ** (1 / 4))
    # monotone in J for fixed (b, r)
    assert rows[(4, 4, 0.8)].p_candidate > rows[(4, 4, 0.5)].p_candidate
    # r=1 catches everything more often than r=16
    assert rows[(16, 1, 0.5)].p_candidate > rows[(1, 16, 0.5)].p_candidate
