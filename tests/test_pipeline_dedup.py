"""MinHash/LSH near-dedup unit coverage (beyond the rows-only driver check).

Reference scope: the dedup tier list is an extended-surface component
(SURVEY.md §7 step 9), not a graphouse parity item — tests pin the
algorithmic contract: identical docs always collide, near-identical
docs exceed the threshold, unrelated docs don't surface.
"""

import pytest
from pyspark.sql import functions as F

from graphouse_spark.functions.dedup import (
    exact_duplicates,
    minhash_near_duplicates,
    minhash_signatures,
    ngram_jaccard_pairs,
)

BASE = (
    "the quick brown fox jumps over the lazy dog while the cat watches "
    "from the warm windowsill and the birds sing in the garden outside"
)


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (1, BASE),
        (2, BASE),  # exact duplicate of 1
        (3, BASE.replace("lazy", "sleepy")),  # near-duplicate of 1
        (4, "completely unrelated text about spark query planning and shuffles "
            "with adaptive execution and broadcast joins everywhere today"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_signatures_deterministic_and_equal_for_equal_text(spark, corpus):
    sigs = {r["doc_id"]: r["signature"] for r in minhash_signatures(corpus).collect()}
    assert sigs[1] == sigs[2]
    assert len(sigs[1]) == 64
    assert sigs[1] != sigs[4]
    again = {r["doc_id"]: r["signature"] for r in minhash_signatures(corpus).collect()}
    assert again == sigs  # fixed-seed hash family: stable across runs


def test_near_duplicates_found_and_unrelated_excluded(spark, corpus):
    pairs = {(r["id_a"], r["id_b"]): r["est_jaccard"]
             for r in minhash_near_duplicates(corpus, threshold=0.5).collect()}
    assert pairs[(1, 2)] == 1.0  # identical docs collide in every band
    assert (1, 3) in pairs and pairs[(1, 3)] >= 0.5  # one-word edit stays similar
    assert not any(4 in p for p in pairs)  # unrelated doc never surfaces


def test_exact_tier_counts_copies(spark, corpus):
    out = {r["keep_id"]: r["n_copies"] for r in exact_duplicates(corpus).collect()}
    assert out[1] == 2 and out[3] == 1 and out[4] == 1


def test_ngram_jaccard_hand_value(spark):
    # doc 1: tokens a b c d -> shingles {a b c, b c d}; doc 2: a b c e -> {a b c, b c e}
    # intersection 1, union 3 -> jaccard 1/3
    df = spark.createDataFrame([(1, "a b c d"), (2, "a b c e")], ["doc_id", "text"])
    rows = ngram_jaccard_pairs(df, threshold=0.1).collect()
    assert len(rows) == 1
    assert rows[0]["jaccard"] == pytest.approx(1 / 3, abs=1e-6)


@pytest.mark.parametrize("strategy", ["catalyst", "arrow"])
def test_winnowing_guarantee(spark, strategy):
    """Any shared substring of length >= k + window - 1 must produce at
    least one shared fingerprint (the winnowing paper's core property)
    — in both physical strategies."""
    from graphouse_spark.functions.text import winnow_overlap_pairs

    k, w = 8, 4
    shared = "zqxjkvbw unique shared run"  # 26 chars > k + w - 1 = 11
    docs = spark.createDataFrame(
        [(1, "left padding text " + shared), (2, shared + " right padding text"),
         (3, "no such run anywhere in this document at all")],
        ["doc_id", "text"],
    )
    pairs = {(r["id_a"], r["id_b"]) for r in
             winnow_overlap_pairs(docs, k=k, window=w, min_shared=1,
                                  strategy=strategy).collect()}
    assert (1, 2) in pairs
    assert (1, 3) not in pairs and (2, 3) not in pairs


def test_winnowing_deterministic_and_subset_sized(spark):
    from pyspark.sql import functions as F

    from graphouse_spark.functions.text import winnowing_fingerprints

    docs = spark.createDataFrame([(1, BASE)], ["doc_id", "text"])
    a = winnowing_fingerprints(docs).collect()[0]["fingerprints"]
    b = winnowing_fingerprints(docs).collect()[0]["fingerprints"]
    assert a == b and len(a) > 0
    # winnowing keeps roughly 2/(w+1) of the k-gram positions
    assert len(a) < len(BASE)


# ---------------------------------------------------------------- clusters

def test_connected_components_chain_and_islands(spark):
    """A 5-node chain (worst-case diameter) collapses to one component;
    a separate pair and the chain never merge; labels are min node id."""
    from graphouse_spark.functions.cluster import connected_components

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (10, 11)], ["id_a", "id_b"]
    )
    got = {r["node"]: r["component"] for r in connected_components(edges).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1, 10: 10, 11: 10}


def test_dedup_clusters_and_representatives(spark):
    from graphouse_spark.functions.cluster import cluster_representatives, dedup_clusters

    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(1, 8)], ["doc_id", "text"]
    )
    pairs = spark.createDataFrame([(1, 2), (2, 3), (5, 6)], ["id_a", "id_b"])
    clusters = dedup_clusters(pairs)
    rows = {r["doc_id"]: (r["cluster_id"], r["n_members"]) for r in clusters.collect()}
    assert rows == {1: (1, 3), 2: (1, 3), 3: (1, 3), 5: (5, 2), 6: (5, 2)}
    kept = sorted(r["doc_id"] for r in cluster_representatives(docs, clusters).collect())
    # representatives 1 and 5 survive; unclustered 4 and 7 survive
    assert kept == [1, 4, 5, 7]


def test_minhash_np_matches_engine_md5(spark):
    """The Arrow kernel reproduces the md5-family Catalyst fold bit-for-bit."""
    from graphouse_spark.functions.dedup import minhash_signatures, minhash_signatures_np

    docs = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog"),
         (2, "the quick brown fox jumps over the lazy cat"),
         (3, "completely different text with no overlap at all"),
         (4, "short"), (5, "  "), (6, "a b")],
        ["doc_id", "text"],
    )
    eng = {r["doc_id"]: r["signature"] for r in
           minhash_signatures(docs, hash_fn="md5").collect()}
    arw = {r["doc_id"]: r["signature"] for r in
           minhash_signatures_np(docs).collect()}
    assert eng == arw


def test_simhash_np_matches_engine_md5(spark):
    """The Arrow simhash kernel reproduces the md5-family fold
    bit-for-bit — including the empty-token doc (fingerprint 0), tie
    votes (strictly-positive wins a bit), and repeated tokens
    (distinct-token semantics)."""
    from graphouse_spark.functions.dedup import simhash, simhash_np

    docs = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog"),
         (2, "the quick brown fox jumps over the lazy cat"),
         (3, "completely different text with no overlap at all"),
         (4, "short"), (5, "  "), (6, "a b a b a"),
         (7, "ONE one OnE")],
        ["doc_id", "text"],
    )
    eng = {r["doc_id"]: r["simhash"] for r in
           simhash(docs, bits=60, hash_fn="md5").collect()}
    arw = {r["doc_id"]: r["simhash"] for r in
           simhash_np(docs, bits=60).collect()}
    assert eng == arw
    assert arw[5] == 0  # empty-token doc


def test_np_kernels_null_text_and_id_types(spark):
    """Round-10 ADVICE (medium): the Arrow kernels must match the engine
    twins on NULL text (NULL fingerprint/signature, never a hash of the
    literal 'None') and must preserve non-long id column types."""
    from graphouse_spark.functions.dedup import (
        minhash_signatures, minhash_signatures_np, simhash, simhash_np)

    docs = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, None), (3, "delta epsilon zeta")],
        "doc_id long, text string",
    )
    eng = {r["doc_id"]: r["simhash"] for r in
           simhash(docs, bits=60, hash_fn="md5").collect()}
    arw = {r["doc_id"]: r["simhash"] for r in simhash_np(docs).collect()}
    assert eng[2] is None and arw == eng
    eng_m = {r["doc_id"]: r["signature"] for r in
             minhash_signatures(docs, hash_fn="md5").collect()}
    arw_m = {r["doc_id"]: r["signature"] for r in
             minhash_signatures_np(docs).collect()}
    assert eng_m[2] is None and arw_m == eng_m

    # string ids flow through both kernels with their input type
    sdocs = spark.createDataFrame(
        [("a", "alpha beta gamma"), ("b", "delta epsilon zeta")],
        "doc_id string, text string",
    )
    sim = simhash_np(sdocs)
    assert dict(sim.dtypes)["doc_id"] == "string"
    assert {r["doc_id"] for r in sim.collect()} == {"a", "b"}
    sig = minhash_signatures_np(sdocs)
    assert dict(sig.dtypes)["doc_id"] == "string"
    assert {r["doc_id"] for r in sig.collect()} == {"a", "b"}


def test_minhash_arrow_rejects_foreign_hash_fn(spark):
    """strategy='arrow' implements exactly the md5 family: an explicit
    different hash_fn raises instead of silently returning md5 results;
    hash_fn=None resolves per strategy (engine->xxhash64, arrow->md5)."""
    import pytest as _pytest

    from graphouse_spark.functions.dedup import minhash_near_duplicates

    docs = spark.createDataFrame([(1, "a b c")], ["doc_id", "text"])
    with _pytest.raises(ValueError, match="md5 family"):
        minhash_near_duplicates(docs, strategy="arrow", hash_fn="xxhash64")
    # explicit md5 + arrow stays accepted
    minhash_near_duplicates(docs, strategy="arrow", hash_fn="md5")


# ---------------------------------------------------------------- sampling

def test_hash_sampling_deterministic_and_stratified(spark):
    from graphouse_spark.functions.sampling import (
        hash_sample, split_train_eval, stratified_hash_sample,
    )

    docs = spark.createDataFrame(
        [(i, f"t{i}", "src0" if i % 3 == 0 else "src1") for i in range(300)],
        ["doc_id", "text", "source"],
    )
    a = sorted(r["doc_id"] for r in hash_sample(docs, "doc_id", 0.2).collect())
    b = sorted(r["doc_id"] for r in hash_sample(docs, "doc_id", 0.2).collect())
    assert a == b and 0 < len(a) < 300            # stable, non-trivial subset
    salted = sorted(r["doc_id"] for r in hash_sample(docs, "doc_id", 0.2, salt="x").collect())
    assert salted != a                            # salt decorrelates
    # a 0.2 sample is a SUBSET of the 0.5 sample (monotone thresholds)
    big = set(r["doc_id"] for r in hash_sample(docs, "doc_id", 0.5).collect())
    assert set(a) <= big

    strat = stratified_hash_sample(docs, "doc_id", "source", {"src0": 1.0}, default_rate=0.0)
    got = {r["source"] for r in strat.collect()}
    assert got == {"src0"} and strat.count() == 100   # all of src0, none of src1

    split = split_train_eval(docs, "doc_id", 0.1)
    counts = {r["split"]: r["n"] for r in split.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert counts["eval"] + counts["train"] == 300 and 0 < counts["eval"] < 100


def test_simhash_banded_pairs_recall(spark):
    """Identical docs -> distance 0 pair; unrelated docs excluded; banded
    candidates never miss a pair within max_hamming (exact verify)."""
    from graphouse_spark.functions.dedup import simhash_near_duplicates

    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta"),
         (2, "alpha beta gamma delta epsilon zeta"),     # exact twin of 1
         (3, "alpha beta gamma delta epsilon theta"),    # near twin
         (4, "utterly unrelated words entirely distinct vocabulary")],
        ["doc_id", "text"],
    )
    got = {(r["id_a"], r["id_b"]): r["hamming"]
           for r in simhash_near_duplicates(docs, max_hamming=10).collect()}
    assert got[(1, 2)] == 0
    assert (1, 3) in got and got[(1, 3)] <= 10
    assert not any(4 in p for p in got)


def test_pack_sequences_invariants(spark):
    """Every doc assigned once; no shard exceeds the budget except a
    single oversized doc; offsets tile each shard without overlap."""
    from graphouse_spark.functions.packing import pack_sequences

    docs = spark.createDataFrame(
        [(i, "tok " * (10 * (i % 7) + 1)) for i in range(1, 41)] + [(99, "x " * 500)],
        ["doc_id", "text"],
    )
    out = pack_sequences(docs, budget=100, n_groups=4).collect()
    assert sorted(r["doc_id"] for r in out) == sorted([*range(1, 41), 99])

    by_shard: dict = {}
    for r in out:
        by_shard.setdefault(r["shard_id"], []).append(r)
    for shard, rows in by_shard.items():
        total = sum(r["n_tokens"] for r in rows)
        if len(rows) == 1:
            continue  # single oversized doc allowed
        assert total <= 100, f"{shard} over budget: {total}"
        spans = sorted((r["offset"], r["offset"] + r["n_tokens"]) for r in rows)
        for (s1, e1), (s2, _) in zip(spans, spans[1:]):
            assert e1 <= s2, f"{shard} overlapping spans"

    # determinism: same input -> same shards
    again = {r["doc_id"]: (r["shard_id"], r["offset"])
             for r in pack_sequences(docs, budget=100, n_groups=4).collect()}
    assert again == {r["doc_id"]: (r["shard_id"], r["offset"]) for r in out}


def test_edit_distance_pairs_blocking_recall(spark):
    """Segment blocking must not lose pairs — including equal-length
    insert+delete shifts at k=2 (positions move, pigeonhole window
    catches them)."""
    from graphouse_spark.functions.fuzzy import edit_distance_pairs

    rows = [
        (1, "abcdefgh"), (2, "abcdefgX"),   # 1 substitution
        (3, "Xabcdefg"),                    # del front + ins back vs 1: dist 2
        (4, "abXdefgh"),                    # 1 substitution vs 1
        (5, "zzzzzzzz"),                    # unrelated
        (6, "abcd"), (7, "abXd"),           # different length group
    ]
    df = spark.createDataFrame(rows, ["id", "name"])
    got = {(r["id_a"], r["id_b"]): r["dist"]
           for r in edit_distance_pairs(df, "name", "id", max_dist=2).collect()}
    assert got[(1, 2)] == 1 and got[(1, 4)] == 1 and got[(6, 7)] == 1
    assert got[(1, 3)] == 2                  # shifted pair found despite blocking
    assert got[(2, 4)] == 2
    assert not any(5 in p for p in got)
    # a length mismatch never pairs in the equal-length variant
    assert not any((a in (6, 7)) != (b in (6, 7)) for a, b in got)


def test_dsir_weights_hand_math(spark):
    import hashlib

    from graphouse_spark.functions.sampling import dsir_log_ratio_table, dsir_weights

    table = dsir_log_ratio_table()
    docs = spark.createDataFrame(
        [(1, "Alpha beta  ALPHA"), (2, "")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["weight_milli"] for r in dsir_weights(docs).collect()}

    def lr(tok):
        return table[int(hashlib.md5(tok.encode()).hexdigest()[:8], 16) % 1024]

    # lowercased, multiplicity counts: alpha twice, beta once; empty doc -> 0
    assert got[1] == 2 * lr("alpha") + lr("beta")
    assert got[2] == 0


def test_dsir_table_is_md5_derived(spark):
    import hashlib

    from graphouse_spark.functions.sampling import dsir_log_ratio_table

    t = dsir_log_ratio_table(buckets=8, salt="s")
    expect = [int(hashlib.md5(f"s-{b}".encode()).hexdigest()[:8], 16) % 2001 - 1000
              for b in range(8)]
    assert t == expect
    assert all(-1000 <= v <= 1000 for v in t)


def test_duplicated_spans_merging_and_threshold(spark):
    from graphouse_spark.functions.text import duplicated_spans

    rows = [
        (1, "the quick brown fox jumps over the lazy dog end one"),
        (2, "prefix words the quick brown fox jumps over the lazy dog and more"),
        (3, "totally unrelated text with nothing shared at all here ok"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: (r["span_start"], r["span_end"], r["n_windows"])
           for r in duplicated_spans(df, n=4, min_docs=2).collect()}
    # 9 shared tokens -> 6 four-token windows, merged into ONE span
    assert out[1] == (0, 8, 6)
    assert out[2] == (2, 10, 6)   # same span, shifted by the 2-token prefix
    assert 3 not in out           # nothing shared

    # min_docs above the duplication level -> empty
    assert duplicated_spans(df, n=4, min_docs=3).count() == 0

    # two disjoint shared regions stay two spans
    rows2 = [
        (1, "alpha beta gamma delta X epsilon zeta eta theta"),
        (2, "alpha beta gamma delta Y epsilon zeta eta theta"),
    ]
    df2 = spark.createDataFrame(rows2, "doc_id long, text string")
    spans = sorted((r["span_start"], r["span_end"])
                   for r in duplicated_spans(df2, n=4, min_docs=2)
                   .filter("doc_id = 1").collect())
    assert spans == [(0, 3), (5, 8)]


def test_incremental_exact_dedup(spark, tmp_path):
    """Cross-batch manifest dedup: later batches never re-admit content;
    in-batch dups keep min id; replays are harmless."""
    from graphouse_spark.functions.dedup import incremental_exact_dedup

    manifest = str(tmp_path / "manifest")

    def mk(rows):
        return spark.createDataFrame(rows, "doc_id long, text string")

    b1 = mk([(1, "alpha"), (2, "beta"), (3, "alpha")])  # 3 = in-batch dup
    fresh1, prior1, commit1 = incremental_exact_dedup(b1, manifest)
    assert prior1 == 0
    assert {r["doc_id"] for r in fresh1.collect()} == {1, 2}
    commit1()

    b2 = mk([(10, "alpha"), (11, "gamma"), (12, "beta"), (13, "gamma")])
    fresh2, prior2, commit2 = incremental_exact_dedup(b2, manifest)
    assert prior2 == 2
    assert {r["doc_id"] for r in fresh2.collect()} == {11}
    commit2()

    # replaying batch 2 admits nothing and leaves the manifest sane
    fresh3, prior3, commit3 = incremental_exact_dedup(b2, manifest)
    assert prior3 == 3
    assert fresh3.count() == 0
    commit3()
    n_hashes = spark.read.parquet(manifest).select("md5").distinct().count()
    assert n_hashes == 3  # alpha, beta, gamma


def test_lsh_tune():
    from graphouse_spark.functions.dedup import lsh_tune

    assert lsh_tune(64, 0.5) == (16, 4)     # (1/16)^(1/4) = 0.5 exactly
    assert lsh_tune(128, 0.5) == (32, 4)    # (1/32)^(1/4) ~ 0.42... check below
    for n, t in [(64, 0.3), (64, 0.8), (128, 0.9), (100, 0.6)]:
        b, r = lsh_tune(n, t)
        assert b * r == n
        curve_t = (1.0 / b) ** (1.0 / r)
        # no other factorization sits closer to the target
        for b2 in range(1, n + 1):
            if n % b2 == 0:
                t2 = (1.0 / b2) ** (1.0 / (n // b2))
                assert abs(curve_t - t) <= abs(t2 - t) + 1e-12
    import pytest as _pt
    with _pt.raises(ValueError):
        lsh_tune(64, 1.5)


def test_incremental_minhash_dedup(spark, tmp_path):
    """Cross-batch near-dup: batch 2 drops docs near-duplicating batch 1
    content (without re-reading batch 1 text); in-batch min id wins;
    replays admit nothing new."""
    from graphouse_spark.functions.dedup import incremental_minhash_dedup

    idx = str(tmp_path / "lsh_index")
    base = "the quick brown fox jumps over the lazy dog again and again today"
    near = base.replace("today", "tonight")          # 1-token edit: near-dup
    far = "completely different words about spark engines and parquet files"

    def mk(rows):
        return spark.createDataFrame(rows, "doc_id long, text string")

    b1 = mk([(1, base), (2, near), (3, far)])
    fresh1, n1, commit1 = incremental_minhash_dedup(b1, idx, threshold=0.5)
    assert n1 == 0
    assert {r["doc_id"] for r in fresh1.collect()} == {1, 3}  # 2 ~ 1, min wins
    commit1()

    # batch 2: another near-dup of base + genuinely new content
    b2 = mk([(10, base.replace("dog", "cat")),
             (11, "fresh unseen sentence with novel vocabulary entirely")])
    fresh2, n2, commit2 = incremental_minhash_dedup(b2, idx, threshold=0.5)
    assert n2 == 2
    assert {r["doc_id"] for r in fresh2.collect()} == {11}
    commit2()

    # replay of batch 2: 11's content is now indexed -> nothing fresh
    fresh3, n3, commit3 = incremental_minhash_dedup(b2, idx, threshold=0.5)
    assert n3 == 3
    assert fresh3.count() == 0
    commit3()


def test_incremental_dedup_crash_before_commit_loses_nothing(spark, tmp_path):
    """Output-first commit contract: a batch that crashes after the
    dedup ran but BEFORE commit() (i.e. before its output was durably
    written) must be fully re-admittable on retry — the old
    manifest-first order permanently dropped those documents."""
    from graphouse_spark.functions.dedup import (
        incremental_exact_dedup,
        incremental_minhash_dedup,
    )

    def mk(rows):
        return spark.createDataFrame(rows, "doc_id long, text string")

    manifest = str(tmp_path / "manifest")
    b1 = mk([(1, "alpha"), (2, "beta")])
    fresh, _, commit = incremental_exact_dedup(b1, manifest)
    assert fresh.count() == 2
    # CRASH: commit never called -> no manifest. Retry must re-admit.
    retry, prior, commit = incremental_exact_dedup(b1, manifest)
    assert prior == 0
    assert {r["doc_id"] for r in retry.collect()} == {1, 2}
    commit()
    again, prior, _ = incremental_exact_dedup(b1, manifest)
    assert prior == 2 and again.count() == 0

    idx = str(tmp_path / "lsh_index")
    text = "the quick brown fox jumps over the lazy dog again and again"
    bm = mk([(1, text)])
    fresh, _, commit = incremental_minhash_dedup(bm, idx, threshold=0.5)
    assert fresh.count() == 1
    # CRASH before commit -> index absent, retry re-admits
    retry, n, commit = incremental_minhash_dedup(bm, idx, threshold=0.5)
    assert n == 0 and retry.count() == 1
    commit()
    again, n, _ = incremental_minhash_dedup(bm, idx, threshold=0.5)
    assert n == 1 and again.count() == 0


def test_components_driver_path_matches_iterative(spark):
    """The size-gated union-find finisher must label exactly like the
    distributed min-label loop (same canonical min-id components)."""
    from graphouse_spark.functions.cluster import connected_components

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 6), (9, 9), (10, 3), (7, 6)],
        "id_a long, id_b long")
    it = {tuple(r) for r in
          connected_components(edges, driver_threshold=0).collect()}
    dr = {tuple(r) for r in connected_components(edges).collect()}
    assert it == dr
    assert dict(dr)[10] == 1 and dict(dr)[7] == 5


def test_simhash_dedup_clusters_matches_pair_graph(spark):
    """Collapsing identical fingerprints before the banded join and
    the components loop must be a pure optimization: bit-identical
    rows to dedup_clusters(simhash_near_duplicates(docs))."""
    from graphouse_spark.functions.cluster import (
        dedup_clusters,
        simhash_dedup_clusters,
    )
    from graphouse_spark.functions.dedup import simhash_near_duplicates

    rows = []
    # exact-dup cliques + near-dup chains + singletons
    for i in range(30):
        rows.append((i, f"alpha beta gamma delta {'x' if i % 7 == 0 else ''}"))
    for i in range(30, 40):
        rows.append((i, "totally unique text %d %d" % (i * 17, i * 31)))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    old = {tuple(r) for r in dedup_clusters(
        simhash_near_duplicates(docs, max_hamming=2)).collect()}
    new = {tuple(r) for r in
           simhash_dedup_clusters(docs, max_hamming=2).collect()}
    assert old == new and old


def test_gopher_rules_boundaries(spark):
    """Each published Gopher rule trips on a purpose-built document;
    a plain healthy paragraph passes all seven."""
    from graphouse_spark.functions.text import gopher_rules

    healthy = ("the cat and the dog have been to the park of the town "
               "and that was good for them with many other friendly "
               "animals around " * 3)
    docs = [
        (1, healthy),
        (2, "the of and to be"),                      # < 50 words
        (3, " ".join(["a"] * 60) + " the of"),        # mean word len < 3
        (4, healthy + " " + "#tag " * 40),            # symbol ratio > 0.1
        (5, "\n".join(f"- item {i} of the list that we have" for i in range(10))),  # bullets
        (6, "\n".join(f"the sentence {i} of the story trails off..." for i in range(10))),  # ellipses
        (7, " ".join(["1234"] * 60) + " the of and"), # alpha ratio < 0.8
        (8, " ".join(["lorem", "ipsum", "dolor", "amet", "consectetur"] * 12)),  # no stop words
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r["doc_id"]: r.asDict() for r in gopher_rules(df).collect()}
    assert got[1]["gopher_pass"] is True
    assert got[2]["rule_word_count"] is False
    assert got[3]["rule_mean_word_len"] is False
    assert got[4]["rule_symbol_ratio"] is False
    assert got[5]["rule_bullet_lines"] is False
    assert got[6]["rule_ellipsis_lines"] is False
    assert got[7]["rule_alpha_words"] is False
    assert got[8]["rule_stop_words"] is False
    for i in range(2, 9):
        assert got[i]["gopher_pass"] is False
    # signal sanity on the healthy doc
    assert got[1]["stop_hits"] >= 2 and got[1]["alpha_ratio"] > 0.9


def test_c4_filters_boundaries(spark):
    """Each published C4 rule trips on a purpose-built document."""
    from graphouse_spark.functions.text import c4_filters

    good_line = "this is a perfectly reasonable sentence for the corpus."
    docs = [
        (1, "\n".join([good_line] * 4)),                       # keeps
        (2, "\n".join([good_line] * 2)),                       # < 3 kept lines
        (3, "\n".join([good_line] * 3) + "\nfunction() { return 1; }"),  # brace
        (4, "\n".join([good_line] * 3) + "\nLorem Ipsum dolor sit amet."),  # lorem
        (5, "\n".join([good_line] * 3) + "\nplease enable JavaScript to view this page."),  # js line
        (6, "\n".join([good_line] * 3 + ["no terminal punctuation here",
                                         "too short."])),      # line rules
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r["doc_id"]: r.asDict() for r in c4_filters(df).collect()}
    assert got[1]["c4_keep"] is True
    assert got[1]["clean_text"].count("\n") == 3
    assert got[2]["c4_keep"] is False and got[2]["clean_text"] is None
    assert got[3]["has_brace"] is True and got[3]["c4_keep"] is False
    assert got[4]["has_lorem"] is True and got[4]["c4_keep"] is False
    # the C4 paper drops the javascript LINE, not the document: the
    # flag is set, the offending line (punctuated, 7 words) vanishes
    # from clean_text, and the doc survives on its 3 good lines
    assert got[5]["has_javascript"] is True and got[5]["c4_keep"] is True
    assert got[5]["n_kept_lines"] == 3
    assert "javascript" not in got[5]["clean_text"].lower()
    # doc 6: the unpunctuated line and the 2-word line both drop, the
    # three good lines survive -> keep, with exactly 3 lines
    assert got[6]["c4_keep"] is True and got[6]["n_kept_lines"] == 3


def test_duplicate_line_stats_hand_math(spark):
    from graphouse_spark.functions.text import duplicate_line_stats

    text = "aaaa\nbb\naaaa\ncccc\n\npara two\n\npara two"
    # lines: aaaa x2 (4 ch), bb, cccc, 'para two' x2 (8 ch)
    #   -> 4/6 duplicated by count, (8+16)/30 by chars
    # paras (blank-line split): 'aaaa\nbb\naaaa\ncccc' (17 ch with
    #   newlines), 'para two' x2 -> 2/3 by count, 16/33 by chars
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    r = duplicate_line_stats(df).collect()[0]
    assert r["n_lines"] == 6 and r["dup_line_frac"] == round(4 / 6, 6)
    assert r["dup_line_char_frac"] == round(24 / 30, 6)
    assert r["n_paras"] == 3 and r["dup_para_frac"] == round(2 / 3, 6)
    assert r["dup_para_char_frac"] == round(16 / 33, 6)


def test_quality_rulepacks_fused_plan_and_selection(spark):
    """The fused gate: selectable packs, composed quality_pass, and —
    the point of the fusion — the shuffle-free gopher+c4 combination
    stays ONE exchange-free projection over one scan."""
    from graphouse_spark.functions.text import (
        c4_filters, gopher_rules, quality_rulepacks)

    good = "this is a perfectly reasonable sentence for the corpus."
    docs = [(1, "\n".join([good] * 4)),
            (2, "\n".join([good] * 2) + "\nrepeat me\nrepeat me\nrepeat me")]
    df = spark.createDataFrame(docs, "doc_id long, text string")

    both = {r["doc_id"]: r.asDict()
            for r in quality_rulepacks(df).collect()}
    # pack columns agree with the standalone operators
    g = {r["doc_id"]: r.asDict() for r in gopher_rules(df).collect()}
    c = {r["doc_id"]: r.asDict() for r in c4_filters(df).collect()}
    for i in (1, 2):
        for k, v in g[i].items():
            assert both[i][k] == v, k
        for k, v in c[i].items():
            assert both[i][k] == v, k
        assert both[i]["quality_pass"] == (
            both[i]["gopher_pass"] and both[i]["c4_keep"]
            and both[i]["rule_dup_lines"] and both[i]["rule_dup_line_chars"]
            and both[i]["rule_dup_paras"] and both[i]["rule_dup_para_chars"])

    # pack selection drops the other packs' columns
    only_g = quality_rulepacks(df, packs=("gopher",))
    assert "c4_keep" not in only_g.columns
    assert "dup_line_frac" not in only_g.columns
    assert {r["doc_id"]: r["quality_pass"] for r in only_g.collect()} == {
        i: g[i]["gopher_pass"] for i in (1, 2)}
    import pytest as _pytest
    with _pytest.raises(ValueError, match="rule-pack"):
        quality_rulepacks(df, packs=("nope",))

    # shuffle-free fusion: gopher+c4 plan has no exchange and one scan
    plan = (quality_rulepacks(df, packs=("gopher", "c4"))
            ._jdf.queryExecution().executedPlan().toString())
    assert "Exchange" not in plan
    assert plan.count("Scan") <= 1
