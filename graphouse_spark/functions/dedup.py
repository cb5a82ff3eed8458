"""Document deduplication at pipeline scale.

Four tiers, cheapest first (all shuffle-key on content hashes so the
plan scales linearly with corpus size, never with pair count):

- exact:        md5 hash-groupBy (one shuffle).
- near (minhash+LSH): shingle -> 64 minhashes -> bands -> bucket join;
  only in-bucket candidate pairs are verified. Classic MMDS recipe;
  pair cost ~ number of true-ish candidates, not n^2.
- near (simhash): 64-bit sign-sum of token hashes; Hamming-adjacent
  buckets collide. One pass, no joins, good as a blocking key.
- n-gram Jaccard: exact verification on shingle sets, via a shingle
  equi-join (only pairs sharing a shingle are ever materialized).

Everything is built-in expressions (xxhash64 / md5 / array ops) — no
Python in the hot path.
"""

from __future__ import annotations

import random

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: entry caps for the per-task hash memos (guide §5): bound Python
#: worker RSS on high-cardinality splits; captured at plan-build time
#: so tests can shrink them. The row-cache cap is lower — each simhash
#: entry holds a 64-element int64 row (~0.5 KB).
_MEMO_CAP = 1 << 20
_ROWCACHE_CAP = 1 << 18


def exact_duplicates(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact dedup: one row per distinct content hash.

    Returns (md5, keep_id = min doc id, n_copies).
    """
    return (
        docs.select(F.md5(F.col(text_col)).alias("md5"), F.col(id_col))
        .groupBy("md5")
        .agg(F.min(id_col).alias("keep_id"), F.count(F.lit(1)).alias("n_copies"))
    )


def word_shingles(text: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles of the normalized text."""
    toks = F.filter(F.split(F.lower(text), r"\s+"), lambda t: t != "")
    return word_shingles_from_tokens(toks, n)


def word_shingles_from_tokens(toks: Column, n: int = 3) -> Column:
    """:func:`word_shingles` over an ALREADY-tokenized array column —
    the fusion entry point for pipelines that materialize tokens once
    and build several gram views from them."""
    k = F.size(toks) - (n - 1)
    grams = F.when(k <= 0, F.array(F.array_join(toks, " "))).otherwise(
        F.transform(
            F.sequence(F.lit(1), F.greatest(k, F.lit(1))),
            lambda i: F.array_join(F.slice(toks, i, n), " "),
        )
    )
    return F.array_distinct(grams)


def portable_hash32(col: Column) -> Column:
    """32-bit content hash identical across engines: first 8 hex chars
    of md5. DuckDB twin: ``CAST(concat('0x', substr(md5(x),1,8)) AS BIGINT)``.

    xxhash64 is ~3x faster JVM-side but engine-specific; use this
    family when results must be reproducible outside Spark (oracle
    checks, cross-system dedup manifests).
    """
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")


def portable_hash60(col: Column) -> Column:
    """60-bit variant (15 hex chars — stays clear of BIGINT sign)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def minhash_ab(num_hashes: int) -> list[tuple[int, int]]:
    """The fixed-seed universal-hash family (a_i, b_i) — shared with the
    DuckDB oracle so both engines derive identical signatures."""
    rng = random.Random(0x5EED + num_hashes)
    return [(rng.randrange(1, 1 << 30), rng.randrange(0, 1 << 60)) for _ in range(num_hashes)]


def minhash_signatures(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                       num_hashes: int = 64, shingle_n: int = 3,
                       hash_fn: str = "xxhash64") -> DataFrame:
    """(id, signature: array<long>) — universal-hash MinHash.

    Each shingle is string-hashed ONCE (xxhash64, masked to 32 bits);
    the ``num_hashes`` family members derive from it with
    ``(a_i * h + b_i) mod P`` (P = 2^61 - 1, fixed-seed a_i/b_i), so
    one fold over the pre-hashed longs updates the running-min vector
    with cheap arithmetic instead of re-hashing the string per seed
    (~5x faster per row, and a far smaller codegen tree).

    ANSI-safe bounds: a < 2^30, h < 2^32, b < 2^60 keep every
    intermediate below 2^63 (Spark 4 throws on long overflow).

    ``hash_fn``: ``xxhash64`` (fast, engine-specific) or ``md5``
    (portable_hash32 — bit-identical in DuckDB, so the whole pipeline
    is oracle-checkable).

    NULL text yields a NULL signature. Without the explicit guard the
    fold would return the INIT vector (``least(acc, NULL)`` ignores
    NULLs), making every null-text doc a perfect LSH duplicate of
    every other — a silent corpus-poisoning footgun at scale.
    """
    ab = minhash_ab(num_hashes)
    ab_lit = F.expr(
        "array(" + ",".join(f"named_struct('a',{a}L,'b',{b}L)" for a, b in ab) + ")"
    )
    prime = F.lit((1 << 61) - 1)
    shingles = word_shingles(F.col(text_col), shingle_n)
    if hash_fn == "md5":
        hashed = F.transform(shingles, portable_hash32)
    elif hash_fn == "xxhash64":
        hashed = F.transform(shingles, lambda s: F.xxhash64(s).bitwiseAND(F.lit(0xFFFFFFFF)))
    else:
        raise ValueError(f"hash_fn must be xxhash64|md5, got {hash_fn!r}")
    init = F.array_repeat(F.lit(1 << 62).cast("long"), num_hashes)
    sig = F.aggregate(
        hashed,
        init,
        lambda acc, h: F.zip_with(
            acc, ab_lit, lambda a, p: F.least(a, (p["a"] * h + p["b"]) % prime)
        ),
    )
    sig = F.when(F.col(text_col).isNull(),
                 F.lit(None).cast("array<long>")).otherwise(sig)
    return docs.select(F.col(id_col), sig.alias("signature"))


def minhash_signatures_np(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                          num_hashes: int = 64, shingle_n: int = 3) -> DataFrame:
    """MinHash signatures, Arrow/numpy strategy — bit-identical to
    ``minhash_signatures(hash_fn='md5')``.

    Per Arrow batch: tokenize + shingle in Python, md5-prefix hash each
    distinct shingle once, then ONE numpy broadcast
    ``(A[:,None] * h[None,:] + B[:,None]) % P`` and a min over the
    shingle axis — the 64-member family collapses to a single
    vectorized op instead of a 64-wide Catalyst fold lambda. Bounds
    (a < 2^30, h < 2^32, b < 2^60) keep products under 2^63, so uint64
    arithmetic is exact and matches the JVM's long semantics.

    Same fixed-seed family and md5 shingle hash as the engine variant,
    so the DuckDB oracle for the md5 pipeline verifies this one too.
    NULL text yields a NULL signature (the engine fold over a NULL
    shingle array is NULL), and the id column keeps its input type.
    """
    import hashlib
    import re

    import numpy as np
    import pandas as pd

    id_type = docs.schema[id_col].dataType.simpleString()
    ab = minhash_ab(num_hashes)
    A = np.array([a for a, _ in ab], dtype=np.uint64)[:, None]
    B = np.array([b for _, b in ab], dtype=np.uint64)[:, None]
    P = np.uint64((1 << 61) - 1)
    # ASCII \s: Java regex \s (the Catalyst twin) and RE2 (the DuckDB
    # oracle) are ASCII-only; Python's default \s also eats Unicode
    # whitespace (NBSP, U+2028, ...), which would silently fork the
    # token stream on non-ASCII docs
    ws = re.compile(r"\s+", re.ASCII)

    _CAP = _MEMO_CAP  # captured driver-side so tests can shrink it

    def kernel(batches):
        # per-TASK memo of the shingle hash (guide §4.5: heavyweight
        # work once per task): near-dup corpora repeat shingles heavily
        # across documents (sf0.1: 260k shingle occurrences, 27k
        # distinct), so each distinct shingle is md5'd once per task
        # instead of once per occurrence. int.from_bytes(digest[:4]) is
        # the same value as int(hexdigest[:8], 16) without building and
        # parsing the hex string — bit-identical family, same oracle.
        # Bounded (guide §5): unbounded growth over every distinct
        # shingle in a large text partition would balloon worker RSS;
        # the within-batch repetition carries most of the hit rate.
        hcache: dict = {}
        _md5 = hashlib.md5
        for pdf in batches:
            ids, sigs = [], []
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                if text is None or (not isinstance(text, str) and pd.isna(text)):
                    # engine twin: the fold over a NULL shingle array
                    # is NULL, not a fingerprint of the string 'None'
                    ids.append(doc_id)
                    sigs.append(None)
                    continue
                toks = [t for t in ws.split(str(text).lower()) if t]
                if len(toks) <= shingle_n - 1:
                    shingles = {" ".join(toks)}
                else:
                    shingles = {
                        " ".join(toks[j:j + shingle_n])
                        for j in range(len(toks) - shingle_n + 1)
                    }
                hs = np.empty(len(shingles), dtype=np.uint64)
                for i, s in enumerate(shingles):
                    h = hcache.get(s)
                    if h is None:
                        if len(hcache) >= _CAP:
                            hcache.clear()
                        h = hcache[s] = int.from_bytes(
                            _md5(s.encode("utf-8")).digest()[:4], "big")
                    hs[i] = h
                sig = ((A * hs[None, :] + B) % P).min(axis=1)
                ids.append(doc_id)
                sigs.append(sig.astype(np.int64).tolist())
            yield pd.DataFrame({id_col: ids, "signature": sigs})

    return docs.select(id_col, text_col).mapInPandas(
        kernel, f"{id_col} {id_type}, signature array<long>"
    )


def lsh_candidate_pairs(signatures: DataFrame, id_col: str = "doc_id",
                        bands: int = 16, rows_per_band: int = 4) -> DataFrame:
    """Candidate near-dup pairs: docs sharing any LSH band bucket.

    Explodes each signature into ``bands`` bucket keys and self-joins
    on (band, bucket) — the join key is a hash, so skew only occurs
    when there genuinely are many near-identical docs (AQE's skew-join
    splitting handles that).
    """
    assert bands * rows_per_band <= 1024
    buckets = F.explode(
        F.transform(
            F.sequence(F.lit(0), F.lit(bands - 1)),
            lambda b: F.struct(
                b.alias("band"),
                F.xxhash64(
                    F.array_join(
                        F.transform(
                            F.slice(F.col("signature"), b * rows_per_band + 1, rows_per_band),
                            lambda v: v.cast("string"),
                        ),
                        ",",
                    )
                ).alias("bucket"),
            ),
        )
    )
    exploded = signatures.select(F.col(id_col), buckets.alias("bb")).select(
        id_col, F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket")
    )
    left = exploded.alias("l")
    right = exploded.alias("r")
    return (
        left.join(right, ["band", "bucket"])
        .filter(F.col(f"l.{id_col}") < F.col(f"r.{id_col}"))
        .select(F.col(f"l.{id_col}").alias("id_a"), F.col(f"r.{id_col}").alias("id_b"))
        .distinct()
    )


def minhash_near_duplicates(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                            threshold: float = 0.7, num_hashes: int = 64,
                            bands: int | None = None, shingle_n: int = 3,
                            hash_fn: str | None = None,
                            strategy: str = "engine") -> DataFrame:
    """End-to-end MinHash LSH: candidates verified by signature similarity.

    Returns (id_a, id_b, est_jaccard) for pairs whose estimated
    Jaccard (fraction of equal minhashes) >= threshold.

    ``bands=None`` auto-tunes the banding from the threshold via the
    LSH S-curve (:func:`lsh_tune`) — the band count where the collision
    probability inflects at ~threshold, so recall concentrates exactly
    where the verify step keeps pairs (t=0.5 with 64 hashes tunes to
    the classic 16x4).

    ``strategy='engine'`` computes signatures with the Catalyst fold
    (pure JVM, hash_fn selectable, default ``xxhash64``);
    ``strategy='arrow'`` uses the vectorized numpy kernel, which
    implements exactly the md5 portable family — ``hash_fn=None``
    resolves to it, and any other explicit ``hash_fn`` raises rather
    than silently returning md5 results.
    """
    if bands is None:
        bands, _ = lsh_tune(num_hashes, threshold)
    rows_per_band = num_hashes // bands
    # hashing is CPU-bound per row: spread small single-file inputs over
    # all cores before computing, and persist — the signature subtree
    # feeds three joins below
    par = docs.sparkSession.sparkContext.defaultParallelism
    if strategy == "arrow":
        if hash_fn not in (None, "md5"):
            raise ValueError(
                f"strategy='arrow' implements the md5 family, got hash_fn={hash_fn!r}")
        sigs = minhash_signatures_np(docs.repartition(par), text_col, id_col,
                                     num_hashes, shingle_n).persist()
    elif strategy == "engine":
        sigs = minhash_signatures(docs.repartition(par), text_col, id_col, num_hashes,
                                  shingle_n, hash_fn or "xxhash64").persist()
    else:
        raise ValueError(f"strategy must be engine|arrow, got {strategy!r}")
    cands = lsh_candidate_pairs(sigs, id_col, bands, rows_per_band)
    a = sigs.select(F.col(id_col).alias("id_a"), F.col("signature").alias("sig_a"))
    b = sigs.select(F.col(id_col).alias("id_b"), F.col("signature").alias("sig_b"))
    est = (
        F.size(F.filter(F.zip_with("sig_a", "sig_b", lambda x, y: x == y), lambda eq: eq))
        / F.lit(float(num_hashes))
    )
    return (
        cands.join(a, "id_a")
        .join(b, "id_b")
        .select("id_a", "id_b", F.round(est, 6).alias("est_jaccard"))
        .filter(F.col("est_jaccard") >= threshold)
    )


def ngram_jaccard_pairs(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                        shingle_n: int = 3, threshold: float = 0.5) -> DataFrame:
    """Exact n-gram Jaccard similarity for pairs sharing >= 1 shingle.

    shingle equi-join -> count common -> |A|+|B|-common denominator.
    Returns (id_a, id_b, jaccard) above threshold; jaccard rounded to
    6 decimals for engine portability.
    """
    with_sh = docs.select(
        F.col(id_col), F.explode(word_shingles(F.col(text_col), shingle_n)).alias("shingle")
    )
    sizes = with_sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_shingles"))
    l, r = with_sh.alias("l"), with_sh.alias("r")
    common = (
        l.join(r, "shingle")
        .filter(F.col(f"l.{id_col}") < F.col(f"r.{id_col}"))
        .groupBy(F.col(f"l.{id_col}").alias("id_a"), F.col(f"r.{id_col}").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("n_shingles").alias("n_a"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("n_shingles").alias("n_b"))
    jac = F.col("n_common") / (F.col("n_a") + F.col("n_b") - F.col("n_common"))
    return (
        common.join(sa, "id_a")
        .join(sb, "id_b")
        .select("id_a", "id_b", F.round(jac, 6).alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


def simhash(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id",
            bits: int = 64, hash_fn: str = "xxhash64") -> DataFrame:
    """64-bit SimHash from token hashes, entirely in expressions.

    bit_j(sim) = 1 iff sum over tokens of sign(bit_j(hash(token))) > 0.

    ``hash_fn="md5"`` uses the 60-bit portable family (pass bits<=60):
    bit-identical in DuckDB, so fingerprints are oracle-checkable.
    """
    toks = F.array_distinct(F.filter(F.split(F.lower(F.col(text_col)), r"\s+"), lambda t: t != ""))
    if hash_fn == "md5":
        assert bits <= 60, "portable md5 hash carries 60 bits"
        hashes = F.transform(toks, portable_hash60)
    elif hash_fn == "xxhash64":
        hashes = F.transform(toks, lambda t: F.xxhash64(t))
    else:
        raise ValueError(f"hash_fn must be xxhash64|md5, got {hash_fn!r}")
    # bit 63 is the long sign bit: its mask is the negative literal
    masks = [(1 << j) if j < 63 else -(1 << 63) for j in range(bits)]
    mask_arr = F.array(*[F.lit(m).cast("long") for m in masks])
    # ONE fold over the hashed tokens carrying all `bits` vote counters.
    # The tempting per-bit formulation (`bits` independent aggregate()
    # calls over `hashes`) re-evaluates the md5/xxhash transform once
    # PER BIT — no CSE inside higher-order-function lambdas — i.e. 60x
    # the hashing work. Fold arguments evaluate exactly once.
    votes = F.aggregate(
        hashes,
        F.array_repeat(F.lit(0), bits),
        lambda acc, h: F.zip_with(
            acc, mask_arr,
            lambda a, m: a + F.when(h.bitwiseAND(m) != 0, 1).otherwise(-1),
        ),
    )
    sim = F.aggregate(
        F.zip_with(
            votes, mask_arr,
            lambda v, m: F.when(v > 0, m).otherwise(F.lit(0).cast("long")),
        ),
        F.lit(0).cast("long"),
        lambda acc, b: acc.bitwiseOR(b),
    )
    return docs.select(F.col(id_col), sim.alias("simhash"))


def simhash_np(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id",
               bits: int = 60) -> DataFrame:
    """SimHash, Arrow/numpy strategy — bit-identical to
    ``simhash(hash_fn='md5')``.

    Per Arrow batch: distinct tokens, md5-prefix hash each once, then
    ONE numpy broadcast ``(hs[:,None] >> shifts) & 1`` and a column
    sum — the 60-wide per-token zip_with fold (interpreted: no codegen
    inside higher-order lambdas) collapses to vectorized bit math.
    Same fixed hash family, so every md5-simhash oracle verifies this
    kernel too. bits <= 60 (the portable family's width — no sign-bit
    handling needed). NULL text yields a NULL simhash (the engine
    fold over a NULL token array is NULL), and the id column keeps
    its input type."""
    assert bits <= 60, "portable md5 hash carries 60 bits"
    import hashlib
    import re

    import numpy as np
    import pandas as pd

    id_type = docs.schema[id_col].dataType.simpleString()

    # ASCII \s: Java regex \s (the Catalyst twin) and RE2 (the DuckDB
    # oracle) are ASCII-only; Python's default \s also eats Unicode
    # whitespace (NBSP, U+2028, ...), which would silently fork the
    # token stream on non-ASCII docs
    ws = re.compile(r"\s+", re.ASCII)
    shifts = np.arange(bits, dtype=np.uint64)
    masks = (np.uint64(1) << shifts).astype(np.int64)

    _CAP = _ROWCACHE_CAP  # captured driver-side so tests can shrink it

    def kernel(batches):
        # per-TASK memo of each distinct token's bit row (guide §4.5):
        # documents of one corpus share most of their vocabulary, so
        # the md5 + bit-expansion runs once per distinct token per task
        # instead of once per (doc, token). int.from_bytes(digest[:8])
        # >> 4 is the same value as int(hexdigest[:15], 16) without
        # building and parsing the hex string — bit-identical family.
        # Bounded (guide §5): each entry holds a 64-element int64 row
        # (~0.5 KB) — an unbounded vocabulary would OOM the worker.
        rcache: dict = {}
        _md5 = hashlib.md5
        _one, _four = np.uint64(1), np.uint64(4)
        for pdf in batches:
            ids, sims = [], []
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                if text is None or (not isinstance(text, str) and pd.isna(text)):
                    # engine twin: NULL text -> NULL simhash, not a
                    # fingerprint of the literal token 'none'
                    ids.append(doc_id)
                    sims.append(None)
                    continue
                toks = {t for t in ws.split(str(text).lower()) if t}
                if not toks:
                    ids.append(doc_id)
                    sims.append(0)
                    continue
                rows = []
                for t in toks:
                    r = rcache.get(t)
                    if r is None:
                        if len(rcache) >= _CAP:
                            rcache.clear()
                        h = np.uint64(int.from_bytes(
                            _md5(t.encode("utf-8")).digest()[:8], "big")) >> _four
                        r = rcache[t] = ((h >> shifts) & _one).astype(np.int64)
                    rows.append(r)
                ones = np.sum(rows, axis=0, dtype=np.int64)
                votes = 2 * ones - len(toks)
                ids.append(doc_id)
                sims.append(int(masks[votes > 0].sum()))
            # nullable Int64, never float64: simhash values reach 2^60,
            # beyond float64's exact-integer range
            yield pd.DataFrame(
                {id_col: ids, "simhash": pd.array(sims, dtype="Int64")})

    return docs.select(id_col, text_col).mapInPandas(
        kernel, f"{id_col} {id_type}, simhash long")


def simhash_near_duplicates(docs: DataFrame, max_hamming: int = 3,
                            text_col: str = "text", id_col: str = "doc_id",
                            bits: int = 60, hash_fn: str = "md5",
                            strategy: str = "engine") -> DataFrame:
    """SimHash near-dup pairs via banded hamming LSH (pigeonhole).

    Split each ``bits``-wide fingerprint into ``max_hamming + 1``
    bands; two fingerprints within hamming distance ``max_hamming``
    MUST agree on at least one whole band (pigeonhole — d flipped bits
    cannot touch d+1 disjoint bands), so an equi-join per band finds
    every true pair while only hashing-equal bands ever meet in the
    shuffle. Candidates verify exactly with
    ``bit_count(xor) <= max_hamming`` — no false negatives, no n².

    The same recall argument the reference-scale dedup literature uses
    (Manku et al., "Detecting Near-Duplicates for Web Crawling") —
    table-per-band there, one exploded band column here.

    Returns (id_a, id_b, hamming), exact-verified.
    """
    # fingerprinting is CPU-bound per row — spread single-file corpora
    par = docs.sparkSession.sparkContext.defaultParallelism
    if strategy == "arrow":
        if hash_fn != "md5":
            raise ValueError("strategy='arrow' implements the md5 family")
        sigs = simhash_np(docs.repartition(par), text_col, id_col, bits)
    elif strategy == "engine":
        sigs = simhash(docs.repartition(par), text_col, id_col, bits, hash_fn)
    else:
        raise ValueError(f"strategy must be engine|arrow, got {strategy!r}")
    return banded_hamming_pairs(sigs, max_hamming, id_col, bits)


def banded_hamming_pairs(sigs: DataFrame, max_hamming: int,
                         id_col: str = "doc_id", bits: int = 60,
                         sig_col: str = "simhash") -> DataFrame:
    """The banded-LSH pair join over an already-fingerprinted frame
    ``(id_col, sig_col)`` — the shared core of
    :func:`simhash_near_duplicates` and the fingerprint-collapsed
    cluster path (functions/cluster.simhash_dedup_clusters). Returns
    (id_a, id_b, hamming), exact-verified, no false negatives."""
    n_bands = max_hamming + 1
    width = bits // n_bands  # first bands may be 1 wider when uneven
    widths = [width + (1 if i < bits % n_bands else 0) for i in range(n_bands)]
    offsets = [sum(widths[:i]) for i in range(n_bands)]

    band_entries = F.explode(
        F.array(*[
            F.struct(
                F.lit(i).alias("band"),
                F.shiftrightunsigned(F.col(sig_col), offsets[i])
                .bitwiseAND(F.lit((1 << widths[i]) - 1)).alias("key"),
            )
            for i in range(n_bands)
        ])
    )
    ex = sigs.select(id_col, sig_col, band_entries.alias("b")).select(
        id_col, sig_col, F.col("b.band").alias("band"), F.col("b.key").alias("key")
    )
    l, r = ex.alias("l"), ex.alias("r")
    hamming = F.bit_count(F.col(f"l.{sig_col}").bitwiseXOR(F.col(f"r.{sig_col}")))
    return (
        l.join(r, ["band", "key"])
        .filter(F.col(f"l.{id_col}") < F.col(f"r.{id_col}"))
        .select(
            F.col(f"l.{id_col}").alias("id_a"),
            F.col(f"r.{id_col}").alias("id_b"),
            hamming.alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )


def incremental_exact_dedup(new_docs: DataFrame, manifest_path: str,
                            text_col: str = "text", id_col: str = "doc_id"):
    """Cross-batch exact dedup against a persisted content-hash
    manifest — the shape every INCREMENTAL ingestion pipeline needs:
    batch N+1 must not re-admit content batch N already accepted,
    without ever re-scanning prior batches' text.

    Returns ``(fresh, n_prior, commit)``: the subset of ``new_docs``
    whose content hash is neither in the manifest nor earlier in this
    batch (in-batch ties keep the min id), the prior-manifest size, and
    a zero-arg ``commit()`` the caller invokes AFTER durably writing
    ``fresh`` — only then are the batch's hashes appended. Commit order
    matters: were the manifest written first, a crash between manifest
    append and output write would permanently drop those documents on
    retry (the anti-join would see them as already accepted). With
    output-first the failure modes are both safe: crash before commit
    -> retry reprocesses the batch in full; crash after output but
    before commit -> the retry re-admits the same content and the
    append-only manifest + read-side ``distinct`` keep the replay
    harmless (same idempotence posture as the ingest path).

    At 100 TB the manifest is a hash column, orders of magnitude under
    the corpus; the anti-join shuffles on the hash (or broadcasts when
    the manifest is small — AQE decides), and text never leaves the
    current batch. The streaming twin with TTL state is
    ``streaming/stateful.streaming_dedup``.
    """
    spark = new_docs.sparkSession
    try:
        seen = spark.read.parquet(manifest_path).select("md5").distinct()
        n_prior = seen.count()
    except Exception:  # first batch: no manifest yet
        seen = spark.createDataFrame([], "md5 string")
        n_prior = 0
    hashed = new_docs.withColumn("_md5", F.md5(F.col(text_col)))
    novel = hashed.join(seen.withColumnRenamed("md5", "_md5"), "_md5", "left_anti")
    keep_ids = novel.groupBy("_md5").agg(F.min(id_col).alias(id_col)).select(id_col)
    fresh = novel.join(keep_ids, id_col, "left_semi").drop("_md5")

    def commit() -> None:
        (
            hashed.select(F.col("_md5").alias("md5")).distinct()
            .join(seen, "md5", "left_anti")
            .write.mode("append").parquet(manifest_path)
        )

    return fresh, n_prior, commit


def lsh_tune(num_hashes: int, threshold: float) -> tuple[int, int]:
    """Pick the (bands, rows_per_band) factorization of ``num_hashes``
    whose LSH S-curve threshold best matches the target Jaccard.

    The probability two items with similarity s share a band bucket is
    1 - (1 - s^r)^b, whose inflection sits at ~(1/b)^(1/r) (MMDS ch.3)
    — choose the divisor pair minimizing the distance to ``threshold``
    (ties prefer MORE bands: more bands = higher recall at the target,
    at the cost of more candidate pairs). 64 hashes at t=0.5 tunes to
    (16, 4), exactly the classic default.
    """
    if not 0 < threshold < 1:
        raise ValueError(f"threshold must be in (0, 1), got {threshold}")
    best: tuple[float, int, int] | None = None
    for b in range(1, num_hashes + 1):
        if num_hashes % b:
            continue
        r = num_hashes // b
        t = (1.0 / b) ** (1.0 / r)
        key = (abs(t - threshold), -b)
        if best is None or key < (best[0], -best[1]):
            best = (abs(t - threshold), b, r)
    assert best is not None
    return best[1], best[2]


def incremental_minhash_dedup(new_docs: DataFrame, index_path: str,
                              threshold: float = 0.7, num_hashes: int = 64,
                              shingle_n: int = 3,
                              text_col: str = "text", id_col: str = "doc_id"):
    """Cross-batch NEAR-dup suppression against a persisted LSH index —
    the incremental form of :func:`minhash_near_duplicates`: batch N+1
    drops documents near-duplicating anything ALREADY ACCEPTED, without
    re-scanning prior batches' text.

    The index persists two tables under ``index_path``:
    ``bands/`` (band, bucket, doc_id) and ``sigs/`` (doc_id, signature)
    — band keys find candidates (equi-join, pair cost tracks true
    collisions), signatures verify them exactly like the one-shot
    pipeline. Accepted docs append their rows via the returned
    ``commit()`` — call it only after ``fresh`` is durably written, so
    the index never records a batch whose output doesn't exist (same
    output-first crash contract as :func:`incremental_exact_dedup`);
    append-only + distinct on read keeps post-output replays harmless.

    In-batch near-dups also resolve (min id wins). Uses the md5 hash
    family so the index is portable across engines/systems. Banding
    auto-tunes from the threshold. Returns
    ``(fresh, n_indexed, commit)``.
    """
    spark = new_docs.sparkSession
    bands, rows_per_band = lsh_tune(num_hashes, threshold)
    try:
        old_bands = spark.read.parquet(f"{index_path}/bands").distinct()
        old_sigs = spark.read.parquet(f"{index_path}/sigs").distinct()
        n_indexed = old_sigs.count()
    except Exception:
        old_bands = spark.createDataFrame([], "band int, bucket long, doc_id long")
        old_sigs = spark.createDataFrame([], "doc_id long, signature array<long>")
        n_indexed = 0

    par = spark.sparkContext.defaultParallelism
    sigs = minhash_signatures(
        new_docs.repartition(par), text_col, id_col, num_hashes, shingle_n, "md5"
    ).persist()
    new_bands = _band_rows(sigs, id_col, bands, rows_per_band)

    est = (
        F.size(F.filter(F.zip_with("sig_a", "sig_b", lambda x, y: x == y), lambda e: e))
        / F.lit(float(num_hashes))
    )
    # vs the index: candidate (new, old) pairs -> verify -> suppressed new ids
    cross = (
        new_bands.join(old_bands.withColumnRenamed("doc_id", "_old"), ["band", "bucket"])
        .select(F.col(id_col), F.col("_old")).distinct()
        .join(sigs.select(F.col(id_col), F.col("signature").alias("sig_a")), id_col)
        .join(old_sigs.select(F.col("doc_id").alias("_old"),
                              F.col("signature").alias("sig_b")), "_old")
        .filter(F.round(est, 6) >= threshold)
        .select(id_col).distinct()
    )
    # within the batch: one-shot candidates, min id survives each pair
    a = sigs.select(F.col(id_col).alias("id_a"), F.col("signature").alias("sig_a"))
    b = sigs.select(F.col(id_col).alias("id_b"), F.col("signature").alias("sig_b"))
    in_batch = (
        lsh_candidate_pairs(sigs, id_col, bands, rows_per_band)
        .join(a, "id_a").join(b, "id_b")
        .filter(F.round(est, 6) >= threshold)
        .select(F.col("id_b").alias(id_col)).distinct()  # id_a < id_b: min wins
    )
    suppressed = cross.unionByName(in_batch).distinct()
    fresh = new_docs.join(suppressed, id_col, "left_anti")

    def commit() -> None:
        accepted_sigs = sigs.join(fresh.select(id_col), id_col, "left_semi")
        accepted_sigs.write.mode("append").parquet(f"{index_path}/sigs")
        _band_rows(accepted_sigs, id_col, bands, rows_per_band) \
            .write.mode("append").parquet(f"{index_path}/bands")
        sigs.unpersist()

    return fresh, n_indexed, commit


def _band_rows(signatures: DataFrame, id_col: str,
               bands: int, rows_per_band: int) -> DataFrame:
    """(band, bucket, id) rows — the exploded LSH index representation
    shared by the one-shot self-join and the persisted index."""
    buckets = F.explode(
        F.transform(
            F.sequence(F.lit(0), F.lit(bands - 1)),
            lambda b: F.struct(
                b.cast("int").alias("band"),
                F.xxhash64(
                    F.array_join(
                        F.transform(
                            F.slice(F.col("signature"), b * rows_per_band + 1, rows_per_band),
                            lambda v: v.cast("string"),
                        ),
                        ",",
                    )
                ).alias("bucket"),
            ),
        )
    )
    return signatures.select(F.col(id_col), buckets.alias("bb")).select(
        F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"), id_col
    )
