"""Text analysis for large-scale training-data pipelines.

All hot-path expressions are built-in Catalyst functions (JVM-side,
whole-stage codegen) — no row-at-a-time Python: at 100 TB that is the
difference between hours and weeks. The one Python kernel here
(:func:`winnowing_fingerprints_np`) is an Arrow-batched numpy rolling
hash — a vectorized batch kernel, measured ~30x the Catalyst fold's
throughput, offered as an alternate physical strategy. Each operator
is a pure ``DataFrame -> DataFrame`` with deterministic output so a
SQL oracle can replay it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: tiny embedded stopword lists for n-gram/stopword language ID
STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "that", "it", "for"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "es", "se", "no"],
    "de": ["der", "die", "das", "und", "zu", "den", "von", "ist", "mit", "nicht"],
    "fr": ["le", "la", "de", "et", "un", "que", "est", "pour", "qui", "dans"],
}

#: BPE-ish token boundary: words, numbers, or single punctuation/symbol
TOKEN_REGEX = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

#: entry cap for per-task kernel state (guide §5): bounds Python worker
#: RSS on high-cardinality splits; captured at plan-build time so tests
#: can shrink it.
_MEMO_CAP = 1 << 20


def tokens_col(text: Column) -> Column:
    """Whitespace tokens (lowercased, empties dropped)."""
    return F.filter(F.split(F.lower(text), r"\s+"), lambda t: t != "")


def token_stats(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact integer token statistics per document.

    Columns: n_chars, n_ws_tokens (whitespace), n_bpe_tokens (regex,
    a cheap proxy for subword token count), n_distinct_tokens,
    n_digits, n_punct.
    """
    text = F.col(text_col)
    toks = tokens_col(text)
    return docs.select(
        F.col(id_col),
        F.length(text).alias("n_chars"),
        F.size(toks).alias("n_ws_tokens"),
        F.regexp_count(text, F.lit(TOKEN_REGEX)).alias("n_bpe_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct_tokens"),
        F.regexp_count(text, F.lit(r"[0-9]")).alias("n_digits"),
        F.regexp_count(text, F.lit(r"[^\w\s]")).alias("n_punct"),
    )


def quality_score(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Heuristic quality features: length, punctuation/digit/stopword ratios.

    Ratios are rounded to 6 decimals so results are engine-portable.
    """
    text = F.col(text_col)
    toks = tokens_col(text)
    n_chars = F.length(text)
    n_tokens = F.size(toks)
    en_hits = F.size(F.array_intersect(toks, F.array(*[F.lit(w) for w in STOPWORDS["en"]])))
    safe_chars = F.greatest(n_chars, F.lit(1)).cast("double")
    safe_tokens = F.greatest(n_tokens, F.lit(1)).cast("double")
    return docs.select(
        F.col(id_col),
        n_chars.alias("n_chars"),
        n_tokens.alias("n_tokens"),
        F.round(F.regexp_count(text, F.lit(r"[^\w\s]")) / safe_chars, 6).alias("punct_ratio"),
        F.round(F.regexp_count(text, F.lit(r"[0-9]")) / safe_chars, 6).alias("digit_ratio"),
        F.round(en_hits / safe_tokens, 6).alias("stopword_ratio"),
        F.round(
            F.size(F.array_distinct(toks)) / safe_tokens, 6
        ).alias("distinct_ratio"),
    )


def language_id(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Stopword-vote language ID: the language with the most hits wins.

    Deterministic tie-break: higher hit count, then language code.
    Emits (id, lang_pred, hits).
    """
    toks = tokens_col(F.col(text_col))
    hits = [
        F.struct(
            F.size(F.array_intersect(toks, F.array(*[F.lit(w) for w in words]))).alias("hits"),
            F.lit(lang).alias("lang"),
        )
        for lang, words in sorted(STOPWORDS.items())
    ]
    # array_max on structs orders by first field then second — ties pick
    # the lexicographically largest lang; invert lang for stable "first wins"
    best = F.array_max(F.array(*hits))
    return docs.select(
        F.col(id_col),
        best["lang"].alias("lang_pred"),
        best["hits"].alias("lang_hits"),
    )


def tfidf_top_terms(docs: DataFrame, k: int = 3, text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """Top-k characteristic terms per document by smoothed TF-IDF.

    tf = in-doc term count; idf = ln((N+1)/(df+1)) + 1 (smooth — no
    zero/df=N blowups). Returns (doc_id, token, tf, tfidf, rank) with a
    token-asc tiebreak so ranks are deterministic on every engine.

    Plan shape (r14, guide §2.4): one explode -> (doc, token) count
    [shuffle on (doc, token)] -> document frequency as a COUNT WINDOW
    over tf partitioned by token [one shuffle of tf] -> per-doc top-k
    window. The earlier join-back formulation (df as a separate
    aggregate broadcast-joined onto tf) duplicated the whole
    scan→explode→tf subtree in the physical plan — tf appears on both
    sides of a self-join and neither Catalyst's ReuseExchange nor
    AQE's stage cache collapsed the copies (verified in
    plans/r14/doc_tfidf_topk_before.txt: two Scan→Generate→Exchange
    chains) — so the corpus was exploded and shuffled twice. The
    window form is a single linear pipeline: nothing to fail to reuse.
    Same colocation requirement at scale as the join it replaces
    (rows of one token meet in one partition either way once df
    outgrows a broadcast); df itself is the same integer. N comes
    from a one-row aggregate cross-joined in (broadcast), not a
    driver-side collect.
    """
    toks = docs.select(F.col(id_col), F.explode(tokens_col(F.col(text_col))).alias("token"))
    tf = toks.groupBy(id_col, "token").agg(F.count(F.lit(1)).alias("tf"))
    n_docs = docs.select(F.count(F.lit(1)).alias("n_docs"))
    wdf = Window.partitionBy("token")
    idf = F.log((F.col("n_docs") + 1) / (F.count(F.lit(1)).over(wdf) + 1)) + 1
    scored = (
        tf.crossJoin(F.broadcast(n_docs))
        .select(
            id_col, "token", "tf",
            F.round(F.col("tf") * idf, 6).alias("tfidf"),
        )
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("tfidf"), F.asc("token"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def fingerprint(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Document fingerprints: md5 (portable) + xxhash64 (cheap 64-bit)."""
    text = F.col(text_col)
    normalized = F.regexp_replace(F.lower(text), r"\s+", " ")
    return docs.select(
        F.col(id_col),
        F.md5(text).alias("md5"),
        F.md5(normalized).alias("md5_normalized"),
        F.xxhash64(text).alias("xxh64"),
    )


def winnowing_fingerprints(docs: DataFrame, k: int = 8, window: int = 4,
                           text_col: str = "text", id_col: str = "doc_id",
                           hash_fn: str = "xxhash64") -> DataFrame:
    """Winnowing document fingerprints (the MOSS scheme): hash every
    character k-gram, then keep the minimum hash of each sliding window
    of ``window`` consecutive k-grams.

    The guarantee: any shared substring of length >= k + window - 1
    between two documents yields at least one shared fingerprint, while
    only ~2/(window+1) of all k-gram hashes are retained — a tunable
    size/recall dial. Everything is built-in expressions (substr inside
    transform; no Python in the hot path); the per-position k-gram hash
    replaces a sequential Rabin-Karp rolling hash — same fingerprints,
    but each position computes independently, which is what a columnar
    batch engine wants (a carried recurrence would serialize the row).

    Returns (id, fingerprints: array<long> — distinct window minima,
    ascending).
    """
    text = F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " ")
    n_grams = F.greatest(F.length(text) - (k - 1), F.lit(1))
    if hash_fn == "md5":
        # portable 60-bit family — bit-identical in DuckDB, so the
        # fingerprint set is oracle-checkable
        from graphouse_spark.functions.dedup import portable_hash60

        gram_hash = lambda i: portable_hash60(F.substr(text, i, F.lit(k)))  # noqa: E731
    elif hash_fn == "xxhash64":
        gram_hash = lambda i: F.xxhash64(F.substr(text, i, F.lit(k)))  # noqa: E731
    else:
        raise ValueError(f"hash_fn must be xxhash64|md5, got {hash_fn!r}")
    grams = F.transform(F.sequence(F.lit(1), n_grams), gram_hash)
    # ONE fold carrying a ring buffer of the last `window` hashes: the
    # grams array is evaluated once (a fold argument), each step costs
    # O(window). The tempting transform(j -> array_min(slice(grams, j, w)))
    # re-evaluates the whole O(n) grams subtree per position — O(n^2)
    # interpreted work (no CSE inside higher-order lambdas).
    empty = F.array().cast("array<long>")

    def step(acc, h):
        grown = F.concat(acc["buf"], F.array(h))
        # positive start: slice(-w) errors out while the buffer is still
        # filling (size < window)
        newbuf = F.slice(grown, F.greatest(F.size(grown) - (window - 1), F.lit(1)), F.lit(window))
        return F.struct(
            newbuf.alias("buf"),
            F.when(F.size(acc["buf"]) >= window - 1,
                   F.concat(acc["out"], F.array(F.array_min(newbuf))))
            .otherwise(acc["out"]).alias("out"),
        )

    state = F.aggregate(
        grams,
        F.struct(empty.alias("buf"), empty.alias("out")),
        step,
        lambda acc: F.when(F.size(acc["out"]) > 0, acc["out"]).otherwise(F.array(F.array_min(acc["buf"]))),
    )
    return docs.select(F.col(id_col), F.array_sort(F.array_distinct(state)).alias("fingerprints"))


def winnow_overlap_pairs(docs: DataFrame, k: int = 8, window: int = 4,
                         min_shared: int = 2, max_df: float = 0.05,
                         strategy: str = "arrow",
                         text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Doc pairs sharing >= ``min_shared`` winnowing fingerprints.

    ``strategy``: ``arrow`` (default — numpy rolling hash, ~30x faster
    per row on this corpus) or ``catalyst`` (pure built-in
    expressions, no Python workers). Both satisfy the winnowing
    guarantee; their hash families (and so exact fingerprints) differ.

    Pair generation is ONE aggregation, not a self-join: group by
    fingerprint, collect the (sorted) doc list per fingerprint, emit
    in-list pair combinations by exploding positions against tail
    slices (codegen expressions), then count per pair. Two shuffles total (by fp, then by pair) versus the
    self-join shape's four (df-count, semi-join probe, join, final agg)
    — and the df cap becomes a free ``size(ids) <= cap`` filter on the
    already-collected list. Pair volume still tracks true overlap
    (sum of per-fp C(df,2)), never n².

    ``max_df``: fingerprints present in more than this fraction of the
    corpus are dropped (a fingerprint shared by everything —
    boilerplate, templates — carries no dedup signal, and its pair
    blow-up is exactly the quadratic hot key that melts the shuffle at
    scale; the cap also bounds per-group collect_list memory).
    Disable with ``max_df=1.0``.
    """
    # the per-doc hash kernel is CPU-bound: spread a single-file input
    # over every core before computing (1-task scans otherwise serialize
    # the whole corpus through one worker)
    spread = docs.repartition(docs.sparkSession.sparkContext.defaultParallelism)
    if strategy == "arrow":
        ex = winnowing_fingerprints_np(spread, k, window, text_col, id_col)
    elif strategy == "catalyst":
        fps = winnowing_fingerprints(spread, k, window, text_col, id_col)
        ex = fps.select(F.col(id_col), F.explode("fingerprints").alias("fp"))
    else:
        raise ValueError(f"strategy must be arrow|catalyst, got {strategy!r}")
    lists = ex.groupBy("fp").agg(F.sort_array(F.collect_list(id_col)).alias("ids"))
    lists = lists.filter(F.size("ids") >= 2)
    if max_df < 1.0:
        # corpus size enters the plan as a broadcast one-row aggregate —
        # no separate driver-side count action / extra scan
        n_docs = docs.select(F.count(F.lit(1)).alias("_n"))
        lists = (
            lists.crossJoin(F.broadcast(n_docs))
            .filter(F.size("ids") <= F.greatest(F.lit(2), F.floor(F.col("_n") * max_df)))
            .drop("_n")
        )
    # all pairs (ids[i], ids[j]) with i < j — codegen form (r13 opt):
    # explode the id_a POSITION, then explode the tail slice. Two
    # Generate nodes over top-level expressions replace the nested
    # interpreted transform() lambdas that built a struct array per
    # group (HOF lambdas never reach codegen; the struct allocation was
    # most of the pair-stage cost). A/B at sf0.1: bench args (k=16,
    # window=8, min_shared=3) wall 0.90 -> 0.75 s, cpu 2.34 -> 1.93 s;
    # default args (1.6M pairs) wall 3.84 -> 2.73 s. Rows identical in
    # both. `lists` is already filtered to size >= 2, so the position
    # sequence is always non-empty.
    return (
        lists.select(
            "ids",
            F.expr("explode(sequence(1, size(ids) - 1))").alias("_i"),
        )
        .select(
            F.element_at("ids", F.col("_i")).alias("id_a"),
            F.explode(F.slice("ids", F.col("_i") + 1, F.size("ids"))).alias("id_b"),
        )
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )


def winnowing_fingerprints_np(docs: DataFrame, k: int = 8, window: int = 4,
                              text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Winnowing fingerprints, Arrow/numpy strategy — an actual
    polynomial (Rabin-Karp-family) rolling hash, vectorized.

    Per Arrow batch: text bytes -> k-wide sliding windows -> polynomial
    hash ``sum(b[i+j] * B^(k-1-j)) mod 2^64`` (uint64 wraparound is the
    modulus — free and deterministic on every platform) -> window
    minima via ``sliding_window_view``. ~50x the Catalyst fold's
    per-row throughput on this corpus; same winnowing guarantee, a
    different (but fixed) hash family. Returns the EXPLODED shape
    (id, fp) — the natural output of a batch kernel feeding a join.
    """
    import numpy as np
    import pandas as pd

    base = np.uint64(1099511628211)  # FNV-1a prime as the polynomial base
    with np.errstate(over="ignore"):
        powers = np.array([base ** np.uint64(k - 1 - j) for j in range(k)], dtype=np.uint64)

    def kernel(batches):
        from numpy.lib.stride_tricks import sliding_window_view

        for pdf in batches:
            ids, fps = [], []
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                norm = " ".join(str(text).lower().split())
                b = np.frombuffer(norm.encode("utf-8"), dtype=np.uint8).astype(np.uint64)
                if len(b) < k:
                    b = np.pad(b, (0, k - len(b)), constant_values=32)
                with np.errstate(over="ignore"):
                    grams = (sliding_window_view(b, k) * powers).sum(axis=1, dtype=np.uint64)
                if len(grams) >= window:
                    minima = sliding_window_view(grams, window).min(axis=1)
                else:
                    minima = grams.min(keepdims=True)
                uniq = np.unique(minima).astype(np.int64)  # long column, same bits
                ids.extend([doc_id] * len(uniq))
                fps.extend(uniq)
            yield pd.DataFrame({id_col: ids, "fp": fps})

    return docs.select(id_col, text_col).mapInPandas(kernel, f"{id_col} long, fp long")


def repetition_stats(docs: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """Gopher-style repetition signals per document.

    Columns (ratios rounded to 6 decimals, engine-portable):
    - ``top_unigram_frac``  most frequent token's count / n_tokens
    - ``top_bigram_frac``   most frequent bigram's count / n_bigrams
    - ``dup_unigram_frac``  tokens whose value occurs >1 time / n_tokens

    Shape at scale: one explode over the token stream, a (doc, gram)
    partial/final count, then a per-doc re-aggregation — two shuffles
    keyed on doc_id, all JVM-side. High-repetition docs (the thing this
    filter exists to catch) concentrate into fewer distinct grams, so
    the intermediate SHRINKS on exactly the skewed inputs.
    """
    toks = tokens_col(F.col(text_col))
    bigrams = F.zip_with(
        toks,
        F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    # bigram array from zip_with is token-count long; last slot pairs the
    # final token with null -> concat_ws leaves a lone token; trim it
    bigrams = F.slice(bigrams, 1, F.greatest(F.size(toks) - 1, F.lit(0)))

    base = docs.select(
        F.col(id_col),
        F.size(toks).alias("n_tokens"),
        toks.alias("_toks"),
        bigrams.alias("_bigrams"),
    )

    uni = (
        base.select(id_col, "n_tokens", F.explode("_toks").alias("gram"))
        .groupBy(id_col, "n_tokens", "gram")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .groupBy(id_col, "n_tokens")
        .agg(
            F.max("cnt").alias("_top_uni"),
            F.sum(F.when(F.col("cnt") > 1, F.col("cnt")).otherwise(0)).alias("_dup_uni"),
        )
    )
    bi = (
        base.select(id_col, F.explode("_bigrams").alias("gram"))
        .groupBy(id_col, "gram")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .groupBy(id_col)
        .agg(F.max("cnt").alias("_top_bi"), F.sum("cnt").alias("_n_bi"))
    )
    safe_tokens = F.greatest(F.col("n_tokens"), F.lit(1)).cast("double")
    safe_bi = F.greatest(F.col("_n_bi"), F.lit(1)).cast("double")
    return (
        uni.join(bi, id_col, "left")
        .select(
            F.col(id_col),
            F.col("n_tokens"),
            F.round(F.col("_top_uni") / safe_tokens, 6).alias("top_unigram_frac"),
            F.round(F.coalesce(F.col("_top_bi"), F.lit(0)) / safe_bi, 6).alias("top_bigram_frac"),
            F.round(F.col("_dup_uni") / safe_tokens, 6).alias("dup_unigram_frac"),
        )
    )


#: the eight words Gopher's stop-word rule requires (Rae et al. 2021,
#: "Scaling Language Models: ... Gopher", table A1 quality heuristics)
GOPHER_REQUIRED_WORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_rules(docs: DataFrame, text_col: str = "text",
                 id_col: str = "doc_id") -> DataFrame:
    """The published Gopher quality rule-pack (Rae et al. 2021) as ONE
    projection — per-document signals, a boolean per rule, and the
    composite ``gopher_pass``:

    - 50 <= word count <= 100,000
    - 3 <= mean word length <= 10
    - symbol-to-word ratio (``#`` or ``...``) <= 0.1
    - <= 90% of lines start with a bullet; <= 30% end with an ellipsis
    - >= 80% of words contain at least one alphabetic character
    - >= 2 of the eight required English stop words appear

    Single pass, no shuffle, whole-stage codegen except the array
    lambdas; ratios round to 6 decimals so any engine replays the
    booleans exactly. (The repetition rules of the same paper live in
    :func:`repetition_stats` — they need gram aggregation, a different
    plan shape.)
    """
    text = F.col(text_col)
    exprs = _gopher_exprs(text, tokens_col(text), _nonempty_lines(text))
    return docs.select(F.col(id_col), *[c.alias(n) for n, c in exprs])


def _nonempty_lines(text) -> Column:
    """The shared line split both rule-packs consume."""
    return F.filter(F.split(text, "\n"), lambda l: F.trim(l) != "")


def _gopher_exprs(text, toks, lines) -> list:
    """(name, Column) pairs for the Gopher pack, parameterized on the
    token/line arrays so :func:`quality_rulepacks` can hand in arrays
    computed ONCE per document (interpreted array lambdas see no
    common-subexpression elimination — sharing must be structural)."""
    n_words = F.size(toks)
    sw = F.greatest(n_words, F.lit(1)).cast("double")
    mean_len = F.round(F.length(F.concat_ws("", toks)) / sw, 6)
    sym = F.regexp_count(text, F.lit("#")) + F.regexp_count(text, F.lit(r"\.\.\."))
    sym_ratio = F.round(sym / sw, 6)
    n_lines = F.greatest(F.size(lines), F.lit(1)).cast("double")
    bullet_ratio = F.round(F.size(F.filter(
        lines, lambda l: F.trim(l).rlike(r"^([-*•]|\d+\.)"))) / n_lines, 6)
    ellipsis_ratio = F.round(F.size(F.filter(
        lines, lambda l: F.trim(l).rlike(r"\.\.\.$"))) / n_lines, 6)
    alpha_ratio = F.round(F.size(F.filter(
        toks, lambda t: t.rlike("[a-z]"))) / sw, 6)
    stop_hits = F.size(F.array_intersect(
        toks, F.array(*[F.lit(w) for w in GOPHER_REQUIRED_WORDS])))
    rules = {
        "rule_word_count": (n_words >= 50) & (n_words <= 100_000),
        "rule_mean_word_len": (mean_len >= 3.0) & (mean_len <= 10.0),
        "rule_symbol_ratio": sym_ratio <= 0.1,
        "rule_bullet_lines": bullet_ratio <= 0.9,
        "rule_ellipsis_lines": ellipsis_ratio <= 0.3,
        "rule_alpha_words": alpha_ratio >= 0.8,
        "rule_stop_words": stop_hits >= 2,
    }
    gopher_pass = None
    for c in rules.values():
        gopher_pass = c if gopher_pass is None else (gopher_pass & c)
    return [
        ("n_words", n_words),
        ("mean_word_len", mean_len),
        ("symbol_ratio", sym_ratio),
        ("bullet_ratio", bullet_ratio),
        ("ellipsis_ratio", ellipsis_ratio),
        ("alpha_ratio", alpha_ratio),
        ("stop_hits", stop_hits),
        *rules.items(),
        ("gopher_pass", gopher_pass),
    ]


def duplicate_line_stats(docs: DataFrame, text_col: str = "text",
                         id_col: str = "doc_id") -> DataFrame:
    """Gopher's line/paragraph repetition signals (Rae et al. 2021):
    the fraction of duplicated lines and paragraphs per document, both
    by COUNT and by CHARACTER mass — boilerplate pages repeat whole
    lines, which token-level stats under-report.

    Columns: n_lines, dup_line_frac, dup_line_char_frac, n_paras,
    dup_para_frac, dup_para_char_frac (ratios rounded to 6).

    Shape at scale: one explode per granularity, a (doc, unit) count,
    then a per-doc re-aggregation — two shuffles keyed on doc_id, the
    same posture as :func:`repetition_stats`; repetitive documents
    COLLAPSE in the (doc, unit) intermediate, so the skewed inputs
    this filter exists to catch are the cheap ones.
    """
    def frac(unit_col):
        units = F.filter(unit_col, lambda u: F.trim(u) != "")
        exploded = docs.select(F.col(id_col), F.explode(units).alias("u"))
        per_unit = (
            exploded.groupBy(id_col, "u")
            .agg(F.count(F.lit(1)).alias("cnt"), F.length("u").alias("len"))
        )
        return per_unit.groupBy(id_col).agg(
            F.sum("cnt").alias("_n"),
            F.sum(F.when(F.col("cnt") > 1, F.col("cnt")).otherwise(0)).alias("_dup"),
            F.sum(F.col("cnt") * F.col("len")).alias("_chars"),
            F.sum(F.when(F.col("cnt") > 1, F.col("cnt") * F.col("len"))
                  .otherwise(0)).alias("_dup_chars"),
        )

    text = F.col(text_col)
    lines = frac(F.split(text, "\n"))
    paras = frac(F.split(text, r"\n\n+"))

    def ratios(df, n_name, prefix):
        safe_n = F.greatest(F.col("_n"), F.lit(1)).cast("double")
        safe_c = F.greatest(F.col("_chars"), F.lit(1)).cast("double")
        return df.select(
            F.col(id_col),
            F.col("_n").alias(n_name),
            F.round(F.col("_dup") / safe_n, 6).alias(f"dup_{prefix}_frac"),
            F.round(F.col("_dup_chars") / safe_c, 6)
            .alias(f"dup_{prefix}_char_frac"),
        )

    return ratios(lines, "n_lines", "line").join(
        ratios(paras, "n_paras", "para"), id_col, "inner")


def c4_filters(docs: DataFrame, min_line_words: int = 5,
               min_lines: int = 3, text_col: str = "text",
               id_col: str = "doc_id") -> DataFrame:
    """The published C4 cleaning heuristics (Raffel et al. 2020,
    "Exploring the Limits of Transfer Learning" §2.2) as one
    projection: line-level retention plus document-level drops.

    Line rule: keep only lines that end in terminal punctuation
    (. ! ? ") AND contain at least ``min_line_words`` words AND do not
    contain the word "javascript" (the paper removes the LINE, not the
    document); the cleaned text is the kept lines re-joined. Document
    rules: drop docs with fewer than ``min_lines`` kept lines and docs
    containing a curly brace (code) or "lorem ipsum".

    Output: (id, n_lines, n_kept_lines, kept_ratio, has_brace,
    has_lorem, has_javascript, c4_keep, clean_text). Shuffle-free,
    array lambdas only — same plan posture as :func:`gopher_rules`.
    """
    text = F.col(text_col)
    exprs = _c4_exprs(text, _nonempty_lines(text), min_line_words, min_lines)
    return docs.select(F.col(id_col), *[c.alias(n) for n, c in exprs])


def _c4_exprs(text, lines, min_line_words: int, min_lines: int) -> list:
    """(name, Column) pairs for the C4 pack over a supplied line
    array (see :func:`_gopher_exprs` for why it is parameterized)."""
    kept = F.filter(
        lines,
        lambda l: F.trim(l).rlike(r'[.!?"]$')
        & (F.size(F.filter(F.split(F.trim(l), r"\s+"), lambda t: t != ""))
           >= int(min_line_words))
        & ~F.lower(l).contains("javascript"),
    )
    n_lines = F.size(lines)
    n_kept = F.size(kept)
    lower = F.lower(text)
    has_brace = lower.contains("{")
    has_lorem = lower.contains("lorem ipsum")
    has_js = lower.contains("javascript")
    keep = (n_kept >= int(min_lines)) & ~has_brace & ~has_lorem
    return [
        ("n_lines", n_lines),
        ("n_kept_lines", n_kept),
        ("kept_ratio",
         F.round(n_kept / F.greatest(n_lines, F.lit(1)).cast("double"), 6)),
        ("has_brace", has_brace),
        ("has_lorem", has_lorem),
        ("has_javascript", has_js),
        ("c4_keep", keep),
        ("clean_text",
         F.when(keep, F.array_join(F.transform(kept, F.trim), "\n"))),
    ]


def quality_rulepacks(docs: DataFrame,
                      packs: tuple[str, ...] = ("gopher", "c4", "dup_lines"),
                      dup_line_frac_max: float = 0.30,
                      dup_para_frac_max: float = 0.30,
                      dup_line_char_frac_max: float = 0.20,
                      dup_para_char_frac_max: float = 0.20,
                      min_line_words: int = 5, min_lines: int = 3,
                      text_col: str = "text",
                      id_col: str = "doc_id") -> DataFrame:
    """The fused corpus quality gate: Gopher heuristics, C4 cleaning
    and Gopher's duplicate line/paragraph fractions as SELECTABLE
    rule-packs in one plan, ANDed into ``quality_pass``.

    Fusion is structural, not cosmetic: the token and line arrays are
    materialized once per document in a child projection and both
    shuffle-free packs read the SAME arrays (interpreted array lambdas
    get no common-subexpression elimination, and CollapseProject keeps
    non-cheap expressions un-inlined — so this is one tokenization
    pass where composing :func:`gopher_rules` + :func:`c4_filters`
    would split and filter the text twice). The ``dup_lines`` pack
    needs gram aggregation (two doc_id-keyed shuffles) and joins back
    on the id. The duplicate-fraction thresholds are the published
    Gopher repetition limits (Rae et al. 2021, Table A1).
    """
    text = F.col(text_col)
    cols: list = []
    pass_terms: list = []
    base_cols = [F.col(id_col)]
    if "gopher" in packs or "c4" in packs:
        base_cols.append(_nonempty_lines(text).alias("_lines"))
    if "gopher" in packs:
        base_cols.append(tokens_col(text).alias("_toks"))
    base = docs.select(*base_cols, text.alias(text_col))
    if "gopher" in packs:
        cols += _gopher_exprs(F.col(text_col), F.col("_toks"),
                              F.col("_lines"))
        pass_terms.append("gopher_pass")
    if "c4" in packs:
        cols += _c4_exprs(F.col(text_col), F.col("_lines"),
                          min_line_words, min_lines)
        pass_terms.append("c4_keep")
    out = base.select(F.col(id_col), *[c.alias(n) for n, c in cols])
    if "dup_lines" in packs:
        dup = duplicate_line_stats(docs, text_col=text_col, id_col=id_col)
        if "c4" in packs:  # both count the same non-empty lines
            dup = dup.drop("n_lines")
        dup_rules = [
            ("rule_dup_lines", F.col("dup_line_frac") <= dup_line_frac_max),
            ("rule_dup_line_chars",
             F.col("dup_line_char_frac") <= dup_line_char_frac_max),
            ("rule_dup_paras", F.col("dup_para_frac") <= dup_para_frac_max),
            ("rule_dup_para_chars",
             F.col("dup_para_char_frac") <= dup_para_char_frac_max),
        ]
        dup = dup.select("*", *[c.alias(n) for n, c in dup_rules])
        out = out.join(dup, id_col, "inner")
        pass_terms += [n for n, _ in dup_rules]
    if not pass_terms:
        raise ValueError(f"no known rule-pack in {packs!r}")
    gate = None
    for t in pass_terms:
        gate = F.col(t) if gate is None else (gate & F.col(t))
    return out.withColumn("quality_pass", gate)


def chunk_dedup(docs: DataFrame, chunk_tokens: int = 8, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Corpus-wide exact chunk dedup (the C4 line-dedup idea applied to
    fixed token windows, since corpus "lines" may be whole documents).

    Text splits into non-overlapping ``chunk_tokens``-token chunks; a
    chunk survives only at its globally FIRST occurrence (min
    (doc_id, chunk_idx) over every copy); each document is rebuilt from
    its surviving chunks in order. Returns
    ``(doc_id, kept_text, n_chunks, n_kept)``.

    Shape at scale: posexplode -> min_by-struct agg keyed on chunk text
    (one shuffle; partial aggregation collapses duplicate chunks
    map-side, so hot chunks COMBINE rather than skew) -> broadcast-less
    join back on chunk -> per-doc sorted re-assembly (second shuffle).
    No windows over the full corpus, no driver-side state.
    """
    # whitespace split WITHOUT lowercasing: reconstruction must emit the
    # original bytes of surviving chunks
    toks = F.filter(F.split(F.col(text_col), r"\s+"), lambda t: t != "")
    n_chunks = F.ceil(F.size(toks) / F.lit(chunk_tokens)).cast("int")
    # sequence(0, -1) would count DOWN for empty docs — guard to []
    chunks = F.when(
        n_chunks > 0,
        F.transform(
            F.sequence(F.lit(0), n_chunks - 1),
            lambda i: F.array_join(F.slice(toks, i * chunk_tokens + 1, chunk_tokens), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    exploded = docs.select(
        F.col(id_col), F.posexplode(chunks).alias("chunk_idx", "chunk")
    )
    first = exploded.groupBy("chunk").agg(
        F.min(F.struct(id_col, "chunk_idx")).alias("_first")
    )
    kept = (
        exploded.join(first, "chunk")
        .filter(
            (F.col(f"_first.{id_col}") == F.col(id_col))
            & (F.col("_first.chunk_idx") == F.col("chunk_idx"))
        )
        .select(id_col, "chunk_idx", "chunk")
    )
    rebuilt = kept.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("chunk_idx", "chunk"))),
                lambda s: s["chunk"],
            ),
            " ",
        ).alias("kept_text"),
        F.count(F.lit(1)).alias("n_kept"),
    )
    totals = docs.select(F.col(id_col), F.size(chunks).alias("n_chunks"))
    return (
        totals.join(rebuilt, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("kept_text"), F.lit("")).alias("kept_text"),
            "n_chunks",
            F.coalesce(F.col("n_kept"), F.lit(0)).cast("int").alias("n_kept"),
        )
    )


def duplicated_spans(docs: DataFrame, n: int = 10, min_docs: int = 2,
                     text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact duplicated-substring spans across the corpus — the span
    flavor of "Deduplicating Training Data Makes Language Models
    Better" (Lee et al. 2022), WITHOUT a suffix array: every length-n
    token window that appears in >= ``min_docs`` distinct documents is
    flagged, and per document, runs of consecutive flagged windows
    merge into maximal spans.

    Returns ``(doc_id, span_start, span_end, n_windows)`` — token
    positions, inclusive, ``span_end`` covering the last window's full
    n tokens.

    Scale shape (all flat rows, no suffix structures):
    1. tokens -> per-doc sliding n-gram hashes via ``transform`` over a
       ``sequence`` (pure codegen, no explode yet);
    2. posexplode -> (doc, pos, gram);
    3. gram doc-frequency: one groupBy with map-side partials (hot
       grams COMBINE, never skew a join);
    4. flagged (gram df >= min_docs) positions join back co-keyed on
       gram — broadcast when the flagged set is small, shuffle join
       otherwise (Catalyst/AQE decides);
    5. per-doc gaps-and-islands: pos - row_number() is constant within
       a run of consecutive positions (one bounded window per doc).

    The gram is an md5 prefix (engine-portable) of the joined window —
    hash collisions can only over-flag a span (union of true spans),
    the safe direction for a dedup filter.
    """
    toks = tokens_col(F.col(text_col))
    # the window-hash projection is CPU-heavy (len(doc) md5s per row);
    # a small corpus arriving as one parquet file would otherwise run
    # it single-task — spread docs across the cluster first (cheap:
    # raw docs are tiny next to their exploded grams).
    # Window hashes are generated by exploding POSITIONS and hashing
    # with top-level expressions (whole-stage codegen); the previous
    # transform()-array + posexplode form ran the md5 inside an
    # interpreted HOF lambda and materialized the gram array per doc —
    # alternating same-session A/B at sf0.1: task 18.4 -> 3.4 s, cpu
    # 11.8 -> 2.3 s, identical output. Docs shorter than one window
    # are filtered up front (they yield no windows either way).
    n_parts = docs.sparkSession.sparkContext.defaultParallelism
    pos_grams = (
        docs.repartition(n_parts)
        .select(F.col(id_col), toks.alias("_t"))
        .filter(F.size("_t") >= n)
        .select(id_col, "_t",
                F.explode(F.sequence(F.lit(0), F.size("_t") - n)).alias("pos"))
        .select(
            F.col(id_col), F.col("pos"),
            F.substring(
                F.md5(F.concat_ws("\x1f", F.slice("_t", F.col("pos") + 1, F.lit(n)))),
                1, 16).alias("gram"),
        )
    )
    gram_df = (
        pos_grams.groupBy("gram")
        .agg(F.count_distinct(id_col).alias("_df"))
        .filter(F.col("_df") >= min_docs)
        .select("gram")
    )
    flagged = pos_grams.join(gram_df, "gram").select(id_col, "pos")
    w = Window.partitionBy(id_col).orderBy("pos")
    island = (F.col("pos") - F.row_number().over(w)).alias("_island")
    return (
        flagged.select(F.col(id_col), F.col("pos"), island)
        .groupBy(id_col, "_island")
        .agg(
            F.min("pos").alias("span_start"),
            (F.max("pos") + n - 1).alias("span_end"),
            F.count(F.lit(1)).alias("n_windows"),
        )
        .drop("_island")
    )


def remove_duplicated_spans(docs: DataFrame, n: int = 10, min_docs: int = 2,
                            keep: str = "first_doc",
                            text_col: str = "text",
                            id_col: str = "doc_id") -> DataFrame:
    """ExactSubstr DEDUP — the removal half of "Deduplicating Training
    Data Makes Language Models Better" (Lee et al. 2022): excise every
    maximal span of length-``n`` token windows whose window text
    appears in >= ``min_docs`` distinct documents.

    ``keep="first_doc"`` (default) is a per-WINDOW keep-one heuristic:
    a window's occurrences in the smallest ``doc_id`` containing it
    are never flagged by that window, so a region duplicated verbatim
    across documents typically survives intact in its first document.
    It is NOT a hard per-region guarantee: overlapping windows whose
    keepers are different documents can each excise part of the
    other's kept copy (spans merge maximal runs), so a region's last
    intact copy can still lose tokens in pathological overlap
    layouts. ``keep="none"`` removes all occurrences everywhere (the
    paper's strict variant — no guarantee intended).

    Returns ``(doc_id, text, n_removed_tokens)`` with ``text``
    rebuilt from the ORIGINAL-case surviving tokens
    (whitespace-normalized to single spaces — the only honest
    spelling after token surgery). Window matching is case-folded,
    consistent with :func:`duplicated_spans`.

    Scale shape: identical to :func:`duplicated_spans` (flat rows, no
    suffix structures) plus one per-gram min(doc_id) carried through
    the same aggregate, and a final tokens-minus-spans projection —
    ``filter(tokens, (t, i) -> not exists(spans, ...))`` runs inside
    codegen; spans per doc are few, so the O(tokens x spans) inner
    exists stays cheap.
    """
    if keep not in ("first_doc", "none"):
        raise ValueError(f"keep must be 'first_doc' or 'none' (got {keep!r})")
    raw_toks = F.filter(F.split(F.col(text_col), r"\s+"),
                        lambda t: t != "")
    base = docs.select(F.col(id_col), raw_toks.alias("_toks"))
    low = lambda arr: F.transform(arr, F.lower)  # noqa: E731
    n_parts = docs.sparkSession.sparkContext.defaultParallelism
    base = base.repartition(n_parts)
    # positions exploded first, window hash as a top-level codegen
    # expression — same rewrite (and same A/B evidence) as
    # duplicated_spans above; the lowercase fold runs on the 10-token
    # slice only, not the whole document
    pos_grams = (
        base.filter(F.size("_toks") >= n)
        .select(id_col, "_toks",
                F.explode(F.sequence(F.lit(0), F.size("_toks") - n)).alias("pos"))
        .select(
            F.col(id_col), F.col("pos"),
            F.substring(
                F.md5(F.concat_ws(
                    "\x1f", low(F.slice(F.col("_toks"), F.col("pos") + 1, F.lit(n))))),
                1, 16).alias("gram"),
        )
    )
    hot = (
        pos_grams.groupBy("gram")
        .agg(F.count_distinct(id_col).alias("_df"),
             F.min(id_col).alias("_keeper"))
        .filter(F.col("_df") >= min_docs)
        .select("gram", "_keeper")
    )
    flagged = pos_grams.join(hot, "gram")
    if keep == "first_doc":
        flagged = flagged.filter(F.col(id_col) != F.col("_keeper"))
    w = Window.partitionBy(id_col).orderBy("pos")
    island = (F.col("pos") - F.row_number().over(w)).alias("_island")
    spans = (
        flagged.select(F.col(id_col), F.col("pos"), island)
        .groupBy(id_col, "_island")
        .agg(F.min("pos").alias("s"), (F.max("pos") + n - 1).alias("e"))
        .groupBy(id_col)
        .agg(F.collect_list(F.struct("s", "e")).alias("_spans"))
    )
    out = base.join(spans, id_col, "left")
    in_span = lambda i: F.exists(  # noqa: E731
        F.col("_spans"), lambda sp: (i >= sp["s"]) & (i <= sp["e"]))
    kept = F.when(F.col("_spans").isNull(), F.col("_toks")).otherwise(
        F.filter(F.col("_toks"), lambda t, i: ~in_span(i)))
    return out.select(
        F.col(id_col),
        F.concat_ws(" ", kept).alias(text_col),
        (F.size(F.col("_toks")) - F.size(kept))
        .cast("long").alias("n_removed_tokens"),
    )


def ngram_lm_scores(docs: DataFrame, alpha: float = 0.5,
                    text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Bigram language-model perplexity per document — the CCNet-style
    "train an n-gram LM on the corpus, score every document" quality
    signal (Wenzek et al. 2020 score with a KenLM model; the model
    here is an add-alpha bigram LM trained on the SAME corpus in two
    aggregates, so the whole operator stays inside the engine).

    P(w2 | w1) = (C(w1,w2) + alpha) / (C(w1) + alpha * V)

    where counts come from the full corpus and V is the corpus
    vocabulary size. Per document: n_bigrams, avg_nll (mean negative
    log-likelihood over its bigram transitions), ppl = exp(avg_nll).
    Documents with < 2 tokens score null (no transitions).

    Plan shape (scales as three corpus passes, never pairwise):
    1. one bigram extraction per doc — explode transition POSITIONS and
       index the token array with ``element_at`` (top-level codegen
       expressions, no interpreted lambda);
    2. corpus model = two aggregates over the exploded bigrams/tokens
       (map-side partial combine; the model tables are vocabulary- and
       vocabulary²-bounded, orders of magnitude under the corpus);
    3. score join: doc bigram occurrences ⋈ bigram counts ⋈ unigram
       counts — model sides are broadcast when small, AQE decides
       otherwise — then one groupBy(doc) average.

    Floats: each transition's -ln P rounds to NANO-units (9 decimals)
    and accumulates as an exact integer sum — float summation order
    varies with shuffle-fetch arrival under load, and a mean that
    drifts one ulp across a round-6 boundary flips the oracle hash
    (observed in practice); integer sums are associative, so the mean
    is bit-stable on every engine/partitioning/load. ln itself agrees
    across engines to ~1 ulp, far inside the nano grid.
    """
    toks = tokens_col(F.col(text_col))
    base = docs.select(F.col(id_col), toks.alias("_toks"))
    # codegen form (r13 opt, same §4.1 rewrite as the langid/span
    # generators): explode POSITIONS and index with element_at — all
    # top-level expressions — instead of materializing a struct array
    # inside an interpreted transform() lambda (HOF lambdas never reach
    # codegen). A/B at sf0.1 (doc_ppl_buckets, min of 3): task/cpu
    # 1.02/1.01 -> 0.67/0.67 s, rows identical. Spreading the narrow
    # scan over cores was also tried and rejected: the repartition
    # exchange cost more task time than the whole serial stage.
    bigrams = base.select(
        F.col(id_col), F.col("_toks"),
        F.expr("explode(CASE WHEN size(_toks) < 2 THEN array() "
               "ELSE sequence(1, size(_toks) - 1) END)").alias("_i"),
    ).select(
        F.col(id_col),
        F.element_at("_toks", F.col("_i")).alias("w1"),
        F.element_at("_toks", F.col("_i") + 1).alias("w2"),
    )
    tokens = base.select(F.col(id_col), F.explode("_toks").alias("token"))
    uni = tokens.groupBy(F.col("token").alias("w1")).agg(F.count(F.lit(1)).alias("c1"))
    bi = bigrams.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    vocab = uni.select(F.count(F.lit(1)).alias("v"))
    nll = -F.log(
        (F.col("c12") + F.lit(alpha)) / (F.col("c1") + F.lit(alpha) * F.col("v"))
    )
    nll_nano = F.round(nll * 1e9).cast("long")
    scored = (
        bigrams.join(bi, ["w1", "w2"])
        .join(uni, "w1")
        .crossJoin(F.broadcast(vocab))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum(nll_nano).alias("_sum_nano"),
        )
    )
    avg_raw = F.col("_sum_nano") / (F.col("n_bigrams") * 1e9)
    # docs with < 2 tokens have no bigram rows — restore them with nulls
    return (
        docs.select(F.col(id_col))
        .join(
            scored.select(
                id_col, "n_bigrams",
                F.round(avg_raw, 6).alias("_avg"),
                F.round(F.exp(avg_raw), 6).alias("_ppl"),
            ),
            id_col, "left",
        )
        .select(
            id_col,
            F.coalesce(F.col("n_bigrams"), F.lit(0)).cast("int").alias("n_bigrams"),
            F.col("_avg").alias("avg_nll"),
            F.col("_ppl").alias("ppl"),
        )
    )


def ngram_language_id(docs: DataFrame, n: int = 3, profile_k: int = 50,
                      text_col: str = "text", id_col: str = "doc_id",
                      lang_col: str = "lang",
                      strategy: str = "arrow") -> DataFrame:
    """Character-n-gram profile language ID (Cavnar & Trenkle 1994,
    "N-Gram-Based Text Categorization"), trained on the corpus's own
    labels: per-language top-``profile_k`` character n-grams by
    frequency form the profile; a document scores each language by how
    many of its distinct n-grams hit that profile, highest overlap
    wins (ties break to the lexicographically first language).

    Returns (id, lang_pred, overlap, is_correct vs the stored label).

    Plan shape: profile = one explode + count + bounded per-language
    window rank (vocabulary-sized); scoring = distinct-gram explode ⋈
    broadcast profile (languages x k rows) + one argmax aggregation —
    every stage map-side-combining, nothing pairwise.

    ``strategy='arrow'`` (default) replaces both gram generators with
    Arrow kernels over the SAME JVM-normalized ``_s`` column (so
    lower/whitespace semantics cannot fork): the profile side
    pre-aggregates (lang, gram) counts per task in a Python Counter —
    a map-side combine that emits vocabulary-sized partials instead of
    one row per gram occurrence — and the doc side emits per-doc
    DISTINCT grams from a Python set instead of the interpreted
    transform()+array_distinct HOF chain (HOF lambdas never reach
    codegen). ``strategy='engine'`` keeps the pure-Catalyst form; the
    equality test pins both to identical rows.
    """
    # the normalized string MUST be a projected column, not a
    # subexpression of the gram lambda: higher-order-function lambdas
    # see no CSE, so an inline regexp_replace would re-normalize the
    # whole document once PER POSITION (measured 25x slower)
    # single-file corpora would run the gram projection as one task —
    # spread first (cheap: raw docs are tiny next to their grams)
    par = docs.sparkSession.sparkContext.defaultParallelism
    base = docs.repartition(par).select(
        F.col(id_col), F.col(lang_col),
        F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " ").alias("_s"),
    )
    k_grams = F.greatest(F.length("_s") - (n - 1), F.lit(1))
    grams = F.transform(
        F.sequence(F.lit(1), k_grams), lambda i: F.substr(F.col("_s"), i, F.lit(n))
    )
    # language profiles: term frequency over ALL occurrences.
    # NOTE (r11): a shared-subtree formulation (explode once into
    # per-doc gram counts, derive both the profile and the doc side
    # from that aggregate, relying on ReuseExchange) was A/B-rejected
    # same-session: AQE wraps the two consumers differently, the
    # exchange is NOT reused (no ReusedExchange/ReusedQueryStage in
    # the executed plan), and the extra aggregation only added work
    # (task 20.2 -> 23.1 s, cpu 16.8 -> 19.3 s at sf0.1).
    # Profile side (engine): grams by exploding POSITIONS and slicing
    # with a top-level substring — whole-stage codegen — instead of the
    # interpreted transform()-array + explode (HOF lambdas never
    # codegen). Alternating same-session A/B at sf0.1: task 7.2 -> 5.5,
    # cpu 5.9 -> 4.9 s, identical output. The engine doc side keeps the
    # array form: it needs per-doc array_distinct before exploding (the
    # distinct-agg alternative adds an Expand that costs more).
    if strategy == "arrow":
        import pandas as pd

        id_type = docs.schema[id_col].dataType.simpleString()
        lang_type = docs.schema[lang_col].dataType.simpleString()

        _CAP = _MEMO_CAP  # captured driver-side so tests can shrink it

        def prof_kernel(batches):
            from collections import Counter

            # Bounded partial-aggregation state (guide §5): when the
            # per-task vocabulary outgrows the cap, flush the partials
            # as an output batch and start a fresh Counter — the
            # downstream groupBy sums partials, so results are
            # unchanged; only the combine ratio degrades.
            counts: Counter = Counter()
            for pdf in batches:
                if len(counts) >= _CAP:
                    yield pd.DataFrame(
                        [(lg, g, c) for (lg, g), c in counts.items()],
                        columns=[lang_col, "gram", "cnt"])
                    counts = Counter()
                for lang, s in zip(pdf[lang_col], pdf["_s"]):
                    if s is None:
                        # engine twin: greatest(NULL-2, 1) = 1 (greatest
                        # skips NULLs), so a NULL _s contributes ONE
                        # NULL gram — and that (lang, NULL) count can
                        # legitimately occupy a top-k profile slot
                        # (NULLS FIRST in the rank tiebreak), so it
                        # must be counted, not skipped
                        counts[(lang, None)] += 1
                        continue
                    m = len(s)
                    if m <= n - 1:
                        # engine twin: sequence(1, greatest(..,1)) slices
                        # ONE gram — the whole (possibly empty) string
                        counts[(lang, s)] += 1
                    else:
                        for j in range(m - n + 1):
                            counts[(lang, s[j:j + n])] += 1
            if counts:
                rows = [(lg, g, c) for (lg, g), c in counts.items()]
                yield pd.DataFrame(rows, columns=[lang_col, "gram", "cnt"])

        prof_counts = (
            base.select(lang_col, "_s")
            .mapInPandas(prof_kernel, f"{lang_col} {lang_type}, gram string, cnt long")
            .groupBy(lang_col, "gram")
            .agg(F.sum("cnt").alias("cnt"))
        )
    else:
        if strategy != "engine":
            raise ValueError(f"strategy must be arrow|engine, got {strategy!r}")
        prof_counts = (
            base.select(lang_col, "_s",
                        F.explode(F.sequence(F.lit(1), k_grams)).alias("_i"))
            .select(lang_col, F.col("_s").substr(F.col("_i"), F.lit(n)).alias("gram"))
            .groupBy(lang_col, "gram")
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
    w = Window.partitionBy(lang_col).orderBy(F.desc("cnt"), F.asc("gram"))
    profile = (
        prof_counts.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= profile_k)
        .select(F.col(lang_col).alias("_plang"), "gram")
    )
    # document side: DISTINCT grams (set overlap, not weighted)
    if strategy == "arrow":
        def doc_kernel(batches):
            for pdf in batches:
                ids: list = []
                langs: list = []
                gs: list = []
                for doc_id, lang, s in zip(pdf[id_col], pdf[lang_col], pdf["_s"]):
                    if s is None:
                        # engine twin: one (id, lang, NULL) gram row
                        ids.append(doc_id)
                        langs.append(lang)
                        gs.append(None)
                        continue
                    m = len(s)
                    if m <= n - 1:
                        doc_set = {s}
                    else:
                        doc_set = {s[j:j + n] for j in range(m - n + 1)}
                    for g in doc_set:
                        ids.append(doc_id)
                        langs.append(lang)
                        gs.append(g)
                yield pd.DataFrame({id_col: ids, lang_col: langs, "gram": gs})

        doc_grams = base.mapInPandas(
            doc_kernel, f"{id_col} {id_type}, {lang_col} {lang_type}, gram string"
        )
    else:
        doc_grams = base.select(
            F.col(id_col), F.col(lang_col),
            F.explode(F.array_distinct(grams)).alias("gram"),
        )
    overlaps = (
        doc_grams.join(F.broadcast(profile), "gram")
        .groupBy(id_col, lang_col, "_plang")
        .agg(F.count(F.lit(1)).alias("overlap"))
    )
    w2 = Window.partitionBy(id_col).orderBy(F.desc("overlap"), F.asc("_plang"))
    return (
        overlaps.withColumn("_rk", F.row_number().over(w2))
        .filter(F.col("_rk") == 1)
        .select(
            id_col,
            F.col("_plang").alias("lang_pred"),
            F.col("overlap").cast("int").alias("overlap"),
            (F.col("_plang") == F.col(lang_col)).alias("is_correct"),
        )
    )
