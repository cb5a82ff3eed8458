"""Learned quality filter: weak labels -> MLlib pipeline -> scores."""

from pyspark.sql import functions as F

from graphouse_spark.functions.quality_ml import (
    score_quality,
    train_quality_classifier,
    weak_quality_labels,
)


def _corpus(spark, n=120):
    rows = []
    for i in range(n):
        if i % 2 == 0:  # clean english prose
            rows.append((i, "the quick brown fox and the lazy dog were "
                            "walking through the field with their friends "
                            f"on a sunny day number {i}"))
        else:  # junky: digits + punctuation soup, no stopwords
            rows.append((i, f"@@##{i}%%!! 12345 67890 $$$$ ^^^^ || "
                            f"zzz{i} 00{i}11 ###"))
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_weak_labels_split_terciles(spark):
    labeled = weak_quality_labels(_corpus(spark))
    counts = {r["label"]: r["n"] for r in
              labeled.groupBy("label").agg(F.count("*").alias("n")).collect()}
    assert set(counts) == {0.0, 1.0}
    # clean docs label 1, junk labels 0 (spot-check via parity of ids)
    rows = labeled.collect()
    assert all((r["doc_id"] % 2 == 0) == (r["label"] == 1.0) for r in rows)


def test_train_and_score_separates_classes(spark):
    docs = _corpus(spark)
    labeled = weak_quality_labels(docs)
    model = train_quality_classifier(labeled, n_features=1 << 12)
    scored = score_quality(model, docs)
    agg = (scored.withColumn("clean", (F.col("doc_id") % 2 == 0))
           .groupBy("clean").agg(F.avg("quality_prob").alias("p")).collect())
    probs = {r["clean"]: r["p"] for r in agg}
    assert probs[True] > 0.9 and probs[False] < 0.1

    # generalization: unseen docs of each style score correctly
    unseen = spark.createDataFrame(
        [(1000, "the quick brown fox and the lazy dog were walking "
                "through the field with their friends on a sunny day "
                "number 9999"),
         (1001, "@@##9999%%!! 54321 09876 $$$$ ^^^^ || zzz9999 "
                "009991 ###")],
        "doc_id long, text string")
    got = {r["doc_id"]: r["quality_prob"]
           for r in score_quality(model, unseen).collect()}
    assert got[1000] > 0.5 > got[1001]


def test_scoring_plan_stays_jvm_side(spark):
    """The scoring transform must not introduce row-at-a-time Python:
    no BatchEvalPython/PythonUDF nodes in the plan (tokenize/hash/
    predict are all JVM ml transforms)."""
    import contextlib
    import io

    docs = _corpus(spark, 24)
    model = train_quality_classifier(weak_quality_labels(docs),
                                     n_features=1 << 10)
    out = score_quality(model, docs)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("formatted")
    plan = buf.getvalue()
    assert "BatchEvalPython" not in plan


def test_heldout_auc_and_repartition_stability(spark):
    """VERDICT r4 #8: the classifier must GENERALIZE (held-out AUC
    above a floor, not just memorize its training rows) and be stable
    under repartitioning (treeAggregate gradient sums must not flip
    predictions with partition count)."""
    from pyspark.sql import Window

    from graphouse_spark.functions.sampling import split_train_eval

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet").select("doc_id", "text")
    labeled = weak_quality_labels(docs)
    split = split_train_eval(labeled, "doc_id", 0.2)
    train = split.filter("split = 'train'").drop("split")
    ev = split.filter("split = 'eval'").drop("split")

    def heldout_auc(train_df):
        model = train_quality_classifier(train_df, n_features=1 << 14,
                                         max_iter=10)
        scored = score_quality(model, ev).join(
            ev.select("doc_id", "label"), "doc_id")
        n1 = scored.filter("label = 1.0").count()
        n0 = scored.filter("label = 0.0").count()
        ranked = scored.withColumn(
            "rk", F.row_number().over(
                Window.orderBy("quality_prob", "doc_id")))
        s1 = ranked.filter("label = 1.0").agg(F.sum("rk")).first()[0]
        return (s1 - n1 * (n1 + 1) / 2) / (n1 * n0)

    auc = heldout_auc(train)
    assert auc >= 0.9, f"held-out AUC collapsed: {auc:.3f}"
    auc7 = heldout_auc(train.repartition(7))
    assert abs(auc - auc7) < 0.02, (auc, auc7)
