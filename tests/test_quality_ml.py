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
