"""Mirror of the driver's correctness gate: every queries() entry with an
oracle_sql() runs on Spark AND DuckDB at sf0.001 and must match
(row count + sorted-column value equality). Keep this green and the
driver's CORRECTNESS_r{N}.json follows."""

import math

import duckdb
import pandas as pd
import pytest

import __spark_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.001"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")
    yield con
    con.close()


def normalize(df):
    """pandas frame -> sorted rows of sorted columns, floats canonicalized."""
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == "float64":
            df[c] = df[c].round(9)
    rows = [
        tuple(None if (isinstance(v, float) and math.isnan(v)) or v is pd.NA else v for v in row)
        for row in df.itertuples(index=False, name=None)
    ]
    return sorted(rows, key=repr)


ORACLES = entry_mod.oracle_sql()
QUERIES = entry_mod.queries()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_parity(spark, ddb, name):
    spark_df = QUERIES[name](spark, SF_DIR).toPandas()
    duck_df = ddb.execute(ORACLES[name]).fetchdf()
    assert sorted(spark_df.columns) == sorted(duck_df.columns), (
        f"{name}: column mismatch {sorted(spark_df.columns)} vs {sorted(duck_df.columns)}"
    )
    s_rows, d_rows = normalize(spark_df), normalize(duck_df)
    assert len(s_rows) == len(d_rows), f"{name}: row count {len(s_rows)} vs {len(d_rows)}"
    mismatches = [(a, b) for a, b in zip(s_rows, d_rows) if a != b]
    assert not mismatches, f"{name}: first mismatches {mismatches[:3]}"


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_no_oracle_queries_run(spark, name):
    # rows-only check for non-SQL-expressible ops (driver's weaker gate)
    df = QUERIES[name](spark, SF_DIR)
    assert df.count() >= 0
    assert len(df.schema) > 0


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    n = df.count()
    assert n > 0
    assert set(df.columns) == {"metric", "ts", "value"}


def test_no_duplicate_dict_keys_in_entry_module():
    """A duplicate key in a queries()/oracle_sql() dict literal silently
    shadows the earlier entry (round-8 verdict found doc_repetition
    twice in both). Runtime dicts can't reveal it — parse the AST and
    reject any duplicate string key in any dict literal."""
    import ast

    src = open(entry_mod.__file__).read()
    tree = ast.parse(src)
    dupes = []
    for node in ast.walk(tree):
        if isinstance(node, ast.Dict):
            seen = set()
            for k in node.keys:
                if isinstance(k, ast.Constant) and isinstance(k.value, str):
                    if k.value in seen:
                        dupes.append((k.value, k.lineno))
                    seen.add(k.value)
    assert not dupes, f"duplicate dict keys shadow earlier entries: {dupes}"
    # same shadowing class for top-level defs: a duplicate function
    # name silently replaces the earlier body
    seen_defs: dict = {}
    dup_defs = []
    for node in tree.body:
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
            if node.name in seen_defs:
                dup_defs.append((node.name, seen_defs[node.name],
                                 node.lineno))
            seen_defs[node.name] = node.lineno
    assert not dup_defs, f"duplicate top-level defs: {dup_defs}"
