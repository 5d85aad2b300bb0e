from __future__ import annotations

from pyspark.sql import functions as F

from torchtrajectory_spark.functions.tokenizer import tokenize_py, tokens_col


def test_ws_py():
    assert tokenize_py("A  b c ") == ["a", "b", "c"]
    assert tokenize_py("") == []


def test_code_py():
    assert tokenize_py("def f(x): return x+1", "code") == [
        "def", "f", "(", "x", ")", ":", "return", "x", "+", "1",
    ]
    assert tokenize_py("id_3\nfoo", "code") == ["id_3", "foo"]


def test_ws_spark_matches_py(spark):
    rows = ["a  b C", "", "hello world", "x\ty"]  # tab is not a split char
    df = spark.createDataFrame([(i, s) for i, s in enumerate(rows)], "id int, t string")
    got = {
        r["id"]: r["toks"]
        for r in df.select("id", tokens_col(F.col("t"), "ws").alias("toks")).collect()
    }
    for i, s in enumerate(rows):
        assert got[i] == tokenize_py(s, "ws"), s


def test_code_pandas_udf_matches_jvm(spark):
    rows = [
        "def f(x): return x+1",
        "int main() { return 0; }",
        "let x = a_b + 42;",
        "",
    ]
    df = spark.createDataFrame([(i, s) for i, s in enumerate(rows)], "id int, t string")
    out = df.select(
        "id",
        tokens_col(F.col("t"), "code").alias("pd"),
        tokens_col(F.col("t"), "code_jvm").alias("jvm"),
    ).collect()
    for r in out:
        assert r["pd"] == r["jvm"]
        assert r["pd"] == tokenize_py(rows[r["id"]], "code")
