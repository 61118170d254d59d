"""Round-8 experiment (VERDICT r7 item 4): can the minhash signature
stage replace K md5-string hashes per token with ONE md5 per token plus
k-salted integer mixing, keeping exact DuckDB parity?

Old: h(k, tok) = md5(k || ':' || tok)            -- tokens x K md5 calls
New: t = int48(md5(tok)); h(k, tok) = affine_k(t) -- tokens x 1 md5 call

affine_k(t) = ((t % P) * ((2654435761 * (k + 1)) % P) + k) % P
with P = 2147483647 (2^31 - 1). All intermediates < 2^62, so the
arithmetic is overflow-safe BIGINT in both Spark and DuckDB.

Usage: python tools/exp_minhash_hash.py [sf_dir_for_timing]
Prints one JSON line with timings + a sf0.01 parity verdict.
"""

import json
import sys
import time

import duckdb
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, ".")
from hive_test_spark.io import load_table  # noqa: E402
from hive_test_spark.session import tune  # noqa: E402

K = 16
BAND_ROWS = 4
TAU = 0.9
P = 2147483647
MULT = 2654435761


def _toks(d: DataFrame) -> DataFrame:
    return d.select("doc_id", F.array_distinct(F.split("text", " ")).alias("tok"))


def sig_old(toks: DataFrame) -> DataFrame:
    hashes = (
        toks.select("doc_id", F.explode("tok").alias("tok"))
        .select(
            "doc_id",
            F.explode(F.sequence(F.lit(0), F.lit(K - 1))).alias("k"),
            "tok",
        )
        .select(
            "doc_id", "k", F.md5(F.concat_ws(":", F.col("k"), F.col("tok"))).alias("h")
        )
    )
    return hashes.groupBy("doc_id", "k").agg(F.min("h").alias("mh"))


def sig_new(toks: DataFrame) -> DataFrame:
    tokh = toks.select("doc_id", F.explode("tok").alias("tok")).select(
        "doc_id",
        F.expr("CAST(conv(substring(md5(tok), 1, 12), 16, 10) AS BIGINT)").alias("t"),
    )
    hashes = tokh.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), F.lit(K - 1))).alias("k"),
        "t",
    ).select(
        "doc_id",
        "k",
        (
            ((F.col("t") % P) * ((F.lit(MULT) * (F.col("k") + 1)) % P) + F.col("k"))
            % P
        ).alias("h"),
    )
    return hashes.groupBy("doc_id", "k").agg(F.min("h").alias("mh"))


def bands_of(sig: DataFrame, string_mh: bool) -> DataFrame:
    key = (
        F.array_join(F.array_sort(F.collect_list("mh")), "|")
        if string_mh
        else F.expr(
            "array_join(transform(array_sort(collect_list(mh)), x -> CAST(x AS STRING)), '|')"
        )
    )
    return sig.groupBy(
        "doc_id", (F.col("k") / BAND_ROWS).cast("int").alias("band")
    ).agg(key.alias("bkey"))


def verified_pairs(toks: DataFrame, bands: DataFrame) -> DataFrame:
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bkey") == F.col("b.bkey"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    ta, tb = toks.alias("ta"), toks.alias("tb")
    inter = F.size(F.array_intersect(F.col("ta.tok"), F.col("tb.tok"))).cast("double")
    union = F.size(F.array_distinct(F.concat(F.col("ta.tok"), F.col("tb.tok"))))
    jac = inter / union
    return (
        cand.join(F.broadcast(ta), F.col("doc_a") == F.col("ta.doc_id"))
        .join(F.broadcast(tb), F.col("doc_b") == F.col("tb.doc_id"))
        .filter(jac >= TAU)
        .select("doc_a", "doc_b", F.round(jac, 6).alias("jaccard"))
    )


NEW_ORACLE = f"""
    WITH toks AS (
      SELECT doc_id, list_distinct(string_split(text, ' ')) AS tok FROM documents
    ),
    tokh AS (
      SELECT doc_id, CAST(('0x' || substr(md5(tok), 1, 12)) AS BIGINT) AS t
      FROM (SELECT doc_id, unnest(tok) AS tok FROM toks) u
    ),
    hashes AS (
      SELECT doc_id, k.k AS k,
             ((t % {P}) * (({MULT} * (k.k + 1)) % {P}) + k.k) % {P} AS h
      FROM tokh CROSS JOIN range({K}) k(k)
    ),
    sig AS (SELECT doc_id, k, min(h) AS mh FROM hashes GROUP BY doc_id, k),
    bands AS (
      SELECT doc_id, k // {BAND_ROWS} AS band,
             string_agg(mh::VARCHAR, '|' ORDER BY mh) AS bkey
      FROM sig GROUP BY doc_id, k // {BAND_ROWS}
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id
    )
    SELECT c.doc_a, c.doc_b,
           ROUND(CAST(len(list_intersect(ta.tok, tb.tok)) AS DOUBLE)
                 / len(list_distinct(list_concat(ta.tok, tb.tok))), 6) AS jaccard
    FROM cand c
    JOIN toks ta ON ta.doc_id = c.doc_a
    JOIN toks tb ON tb.doc_id = c.doc_b
    WHERE CAST(len(list_intersect(ta.tok, tb.tok)) AS DOUBLE)
          / len(list_distinct(list_concat(ta.tok, tb.tok))) >= {TAU}
    ORDER BY doc_a, doc_b
"""


def main() -> None:
    sf_timing = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    sf_parity = "/root/testdata/sf0.01"
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "8g")
        .appName("exp_minhash_hash")
        .getOrCreate()
    )
    tune(spark)
    out = {}

    # --- parity at sf0.01: new Spark vs new DuckDB -----------------------
    d = load_table(spark, sf_parity, "documents")
    toks = _toks(d)
    rows = (
        verified_pairs(toks, bands_of(sig_new(toks), string_mh=False))
        .orderBy("doc_a", "doc_b")
        .collect()
    )
    spark_rows = [(r.doc_a, r.doc_b, r.jaccard) for r in rows]
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf_parity}/documents.parquet')"
    )
    duck_rows = [tuple(r) for r in con.execute(NEW_ORACLE).fetchall()]
    out["parity_rows_spark"] = len(spark_rows)
    out["parity_rows_duck"] = len(duck_rows)
    out["parity_ok"] = spark_rows == duck_rows

    # --- timing at sf_timing: old vs new, 2 runs each, min ---------------
    d = load_table(spark, sf_timing, "documents")
    toks = _toks(d)
    for name, fn, s in (
        ("old", sig_old, True),
        ("new", sig_new, False),
    ):
        times = []
        for _ in range(2):
            t0 = time.time()
            n = verified_pairs(toks, bands_of(fn(toks), string_mh=s)).count()
            times.append(time.time() - t0)
        out[f"{name}_sec"] = round(min(times), 3)
        out[f"{name}_pairs"] = n

    # DuckDB oracle timing at the same SF (the oracle must stay runnable)
    con2 = duckdb.connect()
    con2.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf_timing}/documents.parquet')"
    )
    from hive_test_spark.llm.pipeline import _MINHASH_ORACLE

    for name, sql in (("old_duck", _MINHASH_ORACLE), ("new_duck", NEW_ORACLE)):
        t0 = time.time()
        con2.execute(sql).fetchall()
        out[f"{name}_sec"] = round(time.time() - t0, 3)

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
