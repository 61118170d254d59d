"""Stage-level timing for llm_minhash_det (guide §1: measure first).

Times each pipeline stage in isolation with the noop sink so the
expensive stage is identified before anything is changed:

  sigs   — token explode ×K salts → md5 → groupBy(doc,k).min
  bands  — band keys (collect_list over sig)
  cand   — (band,bkey) self-join + DISTINCT pair set
  full   — candidates + size-ratio prefilter + exact-Jaccard verify

Usage: python tools/bench_stages_minhash.py [--sf /root/testdata/sf0.1] [--runs 2]
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, ".")

from hive_test_spark.session import get_spark


def noop(df) -> None:
    df.write.mode("overwrite").format("noop").save()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--runs", type=int, default=2)
    args = ap.parse_args()

    from hive_test_spark.io import load_table
    from hive_test_spark.llm import pipeline as P

    spark = get_spark("minhash-stages")
    spark.sparkContext.setLogLevel("ERROR")

    d = load_table(spark, args.sf, "documents")
    toks, sig = P._minhash_sig_from(d)
    bands = P._band_keys(sig)
    cand = P._candidate_pairs(bands)
    full = P._minhash_verified_pairs(spark, args.sf)

    stages = [
        ("toks", toks),
        ("sigs", sig),
        ("bands", bands),
        ("cand", cand),
        ("full", full),
    ]
    # warm: run everything once untimed
    for name, df in stages:
        spark.sparkContext.setJobDescription(f"warm:{name}")
        noop(df)
    for name, df in stages:
        best = float("inf")
        for _ in range(args.runs):
            spark.sparkContext.setJobDescription(f"time:{name}")
            t0 = time.perf_counter()
            noop(df)
            best = min(best, time.perf_counter() - t0)
        print(f"{name:8s} best {best:7.3f}s")
    n_cand = cand.count()
    n_out = full.count()
    print(f"candidates={n_cand} verified={n_out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
