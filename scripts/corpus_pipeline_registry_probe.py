#!/usr/bin/env python
"""corpus_pipeline VERBATIM-FROM-THE-REGISTRY at 1M and 4M docs
(round 13, VERDICT r12 #4).

Round 12 proved the sized-exchange wiring on ``dedup_substring_hashed``
(SIZED_EXCHANGE_PROBE.json); the composed ``corpus_pipeline`` id is
the PRODUCT, and this probe runs exactly what ships: the registry
callable, zero probe-side tuning, on a generated documents table at
1M and 4M docs. Per point (fresh JVM, the scale sweep's protocol):

* the exchange rule must FIRE BY ITSELF — the session starts at the
  cores default and the probe records ``spark.sql.shuffle.partitions``
  after the call, which must equal the planner's own prediction from
  the catalog statistics (footer row count × SAMPLED mean tokens/doc
  — the round-13 measured multiplier, not the retired constant 93);
* exactness is the DRIVER'S OWN GATE at scale: the registry id's
  DuckDB oracle runs on the same parquet in the parent process and
  the result is compared rows + columns + order-insensitive value
  hash — any stage interaction drift at 4M fails exactly like the
  sf0.01 gate would;
* efficiency = 4 × wall(1M) / wall(4M), target ≥ 0.9 (the r12 scale
  sweep's scaled-partition arms measured 0.84–0.98 by hand).

The corpus plants every stage's work deterministically (no RNG, both
engines see identical bytes): ~100-token docs, 1-in-41 short docs
(10 tokens → quality gate), 1-in-53 exact text copies of their
predecessor (fingerprint dedup), a shared 12-token span across
id%29∈{10,11} pairs with id-unique boundary guards (ExactSubstr),
and a 5-gram copied from the id%37==0 benchmark neighbor into
id%37==1 docs (decontamination).

Usage: python scripts/corpus_pipeline_registry_probe.py
       [--points 1000000,4000000] [--quick] [--skip-oracle-at N]
Writes CORPUS_PIPELINE_REGISTRY_PROBE.json (merge-on-write per point).
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import subprocess
import sys
import time
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

WORDS = 100
VOCAB = 50_000
SPAN_AT, SPAN_LEN = 30, 12
LEAK_AT, LEAK_LEN = 50, 5


def corpus_sql(n: int) -> str:
    """Deterministic text expression for doc ``id`` (planted classes
    in the docstring). eff = the predecessor for exact-copy docs, so
    the COPY reproduces every planted pattern of its base and the
    texts are byte-identical."""
    eff = "IF(id % 53 = 1 AND id > 0, id - 1, id)"
    word = (
        f"CASE "
        f"WHEN {eff} % 29 IN (10, 11) AND i BETWEEN {SPAN_AT} AND "
        f"{SPAN_AT + SPAN_LEN - 1} THEN concat('p', "
        f"CAST({eff} - pmod({eff}, 29) AS STRING), 'x', "
        f"CAST(i - {SPAN_AT} AS STRING)) "
        f"WHEN {eff} % 29 IN (10, 11) AND i IN ({SPAN_AT - 1}, "
        f"{SPAN_AT + SPAN_LEN}) THEN concat('g', "
        f"CAST({eff} AS STRING), 'x', CAST(i AS STRING)) "
        f"WHEN pmod({eff}, 37) IN (0, 1) AND i BETWEEN {LEAK_AT} "
        f"AND {LEAK_AT + LEAK_LEN - 1} THEN concat('b', "
        f"CAST({eff} - pmod({eff}, 37) AS STRING), 'x', "
        f"CAST(i AS STRING)) "
        f"ELSE concat('w', pmod(xxhash64({eff}, i), {VOCAB})) END"
    )
    nw = f"IF({eff} % 41 = 1, 10, {WORDS})"
    return (
        f"array_join(transform(sequence(0, {nw} - 1), i -> {word}), ' ')"
    )


def write_corpus(spark, n: int, sf_dir: str) -> None:
    from pyspark.sql import functions as F

    (
        spark.range(n)
        .select(
            F.col("id").alias("doc_id"),
            F.expr(corpus_sql(n)).alias("text"),
            F.expr(
                "element_at(array('en','de','fr'), "
                "CAST(id % 3 AS INT) + 1)"
            ).alias("lang"),
            F.lit("web").alias("source"),
        )
        .withColumn("n_chars", F.length("text"))
        .write.mode("overwrite")
        .parquet(f"{sf_dir}/documents.parquet")
    )


def run_point(n: int, sf_dir: str, out_path: str) -> None:
    """Child mode: generate the corpus, then run the REGISTRY callable
    verbatim in this fresh JVM."""
    from database_join_spark.hostinfo import host_snapshot
    from database_join_spark.plans.sizing import shuffle_partitions_for
    from database_join_spark.plans.stats import (
        mean_tokens_per_doc_cached,
        parquet_rowcount,
    )
    from database_join_spark.queries import load_all
    from database_join_spark.session import get_spark

    spark = get_spark(app_name=f"corpus-registry-{n}")
    spark.sparkContext.setLogLevel("ERROR")
    cores = spark.sparkContext.defaultParallelism
    write_corpus(spark, n, sf_dir)

    registry = load_all()
    # session at the default; the operator must turn the knob itself
    spark.conf.set("spark.sql.shuffle.partitions", str(cores))
    rec = {
        "docs": n,
        "cores": cores,
        "conf_before": int(spark.conf.get("spark.sql.shuffle.partitions")),
        "host_start": host_snapshot(),
    }
    t0 = time.perf_counter()
    df = registry["corpus_pipeline"].fn(spark, sf_dir)
    rows = df.toPandas()
    rec["wall_sec"] = round(time.perf_counter() - t0, 2)
    rec["result_rows"] = len(rows)
    rec["conf_after"] = int(
        spark.conf.get("spark.sql.shuffle.partitions")
    )
    # the planner's own prediction, from the same catalog statistics
    docs_dir = f"{sf_dir}/documents.parquet"
    tpd, _ = mean_tokens_per_doc_cached(spark, docs_dir)
    rec["mean_tokens_per_doc"] = round(tpd, 2)
    rec["planner_predicted"] = shuffle_partitions_for(
        int(parquet_rowcount(docs_dir) * tpd), cores
    )
    rec["rule_fired"] = rec["conf_after"] == rec["planner_predicted"]
    rec["host_end"] = host_snapshot()
    rows.to_parquet(f"{sf_dir}/_spark_result.parquet", index=False)
    Path(out_path).write_text(json.dumps(rec) + "\n")
    spark.stop()


def vhash(pdf):
    pdf = pdf[sorted(pdf.columns)]
    pdf = pdf.sort_values(
        by=list(pdf.columns), kind="mergesort"
    ).reset_index(drop=True)
    return hashlib.md5(
        pdf.astype(str).to_csv(index=False).encode()
    ).hexdigest()


def oracle_compare(sf_dir: str) -> dict:
    """The driver's own compare, at scale, in the parent process."""
    import duckdb
    import pandas as pd

    from database_join_spark.queries import load_all

    oracle = load_all()["corpus_pipeline"].oracle
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet/*.parquet')"
    )
    t0 = time.perf_counter()
    dpdf = con.execute(oracle).df()
    oracle_sec = round(time.perf_counter() - t0, 2)
    spdf = pd.read_parquet(f"{sf_dir}/_spark_result.parquet")
    return {
        "oracle_sec": oracle_sec,
        "oracle_rows": len(dpdf),
        "spark_rows": len(spdf),
        "rows_match": len(dpdf) == len(spdf),
        "schema_match": sorted(spdf.columns) == sorted(dpdf.columns),
        "hash_match": vhash(spdf) == vhash(dpdf),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--points", default="1000000,4000000")
    ap.add_argument("--quick", action="store_true", help="50k/200k")
    ap.add_argument("--point", type=int, help="(internal) child mode")
    ap.add_argument("--sf-dir", help="(internal) child corpus dir")
    ap.add_argument("--out", help="(internal) child output path")
    args = ap.parse_args()

    if args.point:
        run_point(args.point, args.sf_dir, args.out)
        return

    import tempfile

    points = (
        [50_000, 200_000]
        if args.quick
        else [int(p) for p in args.points.split(",")]
    )
    artifact = Path(_REPO, "CORPUS_PIPELINE_REGISTRY_PROBE.json")

    def flush(update_points: dict, eff=None) -> None:
        # per-point merge-on-write: a kill mid-4M keeps the 1M point
        merged: dict = {"points": {}}
        if artifact.exists():
            merged = json.loads(artifact.read_text())
            merged.setdefault("points", {})
        merged["points"].update(update_points)
        if eff is not None:
            merged["efficiency_vs_smallest"] = eff
        merged["quick"] = args.quick
        artifact.write_text(json.dumps(merged, indent=1) + "\n")

    out: dict = {"points": {}}
    walls: dict = {}
    for n in points:
        sf_dir = tempfile.mkdtemp(prefix=f"corpus_registry_{n}_")
        child_out = f"{sf_dir}/_point.json"
        heap = max(8, round(10 * n / 1_000_000))
        env = dict(os.environ, SPARK_GRAFT_DRIVER_MEM=f"{heap}g")
        subprocess.run(
            [sys.executable, __file__, "--point", str(n),
             "--sf-dir", sf_dir, "--out", child_out],
            check=True, env=env, cwd=_REPO,
        )
        rec = json.loads(Path(child_out).read_text())
        rec["driver_heap"] = f"{heap}g"
        rec["oracle"] = oracle_compare(sf_dir)
        rec["all_exact"] = (
            rec["oracle"]["rows_match"]
            and rec["oracle"]["schema_match"]
            and rec["oracle"]["hash_match"]
        )
        walls[n] = rec["wall_sec"]
        out["points"][str(n)] = rec
        print(json.dumps(rec))
        flush({str(n): rec})
        import shutil

        shutil.rmtree(sf_dir, ignore_errors=True)

    if len(points) >= 2:
        lo, hi = min(points), max(points)
        eff = round((hi / lo) * walls[lo] / walls[hi], 3)
        print("efficiency:", eff)
        flush({}, eff=eff)
    print("wrote CORPUS_PIPELINE_REGISTRY_PROBE.json")


if __name__ == "__main__":
    main()
