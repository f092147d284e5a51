#!/usr/bin/env python
"""End-to-end corpus-pipeline volume probe (round 10, VERDICT r09 #5).

Every dedup/decontam family has its own scale probe, but no artifact
composes them — and composition is the number a training-data user
actually buys: quality gate → exact dedup → MinHash-LSH near-dup
retire → ExactSubstr span excision → n-gram decontamination →
sequence packing, each stage consuming the previous stage's
materialized output (persist boundaries priced, per-stage wall + the
total).

The corpus plants a known mass for every stage, all classes disjoint
by doc_id % 50 (n ≡ 0 mod 50, so each class holds exactly n/50 docs):

- class 2  — 10-word docs        → quality gate drops them (< 20)
- class 3  — exact copy of id-3  → exact dedup (min-id survivor)
- class 1  — copy of id-1 except the last word → MinHash near-dup,
             cluster-min retire (scale_probe's planted pattern)
- classes 10+11 — pair shares a verbatim 12-token run at positions
             40..51 → ExactSubstr excises 12 tokens from BOTH docs
             (substr_probe's planted pattern)
- class 7  — tokens 20..24 are a 5-gram that also appears in a
             held-out benchmark doc → decontam flags + drops the doc

Everything else is background: ~100 words from a 50k vocabulary, so
background shingle/window collisions ≈ 0 and every stage's expected
count is EXACT, not statistical:

  kept₁ = n − n/50            tokens removed₄ = 12 · 2n/50
  kept₂ = n − 2n/50           flagged₅ = n/50
  kept₃ = n − 3n/50           kept₅ = n − 4n/50
  packed tokens = 100·(kept₅ − 2n/50) + 88·(2n/50)

Round 11 adds a second full arm (``shared_tokens_arm`` in the JSON,
VERDICT r10 #1): tokenize ONCE at stage 1, carry the token array as
a column, and run every later stage off it — same planted corpus,
same persist protocol, same exact asserts. The arm comparison is the
probe's headline (1M: 121.6 s retokenize vs 89.5 s shared, 1.36×).

Usage: python scripts/pipeline_e2e_probe.py [--docs 1000000] [--quick]
Writes PIPELINE_E2E_PROBE.json at the repo root.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

VOCAB = 50_000
WORDS = 100
SPAN_AT, SPAN_LEN = 40, 12
LEAK_AT, LEAK_LEN = 20, 5


def synth_corpus(spark, n: int):
    """All planted classes in one deterministic generator (datagen's
    no-RNG-state trick). ``base`` redirects classes 1/3 to their
    source doc's word stream; per-position CASE plants the span, the
    leak, and class 1's divergent tail."""
    from pyspark.sql import functions as F

    base = (
        "CASE WHEN id % 50 = 1 THEN id - 1 "
        "WHEN id % 50 = 3 THEN id - 3 ELSE id END"
    )
    word = (
        f"CASE "
        # near-dup: last word diverges (class 1 only)
        f"WHEN id % 50 = 1 AND i = {WORDS - 1} "
        f"  THEN concat('t', CAST(id AS STRING)) "
        # ExactSubstr pair: verbatim run keyed by the pair base
        f"WHEN id % 50 IN (10, 11) AND i BETWEEN {SPAN_AT} "
        f"  AND {SPAN_AT + SPAN_LEN - 1} "
        f"  THEN concat('p', CAST(id - id % 50 AS STRING), 'x', "
        f"       CAST(i - {SPAN_AT} AS STRING)) "
        # id-unique guards at the two positions adjacent to the span:
        # every window straddling a span edge contains one of them,
        # so no boundary window can duplicate across the pair. Without
        # these, a window extending one token past the edge duplicates
        # iff that single w-position collides mod VOCAB between the
        # two docs — p ≈ 2·pairs/VOCAB ≈ 0.8 expected extensions at
        # 1M docs (observed: exactly one, +2 tokens). The planted
        # masses must be EXACT, not 1-in-50k-probabilistic.
        f"WHEN id % 50 IN (10, 11) AND i IN ({SPAN_AT - 1}, "
        f"  {SPAN_AT + SPAN_LEN}) "
        f"  THEN concat('g', CAST(id AS STRING), 'x', "
        f"       CAST(i AS STRING)) "
        # benchmark leak: 5 tokens shared with benchmark doc id
        f"WHEN id % 50 = 7 AND i BETWEEN {LEAK_AT} "
        f"  AND {LEAK_AT + LEAK_LEN - 1} "
        f"  THEN concat('b', CAST(id AS STRING), 'x', "
        f"       CAST(i - {LEAK_AT} AS STRING)) "
        f"ELSE concat('w', pmod(xxhash64({base}, i), {VOCAB})) END"
    )
    nw = f"IF(id % 50 = 2, 10, {WORDS})"
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.expr(
            f"array_join(transform(sequence(0, {nw} - 1), "
            f"i -> {word}), ' ')"
        ).alias("text"),
    )


def synth_benchmark(spark, n: int):
    """One held-out benchmark doc per class-7 corpus doc: its leak
    5-gram plus 10 filler words from a disjoint 'v' namespace (no
    accidental 5-gram overlap with the corpus)."""
    from pyspark.sql import functions as F

    return (
        spark.range(n)
        .filter(F.col("id") % 50 == 7)
        .select(
            F.col("id").alias("bench_id"),
            F.expr(
                f"array_join(concat("
                f"transform(sequence(0, {LEAK_LEN - 1}), "
                f"  i -> concat('b', CAST(id AS STRING), 'x', "
                f"       CAST(i AS STRING))), "
                f"transform(sequence(0, 9), "
                f"  i -> concat('v', pmod(xxhash64(id, i + 9000), "
                f"       {VOCAB})))), ' ')"
            ).alias("text"),
        )
    )


def run_shared_tokens_arm(
    spark, n: int, cls: int, staging: str = "persist"
) -> dict:
    """The tokenize-once re-composition (round 11, VERDICT r10 #1):
    stage 1 materializes the token ARRAY as a column; every later
    stage (fingerprint, shingles, ExactSubstr windows, decontam
    n-grams, packing lengths) consumes it directly — the tokenizer
    runs once per surviving doc instead of once per stage. Excision
    rewrites only the token arrays of the docs it touches (the span
    join's null branch passes ``toks`` through). Stage masses are
    asserted EXACT against the same planted arithmetic as the
    re-tokenize arm.

    ``staging`` picks the stage-boundary medium: ``"persist"``
    (executor cache, the within-memory record arm) or ``"parquet"``
    (write/read a columnar file per boundary — the at-scale
    discipline once the carried token column outgrows the storage
    pool; PIPELINE_SCALE_PROBE's 4M point measured the persist arm
    falling off the linear path exactly there, while the token
    array's parquet form is ~8× smaller than its in-memory cache,
    TOKEN_STAGING_PROBE). Within-stage working state (shingle sets,
    window keys, pair verdicts — all bounded) persists in both
    modes."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from database_join_spark.operators import dedup as D
    from database_join_spark.operators import text as T
    from database_join_spark.queries.pipeline import (
        JACCARD_THRESHOLD,
        SHINGLE_N,
        _DECON_N,
        _PACK_BUDGET,
        pack_sequences_frame,
        substring_excise_from_tokens,
        substring_window_keys,
    )

    assert staging in ("persist", "parquet"), staging
    stage_dir = (
        tempfile.mkdtemp(prefix="e2e_stage_")
        if staging == "parquet"
        else None
    )
    stages: dict = {}
    t_total = time.perf_counter()

    def materialize(name: str, df):
        """Stage-boundary materialization under the chosen medium."""
        if staging == "persist":
            return df.persist()
        path = f"{stage_dir}/{name}"
        df.write.parquet(path)
        return spark.read.parquet(path)

    def release(df) -> None:
        if staging == "persist":
            df.unpersist()

    def stage(name: str, df, expected_rows: int | None = None):
        t0 = time.perf_counter()
        df = materialize(name, df)
        rows = df.count()
        sec = round(time.perf_counter() - t0, 2)
        rec = {"rows": rows, "sec": sec}
        if expected_rows is not None:
            assert rows == expected_rows, (name, rows, expected_rows)
            rec["expected_rows"] = expected_rows
            rec["exact_match"] = True
        stages[name] = rec
        print(f"# shared/{name}: {rec}", file=sys.stderr)
        return df

    corpus = synth_corpus(spark, n)

    # ---- stage 1: tokenize ONCE + quality gate. n_tokens and the
    # fingerprint both derive from the same tokens(text) expression
    # inside one projection (physical-level subexpression
    # elimination shares it); from here on no stage touches text.
    toks = corpus.select(
        "doc_id",
        T.tokens("text").alias("toks"),
        T.token_count("text").alias("n_tokens"),
        T.fingerprint("text").alias("fp"),
    )
    s1 = stage(
        "quality_gate",
        toks.filter(F.col("n_tokens") >= 20),
        n - cls,
    )

    # ---- stage 2: exact dedup — carries the token array forward
    s2 = stage(
        "dedup_exact",
        D.dedup_exact(s1, ["fp"], "doc_id").select("doc_id", "toks"),
        n - 2 * cls,
    )
    release(s1)

    # ---- stage 3: MinHash retire — HASHED shingles straight off the
    # carried column (the re-tokenize arm pays tokens() + shingle
    # strings again here): shingle_hashes_from_tokens builds the
    # distinct int64 set without ever allocating an n-gram string,
    # the signature fold skips the string→hash pass, and the
    # pair-verify shuffle carries 8-byte hashes instead of ~20-byte
    # strings (MINHASH_HASHED_PROBE: 2.08× at 1M, identical verified
    # pairs; the exact planted-pair assert below is the per-run
    # collision check). The shingle frame persists (doc_id, sh)
    # ONLY: s2 already holds the token arrays, so the survivor
    # filter reads s2 instead of carrying toks through the shingle
    # cache — at 1M docs a (toks + sh) persist is ~2× the array
    # mass and OOMed an 8 GB heap on the first cut of this arm; the
    # carried column's cache cost is real and this is where it's
    # paid correctly.
    t0 = time.perf_counter()
    sh = s2.select(
        "doc_id",
        D.shingle_hashes_from_tokens("toks", SHINGLE_N).alias("sh"),
    ).persist()
    cand = D.lsh_candidate_pairs(
        sh,
        id_col="doc_id",
        shingle_col="sh",
        num_hashes=32,
        bands=16,
        prehashed=True,
    )
    verified = (
        D.pair_payloads(
            sh, cand,
            id_col="doc_id", payload_col="sh",
        )
        .select("id_a", "id_b", D.jaccard("sh_a", "sh_b").alias("jac"))
        .filter(F.col("jac") >= JACCARD_THRESHOLD)
        .select("id_a", "id_b")
        .persist()
    )
    n_pairs = verified.count()
    assert n_pairs == cls, (n_pairs, cls)
    clusters = D.connected_components(verified)
    s3 = s2.join(
        F.broadcast(clusters), s2.doc_id == clusters.id, "left"
    )
    s3 = materialize(
        "minhash_survivors",
        s3.filter(
            F.col("cluster_id").isNull()
            | (F.col("cluster_id") == F.col("doc_id"))
        ).select("doc_id", "toks"),
    )
    rows3 = s3.count()
    sec3 = round(time.perf_counter() - t0, 2)
    assert rows3 == n - 3 * cls, (rows3, n - 3 * cls)
    stages["dedup_minhash_retire"] = {
        "rows": rows3,
        "expected_rows": n - 3 * cls,
        "verified_pairs": n_pairs,
        "expected_pairs": cls,
        "sec": sec3,
        "exact_match": True,
    }
    print(f"# shared/dedup_minhash_retire: "
          f"{stages['dedup_minhash_retire']}", file=sys.stderr)
    verified.unpersist()
    sh.unpersist()
    release(s2)

    # ---- stage 4: ExactSubstr excision over token arrays — only
    # the ~2·cls touched docs get a rewritten array. The window-key
    # ARRAYS persist first (round 11, SUBSTR_WINCACHE_PROBE): the
    # span plan consumes the window stream twice (dup groupBy + hit
    # probe, a broadcast semi-join — no exchange reuse), so a
    # persisted (doc_id, wkeys) frame pays key production once;
    # 2.66× on the isolated span pass at 1M (53.6 → 20.2 s, +773 MB
    # cache ≈ half the token cache; persisting the EXPLODED rows
    # instead measured 22.4 s at the same cache mass — close second,
    # but the array form also keeps the explode one-step-safe).
    t0 = time.perf_counter()
    wkeys = substring_window_keys(
        s3.select("doc_id", "toks"), hash_keys=True
    ).persist()
    wkeys.count()
    s4 = materialize(
        "substring_excised",
        substring_excise_from_tokens(
            s3.select("doc_id", "toks"), keys_df=wkeys
        ).select(
            "doc_id",
            (F.col("n_tokens") - F.col("n_tokens_removed")).alias(
                "n_tokens"
            ),
            "n_tokens_removed",
            F.col("toks_clean").alias("toks"),
        ),
    )
    agg4 = s4.agg(
        F.count(F.lit(1)).alias("rows"),
        F.sum("n_tokens_removed").alias("removed"),
        F.sum((F.col("n_tokens_removed") > 0).cast("long")).alias(
            "docs_touched"
        ),
    ).collect()[0]
    sec4 = round(time.perf_counter() - t0, 2)
    assert agg4["rows"] == n - 3 * cls
    assert agg4["removed"] == SPAN_LEN * 2 * cls, agg4
    assert agg4["docs_touched"] == 2 * cls, agg4
    stages["substring_excise"] = {
        "rows": agg4["rows"],
        "tokens_removed": agg4["removed"],
        "expected_tokens_removed": SPAN_LEN * 2 * cls,
        "docs_touched": agg4["docs_touched"],
        "sec": sec4,
        "exact_match": True,
    }
    print(f"# shared/substring_excise: {stages['substring_excise']}",
          file=sys.stderr)
    wkeys.unpersist()
    release(s3)

    # ---- stage 5: decontam — n-gram shingles off the carried
    # column; the benchmark side is identical to the other arm
    bench_sh = (
        synth_benchmark(spark, n)
        .select(T.tokens("text").alias("toks"))
        .select(
            F.explode(
                D.shingles_from_tokens("toks", _DECON_N)
            ).alias("shingle")
        )
        .distinct()
    )
    corpus_sh = s4.select(
        "doc_id",
        F.explode(D.shingles_from_tokens("toks", _DECON_N)).alias(
            "shingle"
        ),
    )
    t0 = time.perf_counter()
    flagged = (
        corpus_sh.join(F.broadcast(bench_sh), "shingle")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_hits"))
        .persist()
    )
    n_flagged = flagged.count()
    assert n_flagged == cls, (n_flagged, cls)
    s5 = materialize(
        "decontaminated", s4.join(flagged, "doc_id", "left_anti")
    )
    rows5 = s5.count()
    sec5 = round(time.perf_counter() - t0, 2)
    assert rows5 == n - 4 * cls, (rows5, n - 4 * cls)
    stages["decontam_ngram"] = {
        "rows": rows5,
        "expected_rows": n - 4 * cls,
        "flagged": n_flagged,
        "expected_flagged": cls,
        "sec": sec5,
        "exact_match": True,
    }
    print(f"# shared/decontam_ngram: {stages['decontam_ngram']}",
          file=sys.stderr)
    flagged.unpersist()
    release(s4)

    # ---- stage 6: packing — lengths already carried as n_tokens
    t0 = time.perf_counter()
    packed = pack_sequences_frame(
        s5.select(
            "doc_id",
            F.lit("all").alias("lang"),
            F.col("n_tokens"),
        ),
        budget=_PACK_BUDGET,
    )
    agg6 = packed.agg(
        F.count(F.lit(1)).alias("n_seqs"),
        F.sum("n_docs").alias("docs"),
        F.sum("seq_tokens").alias("tokens"),
        F.max("seq_tokens").alias("max_seq"),
    ).collect()[0]
    sec6 = round(time.perf_counter() - t0, 2)
    expected_tokens = WORDS * (n - 4 * cls) - SPAN_LEN * 2 * cls
    assert agg6["docs"] == n - 4 * cls, agg6
    assert agg6["tokens"] == expected_tokens, (
        agg6["tokens"], expected_tokens,
    )
    assert agg6["max_seq"] < _PACK_BUDGET + WORDS, agg6
    stages["pack_sequences"] = {
        "n_seqs": agg6["n_seqs"],
        "docs_packed": agg6["docs"],
        "tokens_packed": agg6["tokens"],
        "expected_tokens": expected_tokens,
        "max_seq_tokens": agg6["max_seq"],
        "budget": _PACK_BUDGET,
        "sec": sec6,
        "exact_match": True,
    }
    print(f"# shared/pack_sequences: {stages['pack_sequences']}",
          file=sys.stderr)
    release(s5)
    if stage_dir is not None:
        shutil.rmtree(stage_dir, ignore_errors=True)

    total = round(time.perf_counter() - t_total, 2)
    return {
        "staging": staging,
        "stages": stages,
        "total_sec": total,
        "docs_per_sec_end_to_end": round(n / total),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=1_000_000)
    ap.add_argument("--json", default="PIPELINE_E2E_PROBE.json")
    ap.add_argument(
        "--quick", action="store_true",
        help="50k-doc smoke of the full harness + exact counts",
    )
    ap.add_argument(
        "--skip-shared", action="store_true",
        help="skip the shared-tokens arm (arm A + appendices only)",
    )
    args = ap.parse_args()
    n = 50_000 if args.quick else args.docs
    assert n % 50 == 0, "doc count must be a multiple of 50"
    cls = n // 50

    from pyspark.sql import functions as F

    from database_join_spark.hostinfo import host_snapshot
    from database_join_spark.operators import dedup as D
    from database_join_spark.operators import text as T
    from database_join_spark.queries.pipeline import (
        JACCARD_THRESHOLD,
        SHINGLE_N,
        _DECON_N,
        _PACK_BUDGET,
        pack_sequences_frame,
        substring_excise_frame,
    )
    from database_join_spark.session import get_spark

    spark = get_spark(app_name="pipeline-e2e-probe")
    spark.sparkContext.setLogLevel("ERROR")

    out: dict = {
        "docs": n,
        "per_class": cls,
        "host_start": host_snapshot(),
        "stages": {},
    }
    t_total = time.perf_counter()

    def stage(name: str, df, expected_rows: int | None = None):
        """Materialize one stage behind a persist boundary and time
        it — the composition cost the per-family probes amortize
        away. Returns (df, rows)."""
        t0 = time.perf_counter()
        df = df.persist()
        rows = df.count()
        sec = round(time.perf_counter() - t0, 2)
        rec = {"rows": rows, "sec": sec}
        if expected_rows is not None:
            assert rows == expected_rows, (name, rows, expected_rows)
            rec["expected_rows"] = expected_rows
            rec["exact_match"] = True
        out["stages"][name] = rec
        print(f"# {name}: {rec}", file=sys.stderr)
        return df

    corpus = synth_corpus(spark, n)

    # ---- stage 1: quality gate (generation cost folds in here —
    # the first materialization pays the synth scan)
    toks = corpus.select(
        "doc_id",
        "text",
        T.token_count("text").alias("n_tokens"),
        T.fingerprint("text").alias("fp"),
    )
    s1 = stage(
        "quality_gate",
        toks.filter(F.col("n_tokens") >= 20),
        n - cls,
    )

    # ---- stage 2: exact dedup (min-id survivor per fingerprint)
    s2 = stage(
        "dedup_exact",
        D.dedup_exact(s1, ["fp"], "doc_id").select("doc_id", "text"),
        n - 2 * cls,
    )

    # ---- stage 3: MinHash-LSH near-dup retire (the at-scale path:
    # banded candidates, exact-Jaccard verify, cluster-min survivor)
    sh = (
        s2.select("doc_id", "text", T.tokens("text").alias("toks"))
        .select(
            "doc_id",
            "text",
            D.shingles_from_tokens("toks", SHINGLE_N).alias("sh"),
        )
        .persist()
    )
    t0 = time.perf_counter()
    cand = D.lsh_candidate_pairs(
        sh.select("doc_id", "sh"),
        id_col="doc_id",
        shingle_col="sh",
        num_hashes=32,
        bands=16,
    )
    verified = (
        D.pair_payloads(
            sh.select("doc_id", "sh"), cand,
            id_col="doc_id", payload_col="sh",
        )
        .select("id_a", "id_b", D.jaccard("sh_a", "sh_b").alias("jac"))
        .filter(F.col("jac") >= JACCARD_THRESHOLD)
        .select("id_a", "id_b")
        .persist()
    )
    n_pairs = verified.count()
    assert n_pairs == cls, (n_pairs, cls)
    clusters = D.connected_components(verified)
    s3 = sh.join(
        F.broadcast(clusters), sh.doc_id == clusters.id, "left"
    ).filter(
        F.col("cluster_id").isNull()
        | (F.col("cluster_id") == F.col("doc_id"))
    ).select("doc_id", "text").persist()
    rows3 = s3.count()
    sec3 = round(time.perf_counter() - t0, 2)
    assert rows3 == n - 3 * cls, (rows3, n - 3 * cls)
    out["stages"]["dedup_minhash_retire"] = {
        "rows": rows3,
        "expected_rows": n - 3 * cls,
        "verified_pairs": n_pairs,
        "expected_pairs": cls,
        "sec": sec3,
        "exact_match": True,
    }
    print(f"# dedup_minhash_retire: {out['stages']['dedup_minhash_retire']}",
          file=sys.stderr)
    verified.unpersist()
    sh.unpersist()
    s1.unpersist()
    s2.unpersist()

    # ---- stage 4: ExactSubstr span excision (both pair members
    # lose the 12-token run; doc count unchanged)
    t0 = time.perf_counter()
    # hash_keys: the documented at-scale window-key spelling
    # (SUBSTR_HASHKEY_PROBE: 2.0×/1.6× at 1M docs, identical spans);
    # the exact planted-mass asserts below double as the collision
    # check
    s4 = substring_excise_frame(s3, hash_keys=True).select(
        "doc_id",
        (F.col("n_tokens") - F.col("n_tokens_removed")).alias("n_tokens"),
        F.col("n_tokens_removed"),
        F.col("clean_text").alias("text"),
    ).persist()
    agg4 = s4.agg(
        F.count(F.lit(1)).alias("rows"),
        F.sum("n_tokens_removed").alias("removed"),
        F.sum((F.col("n_tokens_removed") > 0).cast("long")).alias(
            "docs_touched"
        ),
    ).collect()[0]
    sec4 = round(time.perf_counter() - t0, 2)
    assert agg4["rows"] == n - 3 * cls
    assert agg4["removed"] == SPAN_LEN * 2 * cls, agg4
    assert agg4["docs_touched"] == 2 * cls, agg4
    out["stages"]["substring_excise"] = {
        "rows": agg4["rows"],
        "tokens_removed": agg4["removed"],
        "expected_tokens_removed": SPAN_LEN * 2 * cls,
        "docs_touched": agg4["docs_touched"],
        "sec": sec4,
        "exact_match": True,
    }
    print(f"# substring_excise: {out['stages']['substring_excise']}",
          file=sys.stderr)
    s3.unpersist()

    # ---- stage 5: n-gram decontamination against the benchmark
    # (benchmark side collapses to a broadcast distinct-shingle set)
    # all explodes below are ONE-STEP (generate the expression in
    # the same select): the alias-then-explode spelling pays the
    # inferred-filter re-inlining trap — one tokenizer run per
    # n-gram position per row, measured 19× (round 10;
    # dedup.shingles_from_tokens docstring)
    bench_sh = (
        synth_benchmark(spark, n)
        .select(T.tokens("text").alias("toks"))
        .select(
            F.explode(
                D.shingles_from_tokens("toks", _DECON_N)
            ).alias("shingle")
        )
        .distinct()
    )
    corpus_sh = s4.select(
        "doc_id", T.tokens("text").alias("toks")
    ).select(
        "doc_id",
        F.explode(D.shingles_from_tokens("toks", _DECON_N)).alias(
            "shingle"
        ),
    )
    t0 = time.perf_counter()
    flagged = (
        corpus_sh.join(F.broadcast(bench_sh), "shingle")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_hits"))
        .persist()
    )
    n_flagged = flagged.count()
    assert n_flagged == cls, (n_flagged, cls)
    s5 = s4.join(flagged, "doc_id", "left_anti").persist()
    rows5 = s5.count()
    sec5 = round(time.perf_counter() - t0, 2)
    assert rows5 == n - 4 * cls, (rows5, n - 4 * cls)
    out["stages"]["decontam_ngram"] = {
        "rows": rows5,
        "expected_rows": n - 4 * cls,
        "flagged": n_flagged,
        "expected_flagged": cls,
        "sec": sec5,
        "exact_match": True,
    }
    print(f"# decontam_ngram: {out['stages']['decontam_ngram']}",
          file=sys.stderr)

    # ---- stage 6: sequence packing over the final survivors
    t0 = time.perf_counter()
    packed = pack_sequences_frame(
        s5.select(
            "doc_id",
            F.lit("all").alias("lang"),
            F.col("n_tokens"),
        ),
        budget=_PACK_BUDGET,
    )
    agg6 = packed.agg(
        F.count(F.lit(1)).alias("n_seqs"),
        F.sum("n_docs").alias("docs"),
        F.sum("seq_tokens").alias("tokens"),
        F.max("seq_tokens").alias("max_seq"),
    ).collect()[0]
    sec6 = round(time.perf_counter() - t0, 2)
    expected_tokens = (
        WORDS * (n - 4 * cls) - SPAN_LEN * 2 * cls
    )
    assert agg6["docs"] == n - 4 * cls, agg6
    assert agg6["tokens"] == expected_tokens, (
        agg6["tokens"], expected_tokens,
    )
    # a doc is never split, so a sequence overflows by < one doc
    assert agg6["max_seq"] < _PACK_BUDGET + WORDS, agg6
    out["stages"]["pack_sequences"] = {
        "n_seqs": agg6["n_seqs"],
        "docs_packed": agg6["docs"],
        "tokens_packed": agg6["tokens"],
        "expected_tokens": expected_tokens,
        "max_seq_tokens": agg6["max_seq"],
        "budget": _PACK_BUDGET,
        "sec": sec6,
        "exact_match": True,
    }
    print(f"# pack_sequences: {out['stages']['pack_sequences']}",
          file=sys.stderr)
    s5.unpersist()

    out["total_sec"] = round(time.perf_counter() - t_total, 2)
    out["docs_per_sec_end_to_end"] = round(n / out["total_sec"])

    # ---- appendix (outside the composed total): the Bloom tier of
    # the dominant stage — bitmap-prune the corpus shingle stream
    # before the exact verify join, estimate-driven sizing
    # (plans.sizing.decide_prefilter, the shipped decontam_bloom /
    # join_bloom_prefilter decision layer). Must flag the IDENTICAL
    # doc set.
    from database_join_spark.operators import bloom as B
    from database_join_spark.plans.sizing import decide_prefilter

    bench_set = bench_sh.persist()
    t0 = time.perf_counter()
    est_bench = bench_set.count()  # exact: the set is benchmark-sized
    est_corpus = corpus_sh.select(
        F.approx_count_distinct("shingle").alias("n")
    ).first()["n"]
    sizing = decide_prefilter(est_bench, est_corpus)
    decide_sec = round(time.perf_counter() - t0, 2)
    t0 = time.perf_counter()
    bitmap = B.bitmap_of(bench_set, "shingle", bits=sizing.bits)
    pre = B.prefilter(corpus_sh, "shingle", bitmap, bits=sizing.bits)
    flagged_bloom = (
        pre.join(F.broadcast(bench_set), "shingle")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_hits"))
        .persist()
    )
    n_flagged_bloom = flagged_bloom.count()
    sec5b = round(time.perf_counter() - t0, 2)
    diff = flagged_bloom.join(flagged, "doc_id", "left_anti").count()
    assert n_flagged_bloom == n_flagged and diff == 0, (
        n_flagged_bloom, n_flagged, diff,
    )
    out["decontam_bloom_tier"] = {
        "flagged": n_flagged_bloom,
        "identical_to_exact": True,
        "bits": sizing.bits,
        "est_bench_shingles": est_bench,
        "est_corpus_shingles": est_corpus,
        "survivor_frac_predicted": round(sizing.survivor_frac, 6),
        "apply_predicted": sizing.apply,
        "decide_sec": decide_sec,
        "flag_sec": sec5b,
        # the exact arm's sec also includes the survivor anti-join +
        # count; the flag computation dominates it
        "exact_arm_sec": sec5,
    }
    print(f"# decontam_bloom_tier: {out['decontam_bloom_tier']}",
          file=sys.stderr)
    flagged_bloom.unpersist()

    # ---- appendix 2: the HASHED-shingle two-tier spelling (round
    # 10, the lever the Bloom negative named): tier 1 explodes
    # xxhash64 longs built straight from the token columns — no
    # n-gram string is ever allocated — and nominates candidate
    # docs; tier 2 re-runs the exact string spelling on candidates
    # only. Flag set must again be identical.
    t0 = time.perf_counter()
    # tokens must be a materialized column (operator contract);
    # tier-1 stream is (doc_id, hash) only — no text, no alias step
    hsh = s4.select(
        "doc_id", T.tokens("text").alias("toks")
    ).select(
        "doc_id",
        F.explode(
            D.shingle_hashes_from_tokens("toks", _DECON_N)
        ).alias("h"),
    )
    bench_h = (
        synth_benchmark(spark, n)
        .select(T.tokens("text").alias("toks"))
        .select(
            F.explode(
                D.shingle_hashes_from_tokens("toks", _DECON_N)
            ).alias("h")
        )
        .distinct()
    )
    cand_ids = (
        hsh.join(F.broadcast(bench_h), "h", "left_semi")
        .select("doc_id")
        .distinct()
    )
    # rejoin for text AFTER the prune: exploding (doc_id, hash)
    # pairs keeps the 8-byte tier-1 stream 8 bytes — carrying the
    # text column through the explode would replicate each doc's
    # full text once per n-gram (measured 1.7x SLOWER than the
    # exact arm at smoke scale before this split)
    cand = s4.join(F.broadcast(cand_ids), "doc_id").select(
        "doc_id", "text"
    )
    cand_sh = cand.select(
        "doc_id", T.tokens("text").alias("toks")
    ).select(
        "doc_id",
        F.explode(D.shingles_from_tokens("toks", _DECON_N)).alias(
            "shingle"
        ),
    )
    flagged_hashed = (
        cand_sh.join(F.broadcast(bench_set), "shingle")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_hits"))
        .persist()
    )
    n_flagged_hashed = flagged_hashed.count()
    sec5h = round(time.perf_counter() - t0, 2)
    diff_h = flagged_hashed.join(flagged, "doc_id", "left_anti").count()
    assert n_flagged_hashed == n_flagged and diff_h == 0, (
        n_flagged_hashed, n_flagged, diff_h,
    )
    out["decontam_hashed_tier"] = {
        "flagged": n_flagged_hashed,
        "identical_to_exact": True,
        "flag_sec": sec5h,
        "exact_arm_sec": sec5,
        "bloom_arm_sec": sec5b,
    }
    print(f"# decontam_hashed_tier: {out['decontam_hashed_tier']}",
          file=sys.stderr)
    flagged_hashed.unpersist()
    bench_set.unpersist()
    flagged.unpersist()
    s4.unpersist()

    # ---- arm B: the tokenize-once re-composition (VERDICT r10 #1),
    # same planted corpus, same stage protocol, same exact asserts —
    # run AFTER arm A so the headline record keeps its capture
    # conditions and the comparison is same-process, same-JVM-warmth
    # (ordering favors arm B only through page cache, which the
    # synthetic generator doesn't touch).
    if not args.skip_shared:
        out["shared_tokens_arm"] = run_shared_tokens_arm(spark, n, cls)
        out["shared_tokens_arm"]["retokenize_total_sec"] = out["total_sec"]
        out["shared_tokens_arm"]["speedup_vs_retokenize"] = round(
            out["total_sec"] / out["shared_tokens_arm"]["total_sec"], 3
        )
        print(
            f"# arm comparison: retokenize {out['total_sec']} s vs "
            f"shared-tokens {out['shared_tokens_arm']['total_sec']} s "
            f"({out['shared_tokens_arm']['speedup_vs_retokenize']}x)",
            file=sys.stderr,
        )

    out["host_end"] = host_snapshot()
    Path(_REPO, args.json).write_text(json.dumps(out, indent=1) + "\n")
    print(json.dumps({k: v for k, v in out.items()
                      if k not in ("stages", "shared_tokens_arm")}))
    spark.stop()


if __name__ == "__main__":
    main()
