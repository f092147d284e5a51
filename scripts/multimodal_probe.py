#!/usr/bin/env python
"""Multimodal binary-column throughput at volume (round 9).

`multimodal_features` (SURVEY §2 #extension, driver row r06) is the
one operator family whose 100 TB posture — Arrow-batched
mapInPandas over opaque binary payloads, zero shuffle — had no
volume measurement behind it. This probe prices the three shipped
motions on n synthetic documents:

- ``encode``   — `attach_multimodal_payload`: text → real PNG
  (zlib IDAT, CRC chunks) / RIFF-WAVE PCM16 / UTF-8 payloads in
  mapInPandas, written to parquet (binary columns at rest — the
  ingest motion and the storage contract in one stage);
- ``decode``   — `extract_features` over the STORED payload table:
  magic-byte sniff + real container parse per row (the training-
  pipeline motion: feature-extract a corpus you did not encode);
- ``frames``   — `sample_frames(every_n=4)`: the 1→N row-explosion
  plumbing, frames/s out.

The Arrow batch shape is measured, not assumed:
``spark.sql.execution.arrow.maxRecordsPerBatch`` arms at 10k
(default) and 1k on the decode stage — the batch size is the only
knob between the JVM and the Python worker on this path.

Correctness anchor: the decoded width/height/sample-rate fields are
aggregated and asserted equal to the same aggregates computed in
closed form from the generator arithmetic (doc_id mod 3 picks the
modality; png width = 4 + d%13, wav n_samples = 400 + (d%50)*10) —
a decoder that misparses bytes fails the assert, so the throughput
numbers are for a verified decode, not a no-op.

Usage: python scripts/multimodal_probe.py [n_docs] [--quick]
       (default 2e6)
Writes MULTIMODAL_PROBE.json at the repo root.
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

_BATCH_CONF = "spark.sql.execution.arrow.maxRecordsPerBatch"
REPS = 2


def main() -> None:
    from pyspark.sql import functions as F

    from database_join_spark.hostinfo import host_snapshot
    from database_join_spark.operators import multimodal as M
    from database_join_spark.session import get_spark

    args = [a for a in sys.argv[1:] if a != "--quick"]
    quick = "--quick" in sys.argv[1:]
    n = int(float(args[0])) if args else 2_000_000
    if quick:
        n = 100_000

    spark = get_spark(app_name="multimodal-probe")
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("synthetic document body "),
            F.col("id").cast("string"),
            F.lit(" lorem ipsum dolor sit amet " * 8),
        ).alias("text"),
    )

    store = tempfile.mkdtemp(prefix="mm_probe_")
    out: dict = {
        "docs": n,
        "reps": REPS,
        "host_start": host_snapshot(),
        "arms": {},
    }
    try:
        # -- encode (+ write: the ingest motion ends at rest) -------
        enc_runs = []
        for _ in range(REPS):
            t0 = time.perf_counter()
            M.attach_multimodal_payload(docs).write.mode(
                "overwrite"
            ).parquet(f"{store}/payloads")
            enc_runs.append(round(time.perf_counter() - t0, 2))
        stored = spark.read.parquet(f"{store}/payloads")
        payload_mb = stored.agg(
            (F.sum(F.octet_length("payload")) / 1048576).alias("mb")
        ).collect()[0]["mb"]
        out["arms"]["encode_write"] = {
            "wall_sec": min(enc_runs),
            "runs": enc_runs,
            "docs_per_sec": round(n / min(enc_runs)),
            "payload_mb": round(payload_mb, 1),
        }
        print(f"# encode_write: {out['arms']['encode_write']}",
              file=sys.stderr)

        # -- decode from rest, Arrow batch-size arms ----------------
        # closed-form expectations from the generator arithmetic
        d = F.col("doc_id")
        exp = docs.select(
            F.when(d % 3 == 0, (4 + d % 13) * (3 + d % 7))
            .otherwise(0).alias("px"),
            F.when(d % 3 == 1, 400 + (d % 50) * 10)
            .otherwise(0).alias("samp"),
        ).agg(
            F.sum("px").alias("px"), F.sum("samp").alias("samp")
        ).collect()[0]
        prev = spark.conf.get(_BATCH_CONF, None)
        try:
            for batch in (10_000, 1_000):
                spark.conf.set(_BATCH_CONF, str(batch))
                runs = []
                for _ in range(REPS):
                    t0 = time.perf_counter()
                    got = (
                        M.extract_features(
                            stored.select("doc_id", "payload")
                        )
                        .agg(
                            F.sum(
                                F.coalesce(
                                    F.col("width") * F.col("height"),
                                    F.lit(0),
                                )
                            ).alias("px"),
                            F.sum(
                                F.coalesce("n_samples", F.lit(0))
                            ).alias("samp"),
                            F.count(F.lit(1)).alias("n"),
                        )
                        .collect()[0]
                    )
                    runs.append(round(time.perf_counter() - t0, 2))
                assert got["n"] == n, got
                assert (got["px"], got["samp"]) == (
                    exp["px"], exp["samp"],
                ), (dict(got.asDict()), dict(exp.asDict()))
                out["arms"][f"decode_batch{batch}"] = {
                    "wall_sec": min(runs),
                    "runs": runs,
                    "docs_per_sec": round(n / min(runs)),
                    "decode_verified": True,
                }
                print(
                    f"# decode_batch{batch}: "
                    f"{out['arms'][f'decode_batch{batch}']}",
                    file=sys.stderr,
                )
        finally:
            if prev is None:
                spark.conf.unset(_BATCH_CONF)
            else:
                spark.conf.set(_BATCH_CONF, prev)

        # -- frame sampling: 1 -> N explosion ------------------------
        fr_runs, frames_out = [], 0
        for _ in range(REPS):
            t0 = time.perf_counter()
            frames_out = M.sample_frames(
                stored.select("doc_id", "payload"), every_n=4
            ).count()
            fr_runs.append(round(time.perf_counter() - t0, 2))
        out["arms"]["frame_sample"] = {
            "wall_sec": min(fr_runs),
            "runs": fr_runs,
            "docs_per_sec": round(n / min(fr_runs)),
            "frames_out": frames_out,
            "frames_per_sec": round(frames_out / min(fr_runs)),
        }
        print(f"# frame_sample: {out['arms']['frame_sample']}",
              file=sys.stderr)
    finally:
        shutil.rmtree(store, ignore_errors=True)

    out["host_end"] = host_snapshot()
    Path(_REPO, "MULTIMODAL_PROBE.json").write_text(
        json.dumps(out, indent=1) + "\n"
    )
    print(json.dumps({k: v for k, v in out.items() if k != "arms"}))


if __name__ == "__main__":
    main()
