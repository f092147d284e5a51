#!/usr/bin/env python
"""A/B the corpus_pipeline stage-boundary materialization at sf0.1
(round 13): the single-DAG spelling re-derives the dedup-survivor
boundary (documents scan + tokenize + fingerprint + window dedup)
once per consuming branch; persist_surv=True computes it once.

Same session, alternating A/B/A/B runs (the r12 e2e probe's
de-biasing discipline), bench-identical noop sink and median-of-7.
Writes CORPUS_SURV_PERSIST_PROBE.json. Also asserts both arms'
collected results are IDENTICAL (sorted rows) — the oracle-equality
guard for the restructure.
"""

from __future__ import annotations

import json
import statistics
import sys
import time
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

SF_DIR = "/root/testdata/sf0.1"


def main() -> None:
    from database_join_spark.queries.pipeline import (
        _corpus_pipeline_frame,
    )
    from database_join_spark.session import configure_session, get_spark

    spark = get_spark(app_name="corpus-surv-persist-probe")
    spark.sparkContext.setLogLevel("ERROR")

    def run(persist: bool) -> float:
        configure_session(spark)  # drains prior persists, like bench
        t0 = time.perf_counter()
        _corpus_pipeline_frame(spark, SF_DIR, persist_surv=persist).write.format(
            "noop"
        ).mode("overwrite").save()
        return time.perf_counter() - t0

    # answer-parity guard first (also warms both plans)
    configure_session(spark)
    a_rows = sorted(
        map(tuple, _corpus_pipeline_frame(spark, SF_DIR, False).collect())
    )
    configure_session(spark)
    b_rows = sorted(
        map(tuple, _corpus_pipeline_frame(spark, SF_DIR, True).collect())
    )
    assert a_rows == b_rows, "persist_surv changed the answer"

    runs: dict[str, list[float]] = {"recompute": [], "persist": []}
    for _ in range(7):
        runs["recompute"].append(run(False))
        runs["persist"].append(run(True))

    out = {
        "sf_dir": SF_DIR,
        "rows": len(a_rows),
        "answers_identical": True,
        "recompute_median_sec": round(
            statistics.median(runs["recompute"]), 4
        ),
        "persist_median_sec": round(statistics.median(runs["persist"]), 4),
        "recompute_runs": [round(r, 4) for r in runs["recompute"]],
        "persist_runs": [round(r, 4) for r in runs["persist"]],
    }
    Path(_REPO, "CORPUS_SURV_PERSIST_PROBE.json").write_text(
        json.dumps(out, indent=1) + "\n"
    )
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
