#!/usr/bin/env python
"""corpus_pipeline's dedup-survivor persist, A/B'd at 1M docs
(round 14, VERDICT r13 #6): the round-13 sf0.1 probe was an honest
WASH (2.32 vs 2.30 s — 5k docs make the recomputed branches too
cheap to matter) and the verdict ordered the wash resolved at the
scale the spelling was shipped for: the persist must pay end-to-end
at 1M docs or be reverted.

Same corpus generator as the registry-verbatim probe
(corpus_pipeline_registry_probe.write_corpus — planted classes for
every stage), same session, alternating recompute/persist reps,
bench-identical noop sink, answer identity asserted first.
Writes CORPUS_SURV_PERSIST_1M_PROBE.json.
"""

from __future__ import annotations

import json
import statistics
import sys
import tempfile
import time
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

DOCS = 1_000_000


def main() -> None:
    from database_join_spark.hostinfo import host_snapshot
    from database_join_spark.queries.pipeline import (
        _corpus_pipeline_frame,
    )
    from database_join_spark.session import configure_session, get_spark
    from scripts.corpus_pipeline_registry_probe import write_corpus

    spark = get_spark(app_name="corpus-surv-persist-1m")
    spark.sparkContext.setLogLevel("ERROR")

    tmp = tempfile.mkdtemp(prefix="corpus1m_")
    write_corpus(spark, DOCS, tmp)

    def run(persist: bool) -> float:
        configure_session(spark)  # drains prior persists, like bench
        t0 = time.perf_counter()
        _corpus_pipeline_frame(
            spark, tmp, persist_surv=persist
        ).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    # answer-parity guard first (also warms both plans)
    configure_session(spark)
    a_rows = sorted(
        map(tuple, _corpus_pipeline_frame(spark, tmp, False).collect())
    )
    configure_session(spark)
    b_rows = sorted(
        map(tuple, _corpus_pipeline_frame(spark, tmp, True).collect())
    )
    assert a_rows == b_rows, "persist_surv changed the answer at 1M"

    out: dict = {
        "docs": DOCS,
        "result_rows": len(a_rows),
        "host_start": host_snapshot(),
    }
    runs: dict[str, list[float]] = {"recompute": [], "persist": []}
    for _ in range(2):
        runs["recompute"].append(run(False))
        runs["persist"].append(run(True))
    out["runs"] = {k: [round(x, 2) for x in v] for k, v in runs.items()}
    out["median_recompute_sec"] = round(
        statistics.median(runs["recompute"]), 2
    )
    out["median_persist_sec"] = round(
        statistics.median(runs["persist"]), 2
    )
    out["speedup_persist"] = round(
        out["median_recompute_sec"] / out["median_persist_sec"], 3
    )
    out["host_end"] = host_snapshot()
    Path(_REPO, "CORPUS_SURV_PERSIST_1M_PROBE.json").write_text(
        json.dumps(out, indent=1) + "\n"
    )
    print(json.dumps(out, indent=1))
    spark.stop()
    import shutil

    shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
