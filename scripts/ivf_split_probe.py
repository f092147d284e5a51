"""Stored-IVF split starvation: read-side split confs as the fix
(round 9 follow-up to IVF_LAYOUT_PROBE).

The r08 layout A/B root-caused the stored-IVF full-coverage loss as
SPLIT starvation: the scoring stage's task structure follows the
scan partitioning, and the compact aligned layout (64 files,
157 MB) scans in 32 partitions while the fragmented layout's 2048
files yield 66 — fragmentation was accidentally buying parallelism
for the compute-bound consumer. Every arm in that probe varied the
FILES; none varied the READ. Spark sizes scan partitions from
`spark.sql.files.maxPartitionBytes` (128m) and pads small files
with `spark.sql.files.openCostInBytes` (4m) — per-query confs. This
probe holds the stored layouts fixed (same builds as the layout
probe) and varies only those two confs at read time, asking: can
the compact layout keep its scan-side win AND feed the scorer
enough splits to beat the fragmented accident — and how close does
a conf-tuned stored read get to the inline arm the full-coverage
regime currently recommends?

Writes IVF_SPLIT_PROBE.json. Usage:
python scripts/ivf_split_probe.py [--reps 3]
"""

from __future__ import annotations

import argparse
import json
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from database_join_spark.hostinfo import host_snapshot  # noqa: E402
from database_join_spark.operators import similarity as S  # noqa: E402
from database_join_spark.operators.bucketing import (  # noqa: E402
    write_partitioned_aligned,
)
from database_join_spark.session import get_spark  # noqa: E402

from ann_probe import CLUSTERS, K, synth_vectors  # noqa: E402

N = 1_000_000
N_QUERIES = 200

_MPB = "spark.sql.files.maxPartitionBytes"
_OPEN = "spark.sql.files.openCostInBytes"

#: (arm suffix, maxPartitionBytes, openCostInBytes); None = stock
READ_CONFS = [
    ("default", None, None),
    ("split4m", "4m", "256k"),
    ("split1m", "1m", "64k"),
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    spark = get_spark(app_name="ivf-split-probe")
    spark.sparkContext.setLogLevel("ERROR")

    corpus = synth_vectors(spark, N).persist()
    corpus.count()
    queries = corpus.orderBy("vec_id").limit(N_QUERIES).persist()
    queries.count()
    ivf_corpus, cents = S.ivf_index(corpus, n_centroids=CLUSTERS)

    idx_dir = tempfile.mkdtemp(prefix="ivf_split_")
    out: dict = {
        "vectors": N,
        "queries": N_QUERIES,
        "k": K,
        "n_probe": 8,
        "reps": args.reps,
        "host_start": host_snapshot(),
        "protocol": (
            "one session, one corpus, one KMeans fit, the layout "
            "probe's frag/aligned builds; only the read-side split "
            "confs vary; runs interleaved across arms, min reported"
        ),
    }
    try:
        ivf_corpus.write.partitionBy("cell").mode("overwrite").parquet(
            f"{idx_dir}/frag"
        )
        write_partitioned_aligned(ivf_corpus, f"{idx_dir}/aligned", ["cell"])

        def with_confs(mpb, open_cost):
            prev = {}
            for conf, v in ((_MPB, mpb), (_OPEN, open_cost)):
                prev[conf] = spark.conf.get(conf, None)
                if v is None:
                    spark.conf.unset(conf)
                else:
                    spark.conf.set(conf, v)
            return prev

        def restore(prev):
            for conf, v in prev.items():
                if v is None:
                    spark.conf.unset(conf)
                else:
                    spark.conf.set(conf, v)

        def run_once(path, mpb, open_cost):
            prev = with_confs(mpb, open_cost)
            try:
                index_df = spark.read.parquet(path)
                parts = index_df.rdd.getNumPartitions()
                t0 = time.perf_counter()
                rows = S.ivf_topk(
                    None, queries, k=K, n_probe=8, index=(index_df, cents)
                ).collect()
                assert len(rows) > 0
                return round(time.perf_counter() - t0, 2), parts
            finally:
                restore(prev)

        arm_keys = [
            (f"{layout}_{suffix}", f"{idx_dir}/{layout}", mpb, oc)
            for layout in ("frag", "aligned")
            for suffix, mpb, oc in READ_CONFS
        ]
        runs: dict[str, list[float]] = {k: [] for k, *_ in arm_keys}
        parts: dict[str, int] = {}
        for _ in range(args.reps):  # interleaved: drift hits all arms
            for name, path, mpb, oc in arm_keys:
                sec, p = run_once(path, mpb, oc)
                runs[name].append(sec)
                parts[name] = p
                print(f"# {name}: {sec} s ({p} scan partitions)",
                      file=sys.stderr)
        # same-session inline reference (the current full-coverage
        # recommendation)
        t0 = time.perf_counter()
        S.ivf_topk(
            corpus, queries, k=K, n_centroids=CLUSTERS, n_probe=8
        ).collect()
        out["inline_sec"] = round(time.perf_counter() - t0, 2)
        out["arms"] = {
            name: {
                "sec": min(rs),
                "runs": rs,
                "scan_partitions": parts[name],
            }
            for name, rs in runs.items()
        }
    finally:
        shutil.rmtree(idx_dir, ignore_errors=True)
        corpus.unpersist()
        queries.unpersist()

    out["host_end"] = host_snapshot()
    Path(__file__).resolve().parent.parent.joinpath(
        "IVF_SPLIT_PROBE.json"
    ).write_text(json.dumps(out, indent=1) + "\n")
    print(json.dumps({k: v for k, v in out.items() if k != "arms"}))


if __name__ == "__main__":
    main()
