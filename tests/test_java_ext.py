"""End-to-end test for the avg_int Catalyst session extension
(SURVEY §4.3 item 3, VERDICT r04 Next #9): jar on ``spark.jars``,
class on ``spark.sql.extensions``, and the function must resolve to
``sum(x) DIV count(x)`` in the plan and produce integer-division
averages — the reference's aggregate contract (q4112.c:300-334).

Runs in a SUBPROCESS because extensions are build-time session
state: the shared test session must not (and could not) load them.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
JAR = REPO / "java_ext" / "database_join_spark_ext.jar"

_PROG = r"""
import json, sys
from pyspark.sql import SparkSession

jar = sys.argv[1]
spark = (
    SparkSession.builder.master("local[4]")
    .appName("avg-int-ext-test")
    .config("spark.ui.enabled", "false")
    .config("spark.jars", jar)
    .config("spark.sql.extensions", "AvgIntExtensions")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
rows = [(g, v) for g in range(5) for v in range(g, 13 + 7 * g, 3)]
spark.createDataFrame(rows, "g INT, v INT").createOrReplaceTempView("t")

df = spark.sql("SELECT g, avg_int(v) AS a FROM t GROUP BY g ORDER BY g")
got = [(r["g"], r["a"]) for r in df.collect()]

# independent oracle: pure-python integer division (// on
# non-negative ints == SQL DIV here)
exp = {}
for g, v in rows:
    s, c = exp.get(g, (0, 0))
    exp[g] = (s + v, c + 1)
expected = [(g, s // c) for g, (s, c) in sorted(exp.items())]

plan = df._jdf.queryExecution().optimizedPlan().toString()
global_row = spark.sql("SELECT avg_int(v) AS a FROM t").collect()[0]["a"]
total_s = sum(v for _, v in rows)
print("RESULT " + json.dumps({
    "got": got,
    "expected": expected,
    "plan_has_div": (" div " in plan) or ("DIV" in plan),
    "plan_has_sum_count": ("sum(" in plan and "count(" in plan),
    "plan_has_avg_int": "avg_int" in plan,
    "global_ok": int(global_row) == total_s // len(rows),
}))
spark.stop()
"""


def test_avg_int_extension_resolves_and_matches_oracle():
    if not JAR.exists():
        subprocess.run(
            ["sh", str(REPO / "java_ext" / "build.sh")], check=True
        )
    proc = subprocess.run(
        [sys.executable, "-c", _PROG, str(JAR)],
        capture_output=True,
        text=True,
        env={**os.environ, "PYTHONPATH": str(REPO)},
        timeout=600,
    )
    payload = None
    for line in proc.stdout.splitlines():
        if line.startswith("RESULT "):
            payload = json.loads(line[len("RESULT "):])
    assert payload, f"no RESULT line:\n{proc.stdout}\n{proc.stderr}"
    assert payload["got"] == [
        [g, a] for g, a in payload["expected"]
    ] or payload["got"] == payload["expected"], payload
    # the function must be GONE from the resolved plan, replaced by
    # the integral-divide over sum/count
    assert not payload["plan_has_avg_int"], payload
    assert payload["plan_has_div"], payload
    assert payload["plan_has_sum_count"], payload
    assert payload["global_ok"], payload
