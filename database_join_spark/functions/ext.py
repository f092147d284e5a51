"""Runtime installation of the ``avg_int`` Catalyst extension.

``java_ext/src/AvgIntExtensions.java`` registers ``avg_int(x)`` →
``sum(x) DIV count(x)`` (the reference's integer-average contract,
``q4112.c:300-334``). The canonical path is build-time
(``spark.sql.extensions`` — tests/test_java_ext.py); this module is
the RUNTIME path for sessions the harness owns and built without the
conf (the correctness driver's, pytest's shared fixture).

Why runtime registration is sound here: ``avg_int`` is an
ANALYSIS-TIME-only function. The builder runs on the driver during
resolution and leaves nothing but built-in ``Sum``/``Count``/
``IntegralDivide`` in the resolved plan, so executors never load the
extension class and the jar never needs to reach the executor
classpath. Driver-side we load the jar through a dedicated
``URLClassLoader`` (its Spark-class references resolve through the
parent loader) and call the jar's ``install(SparkSession)`` via
reflection, which registers the builder on the live session's
``FunctionRegistry`` — the same registry ``injectFunction`` fills at
build time.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import SparkSession

#: Repo-relative jar location (committed artifact; java_ext/build.sh
#: rebuilds it from src/ against the installed pyspark's own jars).
JAR = Path(__file__).resolve().parents[2] / "java_ext" / "database_join_spark_ext.jar"


def install_avg_int(spark: SparkSession, jar: Path = JAR) -> None:
    """Register ``avg_int`` on ``spark``'s FunctionRegistry.

    Idempotent (re-registering replaces the entry with the same
    builder). Raises FileNotFoundError if the jar is missing —
    fail-loud beats a confusing UNRESOLVED_ROUTINE later.
    """
    if not jar.exists():
        raise FileNotFoundError(
            f"{jar} not found — run java_ext/build.sh first"
        )
    jvm = spark._jvm
    gw = spark.sparkContext._gateway
    url = jvm.java.io.File(str(jar)).toURI().toURL()
    urls = gw.new_array(jvm.java.net.URL, 1)
    urls[0] = url
    loader = jvm.java.net.URLClassLoader.newInstance(urls)
    clazz = loader.loadClass("AvgIntExtensions")
    ptypes = gw.new_array(jvm.java.lang.Class, 1)
    ptypes[0] = jvm.java.lang.Class.forName(
        "org.apache.spark.sql.SparkSession"
    )
    method = clazz.getMethod("install", ptypes)
    args = gw.new_array(jvm.java.lang.Object, 1)
    args[0] = spark._jsparkSession
    method.invoke(None, args)
