#!/bin/sh
# Build the avg_int session extension against the installed pyspark's
# own jars (no external toolchain beyond JDK 17's javac/jar).
set -e
cd "$(dirname "$0")"
JARS=$(python -c "import pyspark, os; print(os.path.join(os.path.dirname(pyspark.__file__),'jars'))")
mkdir -p classes
javac -encoding UTF-8 -cp "$JARS/*" -d classes src/AvgIntExtensions.java
jar cf database_join_spark_ext.jar -C classes .
echo "built $(pwd)/database_join_spark_ext.jar"
