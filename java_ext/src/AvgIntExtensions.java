/*
 * SURVEY.md §4.3 item 3 (stretch, VERDICT r04 Next #9): the one
 * custom Catalyst piece the build plan left unexercised — an
 * integer-average function `avg_int(x)` resolving to
 * `sum(x) DIV count(x)`, the reference's Part-1/Part-2 aggregate
 * contract (`q4112.c:300-334`: integer sums, integer division),
 * installed through the public `spark.sql.extensions` entry point.
 *
 * This is deliberately an ANALYSIS-TIME function injection, not an
 * optimizer rewrite of Average: rewriting every AVG to integer
 * division would silently change standard SQL semantics for all
 * queries; a named function keeps the reference semantics opt-in
 * while proving the engine carries a session-extension end-to-end
 * (jar on spark.jars + class on spark.sql.extensions + resolved
 * plan + oracle parity — tests/test_java_ext.py).
 *
 * Expression tree returned per call site:
 *   IntegralDivide(Sum(x).toAggregateExpression(),
 *                  Count(x).toAggregateExpression())
 * The analyzer extracts both AggregateExpressions from the project
 * list of the enclosing Aggregate, so `avg_int` works anywhere a
 * two-aggregate expression would (grouped or global).
 */

import org.apache.spark.sql.SparkSessionExtensions;
import org.apache.spark.sql.SparkSessionExtensionsProvider;
import org.apache.spark.sql.catalyst.FunctionIdentifier;
import org.apache.spark.sql.catalyst.expressions.Expression;
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo;
import org.apache.spark.sql.catalyst.expressions.IntegralDivide;
import org.apache.spark.sql.catalyst.expressions.aggregate.Count;
import org.apache.spark.sql.catalyst.expressions.aggregate.Sum;
import scala.Function1;
import scala.Tuple3;
import scala.collection.immutable.Seq;
import scala.runtime.BoxedUnit;

public class AvgIntExtensions implements SparkSessionExtensionsProvider {

    private static Seq<Expression> one(Expression e) {
        return scala.collection.immutable.Nil$.MODULE$.$colon$colon(e);
    }

    /** Builds sum(x) DIV count(x) for one avg_int(x) call site. */
    public static Expression build(Seq<Expression> args) {
        if (args.length() != 1) {
            throw new IllegalArgumentException(
                "avg_int expects exactly 1 argument, got " + args.length());
        }
        Expression child = args.apply(0);
        return new IntegralDivide(
            new Sum(child).toAggregateExpression(),
            new Count(one(child)).toAggregateExpression());
    }

    /**
     * Runtime installation for sessions built WITHOUT the extension
     * conf (e.g. a harness-owned SparkSession): registers the same
     * builder directly on the live session's FunctionRegistry.
     * Legitimate because `avg_int` is ANALYSIS-TIME only — the
     * resolved plan contains nothing but built-in Sum/Count/
     * IntegralDivide, so executors never need this class and the
     * jar can be loaded driver-side through any classloader
     * (queries/extras.py loads it via URLClassLoader + reflection).
     * Idempotent: re-registering overwrites with the same builder.
     */
    public static void install(org.apache.spark.sql.SparkSession session) {
        Function1<Seq<Expression>, Expression> builder =
            AvgIntExtensions::build;
        session.sessionState().functionRegistry().registerFunction(
            new FunctionIdentifier("avg_int"),
            new ExpressionInfo(
                AvgIntExtensions.class.getName(), "avg_int"),
            builder);
    }

    @Override
    public BoxedUnit apply(SparkSessionExtensions extensions) {
        Function1<Seq<Expression>, Expression> builder =
            AvgIntExtensions::build;
        extensions.injectFunction(new Tuple3<>(
            new FunctionIdentifier("avg_int"),
            new ExpressionInfo(
                AvgIntExtensions.class.getName(), "avg_int"),
            builder));
        return BoxedUnit.UNIT;
    }
}
