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
