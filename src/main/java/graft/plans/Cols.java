package graft.plans;

import org.apache.spark.sql.Column;
import org.apache.spark.sql.catalyst.expressions.Expression;

/**
 * Bridge between catalyst Expressions and the public Column API.
 *
 * Spark 4 moved Column to a ColumnNode facade; the conversion lives in
 * {@code org.apache.spark.sql.classic.ExpressionUtils}, which is
 * {@code private[sql]} — a Scala-compiler-only restriction (the JVM
 * method is public). This Java shim is the supported-bytecode way for
 * a library to lift its own Expressions into Columns without forking
 * package names into org.apache.spark.
 */
public final class Cols {
    private Cols() {}

    public static Column column(Expression e) {
        return org.apache.spark.sql.classic.ExpressionUtils.column(e);
    }

    public static Expression expression(Column c) {
        return org.apache.spark.sql.classic.ExpressionUtils.expression(c);
    }
}
