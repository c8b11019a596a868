package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}

/**
 * b6 scalar arithmetic semantics (src/diagonal.works/b6/api/functions/math.go):
 *  - add / divide (:13-52) preserve int-ness: int op int stays int, so
 *    `divide(7, 2) = 3` (math.go:16 `int/int = int`); any float operand
 *    promotes to float. Spark's native `/` always promotes to double, so the
 *    int/int case maps to `div` (integral division) instead.
 *  - add-ints / divide-int (:27-29, :50-52): fixed-type variants.
 *  - clamp (:55-62), gt (:65-67, values.go:132-141 int->float promotion),
 *    to-str (:31-33).
 *
 * b6 is dynamically typed; Spark columns are statically typed, so the
 * dispatch happens at plan time from the resolved column types (the DataFrame
 * argument), preserving the reference's observable results.
 */
object Scalars {

  private val intTypes: Set[org.apache.spark.sql.types.DataType] =
    Set(ByteType, ShortType, IntegerType, LongType)

  private def isInt(df: DataFrame, c: Column): Boolean =
    intTypes.contains(df.select(c).schema.head.dataType)

  /** add (math.go:13-25): int+int stays int; else double. */
  def add(df: DataFrame, a: Column, b: Column): Column =
    if (isInt(df, a) && isInt(df, b)) a + b
    else a.cast("double") + b.cast("double")

  /** divide (math.go:36-48): int/int = int (truncating, math.go:16);
    * else double division. */
  def divide(df: DataFrame, a: Column, b: Column): Column =
    if (isInt(df, a) && isInt(df, b)) call_function("div", a, b)
    else a.cast("double") / b.cast("double")

  /** add-ints (math.go:27-29). */
  def addInts(a: Column, b: Column): Column = a.cast("long") + b.cast("long")

  /** divide-int (math.go:50-52). */
  def divideInt(a: Column, b: Column): Column =
    call_function("div", a.cast("long"), b.cast("long"))

  /** clamp (math.go:55-62). */
  def clamp(v: Column, low: Int, high: Int): Column =
    greatest(least(v, lit(high)), lit(low))

  /** gt with int->float promotion (values.go:132-141). */
  def gt(a: Column, b: Column): Column = a.cast("double") > b.cast("double")

  /** to-str (math.go:31-33). */
  def toStr(v: Column): Column = v.cast("string")
}
