package graft.functions

import graft.SparkTestBase
import graft.core.Cells
import org.apache.spark.unsafe.types.UTF8String

class GraftFunctionsSpec extends SparkTestBase {

  test("custom expressions are callable from SQL") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      """SELECT rolling_hash('hello') AS rh,
        |       dot_product(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS dp,
        |       hilbert_index(3L, 5L, 4) AS hi""".stripMargin).collect()(0)
    assert(r.getLong(0) == RollingHash.hash(UTF8String.fromString("hello")))
    assert(r.getDouble(1) == 11.0)
    assert(r.getLong(2) == Cells.hilbertIndex(3, 5, 4))
  }
}
