package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark.spark
import graft.GraftImplicits._

/** The pandas veneer methods not already pinned by the oracle entries
  * (pandas_series_ops / pandas_frame_ops): padding variants, the
  * character-class predicates, split/repeat, value_counts, cummin, and
  * the arithmetic helpers — each against hand-computed pandas semantics. */
class PandasSurfaceSpec extends AnyFunSuite {
  import spark.implicits._

  test(".str pad/zfill follow python string semantics") {
    val df = Seq("ab").toDF("s")
    val r = df.select(
      $"s".str.pad(5, "left", "*").as("l"),
      $"s".str.pad(5, "right", "*").as("r"),
      $"s".str.pad(5, "both", ".").as("c"),
      lit("-42").str.zfill(6).as("zneg"),
      lit("42").str.zfill(6).as("zpos"),
      lit("1234567").str.zfill(3).as("zlong")).head()
    assert(r.getString(0) === "***ab")
    assert(r.getString(1) === "ab***")
    assert(r.getString(2) === ".ab..") // python: extra fill to the right
    assert(r.getString(3) === "-00042")
    assert(r.getString(4) === "000042")
    assert(r.getString(5) === "1234567") // width below len: unchanged
  }

  test(".str predicates are non-empty-and-all-chars like pandas") {
    val rows = Seq("abc", "ab1", "123", "  ", "", "ABC", "aBc")
      .toDF("s")
      .select($"s", $"s".str.isdigit.as("d"), $"s".str.isalpha.as("a"),
        $"s".str.isalnum.as("an"), $"s".str.isspace.as("sp"),
        $"s".str.islower.as("lo"), $"s".str.isupper.as("up"))
      .collect().map(r => r.getString(0) ->
        (r.getBoolean(1), r.getBoolean(2), r.getBoolean(3), r.getBoolean(4),
          r.getBoolean(5), r.getBoolean(6))).toMap
    assert(rows("abc") === ((false, true, true, false, true, false)))
    assert(rows("ab1") === ((false, false, true, false, true, false)))
    assert(rows("123") === ((true, false, true, false, false, false)))
    assert(rows("  ") === ((false, false, false, true, false, false)))
    assert(rows("") === ((false, false, false, false, false, false)))
    assert(rows("ABC") === ((false, true, true, false, false, true)))
    assert(rows("aBc") === ((false, true, true, false, false, false)))
  }

  test(".str split/repeat/slice edges") {
    val r = Seq("a-b-c").toDF("s").select(
      $"s".str.splitPat("-").as("sp"),
      $"s".str.repeat(2).as("rp"),
      $"s".str.slice(1, 100).as("over"),
      $"s".str.slice(3, 2).as("neg"),
      $"s".str.get(99).as("past")).head()
    assert(r.getSeq[String](0) === Seq("a", "b", "c"))
    assert(r.getString(1) === "a-b-ca-b-c")
    assert(r.getString(2) === "-b-c")
    assert(r.getString(3) === "") // stop < start -> empty, like pandas
    assert(r.getString(4) === "") // past the end -> empty
  }

  test("numeric helpers: abs/pow/mod/cummin/valueCounts") {
    val df = Seq((1, -3.0), (2, 2.0), (3, -1.0), (4, 2.0)).toDF("i", "v")
    val r = df.select(
      $"v".absS.as("a"), $"v".powS(2).as("p"), $"i".modS(3).as("m"),
      df.cumminCol($"v", Seq($"i")).as("cm")).collect()
      .sortBy(_.getDouble(0))
    assert(df.valueCounts($"v").as[(Double, Long)].collect().toSeq ===
      Seq((2.0, 2L), (-3.0, 1L), (-1.0, 1L)))
    val byI = df.select($"i", df.cumminCol($"v", Seq($"i")).as("cm"))
      .as[(Int, Double)].collect().toMap
    assert(byI === Map(1 -> -3.0, 2 -> -3.0, 3 -> -3.0, 4 -> -3.0))
    assert(r.map(_.getDouble(1)).toSet === Set(9.0, 4.0, 1.0))
  }
}
