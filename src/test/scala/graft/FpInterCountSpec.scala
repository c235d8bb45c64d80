package graft

import org.apache.spark.sql.functions._

import graft.functions.FpSet.{fp32_set, fp_inter_count}
import graft.plans.GraftExtensions

/** Native fp_inter_count (two-pointer |A∩B| over sorted distinct
  * sets): differential against size(array_intersect) — the expression
  * it replaced on the containment / Jaccard verification hot paths —
  * for both element types, plus edge shapes. */
class FpInterCountSpec extends SparkSpec {
  import spark.implicits._

  test("long sets: equals size(array_intersect) on fp32_set outputs, incl. empty/disjoint") {
    GraftExtensions.register(spark)
    val rnd = new scala.util.Random(7)
    val rows = (0 until 200).map { i =>
      def words(n: Int) = Seq.fill(n)(s"w${rnd.nextInt(40)}")
      (i.toLong, words(rnd.nextInt(30)), words(rnd.nextInt(30)))
    }
    val df = rows.toDF("id", "wa", "wb")
      .withColumn("sa", fp32_set(col("wa")))
      .withColumn("sb", fp32_set(col("wb")))
    val diff = df
      .withColumn("fast", fp_inter_count(col("sa"), col("sb")))
      .withColumn("ref", size(array_intersect(col("sa"), col("sb"))).cast("long"))
      .filter(col("fast") =!= col("ref"))
    assert(diff.count() === 0)
  }

  test("string sets: equals size(array_intersect) on array_sort(array_distinct) inputs") {
    GraftExtensions.register(spark)
    val rnd = new scala.util.Random(11)
    val rows = (0 until 200).map { i =>
      def words(n: Int) = Seq.fill(n)(s"tok${rnd.nextInt(25)}")
      (i.toLong, words(rnd.nextInt(25)), words(rnd.nextInt(25)))
    }
    val df = rows.toDF("id", "wa", "wb")
      .withColumn("sa", array_sort(array_distinct(col("wa"))))
      .withColumn("sb", array_sort(array_distinct(col("wb"))))
    val diff = df
      .withColumn("fast", fp_inter_count(col("sa"), col("sb")))
      .withColumn("ref", size(array_intersect(col("sa"), col("sb"))).cast("long"))
      .filter(col("fast") =!= col("ref"))
    assert(diff.count() === 0)
  }

  test("non-BMP strings order consistently between array_sort and the merge comparator") {
    GraftExtensions.register(spark)
    // U+1D11E (surrogate pair) vs U+FF21: UTF-8 byte order differs from
    // UTF-16 code-unit order — both sides must use UTF8 binary order
    val hi = "𝄞"
    val df = Seq((Seq(hi, "Ａ", "a"), Seq("Ａ", hi))).toDF("wa", "wb")
      .withColumn("sa", array_sort(array_distinct(col("wa"))))
      .withColumn("sb", array_sort(array_distinct(col("wb"))))
    val got = df.select(fp_inter_count(col("sa"), col("sb"))).as[Long].head()
    assert(got === 2L)
  }
}
