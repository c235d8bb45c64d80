package graft

import org.apache.spark.sql.functions._

import graft.functions.NearestCell.nearest_cell
import graft.plans.GraftExtensions

/** Native nearest_cell (narrow k-means assignment): differential
  * against the crossJoin + min(struct(s, cell)) form it replaced —
  * same argmin, same smaller-cell tie-break, null on missing sub. */
class NearestCellSpec extends SparkSpec {
  import spark.implicits._

  private def centsLit(rows: Seq[(Long, Long, Seq[Long])]) =
    array(rows.map { case (s, cell, cv) =>
      struct(lit(s).as("sub"), lit(cell).as("cell"),
        array(cv.map(lit): _*).as("cv")) }: _*)

  test("argmin and tie-break match the crossJoin + struct-min reference") {
    GraftExtensions.register(spark)
    val rnd = new scala.util.Random(13)
    val dims = 6
    val cents = (0L until 5L).map(c => (0L, c, Seq.fill(dims)(rnd.nextInt(2001).toLong - 1000)))
    // include exact-duplicate centroids so the tie-break is exercised
    val centsWithDup = cents :+ ((0L, 5L, cents.head._3))
    val vecs = (0 until 300).map(i => (i.toLong, Seq.fill(dims)(rnd.nextInt(2001).toLong - 1000)))
    val q = vecs.toDF("__id", "qv")
    val fast = q.withColumn("cell",
        nearest_cell(lit(0L), col("qv"), centsLit(centsWithDup)))
      .select(col("__id"), col("cell"))
    val c = centsWithDup.map { case (_, cell, cv) => (cell, cv) }
      .toDF("cell", "cv")
      .withColumn("csq", graft.functions.VectorDot.vec_dot(
        col("cv").cast("array<double>"), col("cv").cast("array<double>")))
    val ref = q.crossJoin(broadcast(c))
      .withColumn("s", col("csq") - lit(2d) * graft.functions.VectorDot.vec_dot(
        col("qv").cast("array<double>"), col("cv").cast("array<double>")))
      .groupBy(col("__id"))
      .agg(min(struct(col("s"), col("cell"))).as("m"))
      .select(col("__id"), col("m.cell").as("cell"))
    assert(fast.except(ref).count() === 0 && ref.except(fast).count() === 0)
  }

  test("per-subspace dispatch and null on a sub with no candidates") {
    GraftExtensions.register(spark)
    val cents = Seq((0L, 0L, Seq(0L, 0L)), (0L, 1L, Seq(10L, 10L)),
      (1L, 0L, Seq(100L, 100L)))
    val df = Seq((1L, 0L, Seq(9L, 9L)), (1L, 1L, Seq(1L, 1L)), (1L, 2L, Seq(1L, 1L)))
      .toDF("__id", "sub", "sqv")
      .withColumn("cell", nearest_cell(col("sub"), col("sqv"), centsLit(cents)))
    val got = df.select(col("sub"), col("cell")).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(got(0L) === Some(1L)) // (9,9) nearer to (10,10)
    assert(got(1L) === Some(0L)) // only candidate in sub 1
    assert(got(2L) === None)     // no candidates in sub 2
  }

  test("broadcast transport matches the literal transport row for row (incl. null subs)") {
    GraftExtensions.register(spark)
    val rnd = new scala.util.Random(17)
    val dims = 4
    val cents = (0L until 6L).map(c =>
      (c % 2, c, Seq.fill(dims)(rnd.nextInt(1001).toLong - 500)))
    val rows = (0 until 300).map(i =>
      (i.toLong, (i % 3).toLong, Seq.fill(dims)(rnd.nextInt(1001).toLong - 500)))
    val df = rows.toDF("__id", "sub", "sqv")
    val bc = spark.sparkContext.broadcast(
      cents.map { case (s, c, v) => (s, c, v.toArray) }.toArray)
    val litOut = df.withColumn("cell",
        nearest_cell(col("sub"), col("sqv"), centsLit(cents)))
      .select(col("__id"), col("cell")).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    val bcOut = df.withColumn("cell",
        graft.functions.NearestCell.nearest_cell_bcast(col("sub"), col("sqv"), bc))
      .select(col("__id"), col("cell")).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(litOut === bcOut)
    // sub 2 has no candidates in either transport
    assert(litOut.keySet.exists(id => rows(id.toInt)._2 == 2L) &&
      rows.filter(_._2 == 2L).forall(r => litOut(r._1) == -1L))
  }

  test("both transports run inside WholeStageCodegen (no fallback span break)") {
    GraftExtensions.register(spark)
    val cents = Seq((0L, 0L, Seq(1L, 1L)), (0L, 1L, Seq(5L, 5L)))
    val bc = spark.sparkContext.broadcast(
      cents.map { case (s, c, v) => (s, c, v.toArray) }.toArray)
    // spark.range source: a local Seq would be constant-folded into a
    // LocalTableScan, leaving no runtime projection to codegen
    val df = spark.range(50)
      .select(col("id").as("__id"),
        array(pmod(col("id"), lit(7)).cast("long"), lit(3L)).as("qv"))
      .withColumn("c_lit", nearest_cell(lit(0L), col("qv"), centsLit(cents)))
      .withColumn("c_bc",
        graft.functions.NearestCell.nearest_cell_bcast(lit(0L), col("qv"), bc))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // the previous CodegenFallback marker kept the whole projection out
    // of WholeStageCodegen — the codegen'd Project line carries the
    // "*(n)" prefix
    assert(plan.linesIterator.exists(l =>
      l.contains("nearest_cell") && l.contains("*(")), plan.take(3000))
  }

  test("end-to-end assignment identical when the conf forces the broadcast transport") {
    import graft.operators.Similarity
    import graft.sources.Tables
    val emb = Tables.embeddings(spark, sf)
    val cents = Similarity.ivfTrain(emb, k = 4, iters = 2)
    def run(): Seq[(Long, Long)] =
      Similarity.ivfAssign(emb, cents).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    val viaLiteral = run()
    spark.conf.set("spark.graft.nearestCell.maxLiteralValues", "0")
    try {
      val viaBcast = run()
      assert(viaLiteral === viaBcast)
    } finally spark.conf.unset("spark.graft.nearestCell.maxLiteralValues")
  }
}
