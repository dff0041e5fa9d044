package graft.similarity

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}

/** sim34's structural invariants — what the DuckDB value gate can't
  * say NO to: every vector lands in exactly one cell (population
  * conservation on both sides), the index is genuinely yesterday's
  * (every cell id is a history vector id inside the history prefix —
  * an increment doc as centroid would mean the "frozen" index was
  * rebuilt), and drift is NULL exactly where it is undefined. */
class IvfAppendSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.init()
  private val dir = "/root/testdata/sf0.001"

  test("populations conserve and centroids come from history only") {
    val rows = Similarity.ivfAppend(spark, dir).collect()
    val emb = Tables.embeddings(spark, dir)
      .select(col("vec_id"),
        expr("transform(embedding, x -> cast(x as double))").as("e"))
      .withColumn("nrm", sqrt(expr("aggregate(zip_with(e, e, (a, b) -> a * b), 0D, (a, v) -> a + v)")))
      .where(col("nrm") > 0)
      .select(col("vec_id")).collect().map(_.getLong(0))
    val nHist = emb.count(_ % 5 != 0)
    val nInc = emb.count(_ % 5 == 0)
    assert(rows.map(_.getAs[Long]("n_hist")).sum === nHist,
      "history members lost or double-assigned")
    assert(rows.map(_.getAs[Long]("n_inc")).sum === nInc,
      "increment members lost or double-assigned")
    val cells = math.ceil(math.sqrt(nHist.toDouble)).toLong
    rows.map(_.getAs[Long]("cell")).foreach { c =>
      assert(c % 5 != 0 && c < cells,
        s"cell $c is not a history-prefix vector id (prefix bound $cells)")
    }
    rows.foreach { r =>
      val defined = r.getAs[Long]("n_inc") > 0 &&
        r.getAs[Double]("mean_r2_hist") > 0
      assert(!r.isNullAt(r.fieldIndex("drift")) === defined,
        s"drift defined-ness wrong on cell ${r.getAs[Long]("cell")}")
    }
  }
}
