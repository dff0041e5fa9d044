package graft.dedup

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** dd07: components must merge TRANSITIVELY — doc k (k%77==0) has an
  * exact copy k+1000000 (dd01 pair) and a near copy k+2000000 (suffix
  * pair); all three belong to one cluster labeled min(id)=k even though
  * the two copies were never directly compared. */
class DedupClusterSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.init()
  private val dir = "/root/testdata/sf0.001"

  test("exact + near copies of the same doc land in one cluster") {
    val rows = Dedup.dupClusters(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val byId = rows.map(t => t._1 -> t).toMap
    // doc 0 is %7, %11 and %77: both injected copies exist
    val (_, n, maxId) = byId(0L)
    assert(n >= 3, s"cluster 0 should hold doc 0 + both copies, got $n")
    assert(maxId === 2000000L)
    // no doc appears in two clusters: sum of n_docs == distinct members
    assert(rows.map(_._2).sum ===
      Dedup.dupClusters(spark, dir).agg(
        org.apache.spark.sql.functions.sum("n_docs")).head.getLong(0))
    // every cluster id is its own minimum (the keep-id convention)
    rows.foreach { case (cid, _, mx) => assert(cid < mx) }
  }

  test("star contraction matches an in-memory union-find on the corpus") {
    // independent oracle: collect the (small) verified pair set and run
    // classic union-find on the driver; cluster summaries must agree
    val edges = Dedup.ngramJaccard(spark, dir)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val expected = parent.keys.toSeq.groupBy(find)
      .map { case (root, members) =>
        (root, members.size.toLong, members.max) }
      .toSeq.sortBy(_._1)
    val got = Dedup.dupClusters(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got === expected)
  }

  test("star contraction closes a 512-node chain — the long-diameter " +
    "case min-label propagation can't do in bounded rounds") {
    import spark.implicits._
    // path graph 0-1-2-…-511: diameter 511; propagation would need
    // ~511 rounds, the star alternation's distance-halving needs ~log n
    // (its internal require(converged, …) caps at 30)
    val chain = (0L until 511L).map(i => (i, i + 1)).toDF("src", "dst")
    val labels = Dedup.connectedComponentsStar(chain).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(labels.length === 512)
    assert(labels.forall(_._2 == 0L), "every chain node joins component 0")
    // two disjoint chains stay disjoint
    val two = ((0L until 50L).map(i => (i, i + 1)) ++
      (1000L until 1050L).map(i => (i, i + 1))).toDF("src", "dst")
    val ls = Dedup.connectedComponentsStar(two).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert((0L to 50L).forall(ls(_) == 0L))
    assert((1000L to 1050L).forall(ls(_) == 1000L))
  }
}
