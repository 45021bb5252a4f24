package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class GraphsSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Local union-find reference implementation. */
  private def unionFind(n: Int, edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = Array.tabulate(n)(i => i)
    def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r); r }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a.toInt), find(b.toInt))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    // path-compress to component minimum (roots are minima by construction)
    (0 until n).map(i => i.toLong -> find(i).toLong).toMap
  }

  test("connected components match union-find on a random graph") {
    val rng = new scala.util.Random(42)
    val n = 400
    val edges = Seq.fill(300)((rng.nextInt(n).toLong, rng.nextInt(n).toLong))
      .filter { case (a, b) => a != b }
    val expected = unionFind(n, edges)
    val got = Graphs.connectedComponents(
      edges.toDF("idA", "idB"), "idA", "idB")
      .as[(Long, Long)].collect().toMap
    // engine only returns nodes that appear in an edge
    val touched = edges.flatMap(e => Seq(e._1, e._2)).toSet
    assert(got.keySet == touched)
    touched.foreach { id =>
      assert(got(id) == expected(id), s"node $id: got ${got(id)}, want ${expected(id)}")
    }
  }

  test("a long chain converges (worst case for label propagation)") {
    val chain = (0L until 200L).sliding(2).map(s => (s(0), s(1))).toSeq
    val got = Graphs.connectedComponents(chain.toDF("a", "b"), "a", "b")
      .as[(Long, Long)].collect()
    assert(got.length == 200 && got.forall(_._2 == 0L))
  }

  test("nearDupClusters assigns singletons their own id") {
    val docs = Seq(1L, 2L, 3L, 4L, 5L).toDF("doc_id")
    val pairs = Seq((2L, 4L), (4L, 5L)).toDF("idA", "idB")
    val got = Graphs.nearDupClusters(docs, "doc_id", pairs, "idA", "idB")
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 2L, 3L -> 3L, 4L -> 2L, 5L -> 2L))
  }

  test("empty pair list yields all-singleton clusters") {
    val docs = Seq(7L, 9L).toDF("doc_id")
    val pairs = Seq.empty[(Long, Long)].toDF("idA", "idB")
    val got = Graphs.nearDupClusters(docs, "doc_id", pairs, "idA", "idB")
      .as[(Long, Long)].collect().toMap
    assert(got == Map(7L -> 7L, 9L -> 9L))
  }
}
