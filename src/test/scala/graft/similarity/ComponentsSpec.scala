package graft.similarity

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Connected components (min-label propagation) vs a sequential
  * union-find reference on structured and randomized graphs. The
  * fixpoint (min id per component) is unique, so exact equality holds
  * regardless of partitioning or iteration order.
  */
class ComponentsSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-components-spec")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  locally { spark.sparkContext.setLogLevel("WARN") }

  override def afterAll(): Unit = spark.stop()

  private def run(pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    Components.connectedComponents(pairs.toDF("a", "b"))
      .as[(Long, Long)].collect().toMap
  }

  /** Sequential union-find reference: min id per component. */
  private def ref(pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    def union(x: Long, y: Long): Unit = {
      val (rx, ry) = (find(x), find(y))
      if (rx != ry) parent(math.max(rx, ry)) = math.min(rx, ry)
    }
    pairs.foreach { case (a, b) => union(a, b) }
    parent.keys.map(v => v -> find(v)).toMap
  }

  test("chain, star, and two disjoint components") {
    // chain 1-2-3-4 exercises multi-round propagation (diameter 3);
    // star 10-{11,12,13} converges in one; {20,21} is disjoint
    val pairs = Seq[(Long, Long)](
      (1, 2), (2, 3), (3, 4), (10, 11), (10, 12), (10, 13), (20, 21))
    val got = run(pairs)
    assert(got == ref(pairs))
    assert(got(4L) == 1L && got(13L) == 10L && got(21L) == 20L)
  }

  test("duplicates, reversed edges, and self-loops are tolerated") {
    val pairs = Seq[(Long, Long)]((5, 6), (6, 5), (5, 6), (7, 7), (6, 8))
    val got = run(pairs)
    // the pure self-loop vertex 7 has no distinct neighbor: it is a
    // singleton and not emitted (documented contract)
    assert(got == Map(5L -> 5L, 6L -> 5L, 8L -> 5L))
  }

  test("empty input yields empty output") {
    assert(run(Seq.empty).isEmpty)
  }

  test("randomized graphs match union-find exactly") {
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 3) {
      val n = 60 + trial * 40
      // sparse random graph: expected several nontrivial components
      val pairs = Seq.fill(n)((rnd.nextInt(80).toLong, rnd.nextInt(80).toLong))
        .filter { case (a, b) => a != b }
      assert(run(pairs) == ref(pairs), s"trial $trial")
    }
  }

  test("long chain converges within the iteration budget") {
    // diameter 40: well past any single-round shortcut, still < maxIters
    val pairs = (0L until 40L).map(i => (i, i + 1))
    val got = run(pairs)
    assert(got.size == 41 && got.values.forall(_ == 0L))
  }
}
