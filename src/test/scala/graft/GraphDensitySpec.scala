package graft

import org.scalatest.funsuite.AnyFunSuite
import scala.collection.mutable

/** Brute-force recomputation of the density/decomposition graph ops
  * (q_kcore onion peel, sim_dbscan roles+clusters) in plain Scala from
  * the same pair sets the operators consume.
  */
class GraphDensitySpec extends AnyFunSuite {
  import TestSession._

  test("q_kcore: layers match a sequential peel; 2-core is internally dense") {
    val got = SparkEntry.queries("q_kcore")(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getInt(2))).toMap
    val pairs = SparkEntry.queries("dedup_minhash_lsh")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val adj = mutable.Map.empty[Long, mutable.Set[Long]]
    pairs.foreach { case (a, b) =>
      adj.getOrElseUpdate(a, mutable.Set.empty) += b
      adj.getOrElseUpdate(b, mutable.Set.empty) += a
    }
    assert(got.keySet == adj.keySet.toSet)
    got.foreach { case (id, (d0, _)) => assert(d0 == adj(id).size, s"$id deg0") }
    // sequential peel, capped at the operator's fixed 8 rounds
    var alive = adj.keySet.toSet
    val layer = mutable.Map.empty[Long, Int]
    var t = 1
    var changed = true
    while (t <= 8 && changed) {
      val next = alive.filter(v => adj(v).count(alive) >= 2)
      val removed = alive -- next
      changed = removed.nonEmpty
      removed.foreach(layer(_) = t)
      alive = next
      t += 1
    }
    got.foreach { case (id, (_, l)) =>
      assert(l == layer.getOrElse(id, 0), s"$id layer")
    }
    // every survivor keeps >= 2 surviving neighbors (the 2-core property)
    val core = got.collect { case (id, (_, 0)) => id }.toSet
    core.foreach(v => assert(adj(v).count(core) >= 2, s"$v not 2-core-dense"))
  }

  test("sim_dbscan: roles and clusters match union-find over the pair set") {
    val got = SparkEntry.queries("sim_dbscan")(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getString(2), r.getLong(3)))
      .toMap
    val pairs = SparkEntry.queries("dedup_embedding")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val adj = mutable.Map.empty[Long, mutable.Set[Long]]
    pairs.foreach { case (a, b) =>
      adj.getOrElseUpdate(a, mutable.Set.empty) += b
      adj.getOrElseUpdate(b, mutable.Set.empty) += a
    }
    val allVecs = Tables.embeddings(spark, sf).select("vec_id").collect()
      .map(_.getLong(0)).toSet
    assert(got.keySet == allVecs)
    val core = adj.keySet.filter(v => adj(v).size >= 2).toSet
    // min reachable id within the core-core subgraph
    def coreLabel(v: Long): Long = {
      val seen = mutable.Set(v)
      val q = mutable.Queue(v)
      while (q.nonEmpty) {
        val x = q.dequeue()
        adj(x).filter(core).foreach(y => if (seen.add(y)) q.enqueue(y))
      }
      seen.min
    }
    got.foreach { case (id, (deg, role, cluster)) =>
      assert(deg == adj.get(id).map(_.size).getOrElse(0), s"$id deg")
      if (core(id)) {
        assert(role == "core", s"$id role")
        assert(cluster == coreLabel(id), s"$id cluster")
      } else if (adj.get(id).exists(_.exists(core))) {
        assert(role == "border", s"$id role")
        assert(cluster == adj(id).filter(core).map(coreLabel).min, s"$id cluster")
      } else {
        assert(role == "noise", s"$id role")
        assert(cluster == -1L, s"$id cluster")
      }
    }
  }
}
