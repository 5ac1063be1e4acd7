package graft

import org.scalatest.funsuite.AnyFunSuite

/** Exchange-shape contract gate (r13 verdict "Next round" #9): every
  * batch query's physical plan has its ShuffleExchange and
  * BroadcastExchange counts pinned in a committed golden file. A plan
  * regression — a new shuffle sneaking into a co-partitioned join, a
  * broadcast silently degrading to a shuffle — now fails `sbt test`
  * instead of hiding behind cross-box bench noise.
  *
  * Updating after an INTENTIONAL plan change:
  *   GRAFT_UPDATE_EXCHANGE_GOLDEN=1 sbt "testOnly graft.ExchangeGoldenSpec"
  * rewrites the golden; the diff then documents the reviewed change.
  */
class ExchangeGoldenSpec extends AnyFunSuite {
  import TestSession._

  private val goldenPath =
    java.nio.file.Paths.get("src/test/resources/exchange_golden.txt")

  /** (shuffles, broadcasts) in the query's initial physical plan.
    * ReusedExchange nodes are free at runtime and not counted. */
  private def exchangeCounts(name: String): (Int, Int) = {
    val plan = SparkEntry.queries(name)(spark, sf)
      .queryExecution.executedPlan.toString
    val lines = plan.linesIterator.toSeq
    val broadcasts = lines.count(l =>
      l.contains("BroadcastExchange") && !l.contains("ReusedExchange"))
    val shuffles = lines.count(l =>
      l.contains("Exchange ") && !l.contains("BroadcastExchange") &&
        !l.contains("ReusedExchange"))
    (shuffles, broadcasts)
  }

  test("every batch query's exchange counts match the committed golden") {
    val batch = SparkEntry.queries.keys.toSeq.sorted
      .filterNot(_.startsWith("stream_"))
    val current = batch.map(n => n -> exchangeCounts(n))
    if (sys.env.get("GRAFT_UPDATE_EXCHANGE_GOLDEN").contains("1")) {
      val body = current.map { case (n, (s, b)) => s"$n $s $b" }.mkString("\n")
      java.nio.file.Files.createDirectories(goldenPath.getParent)
      java.nio.file.Files.write(goldenPath, (body + "\n").getBytes("UTF-8"))
      info(s"golden rewritten: ${current.size} queries")
    } else {
      assert(java.nio.file.Files.exists(goldenPath),
        "no exchange golden committed — run once with GRAFT_UPDATE_EXCHANGE_GOLDEN=1")
      val golden = new String(
        java.nio.file.Files.readAllBytes(goldenPath), "UTF-8")
        .split("\n").toSeq.map(_.trim).filter(_.nonEmpty)
        .map { l =>
          val Array(n, s, b) = l.split(" ")
          n -> (s.toInt, b.toInt)
        }.toMap
      val missing = current.collect { case (n, _) if !golden.contains(n) => n }
      assert(missing.isEmpty,
        s"queries with no golden entry (update the golden): $missing")
      val drifted = current.collect {
        case (n, c) if golden(n) != c => s"$n golden=${golden(n)} now=$c"
      }
      assert(drifted.isEmpty,
        "exchange-shape drift — review; if intentional, rewrite the golden " +
          s"with GRAFT_UPDATE_EXCHANGE_GOLDEN=1:\n${drifted.mkString("\n")}")
      val stale = golden.keySet -- current.map(_._1).toSet
      assert(stale.isEmpty, s"golden entries for removed queries: $stale")
    }
  }
}
