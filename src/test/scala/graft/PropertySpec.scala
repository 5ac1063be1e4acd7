package graft

import graft.functions.MisraGries.misra_gries
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Seeded randomized property checks — many generated cases per
  * invariant (fixed seeds, so failures reproduce). Complements the
  * single-case kernels in SketchMaintSpec/CorpusSpec.
  */
class PropertySpec extends AnyFunSuite {
  import TestSession._

  test("Misra-Gries invariants hold across random streams and partitionings") {
    import spark.implicits._
    val rng = new scala.util.Random(424242)
    for (trial <- 1 to 8) {
      val m = 3 + rng.nextInt(6)                     // 3..8 counters
      val nKeys = m + 1 + rng.nextInt(30)            // always more keys than counters
      val weights = (0 until nKeys)
        .map(i => s"k$i" -> (1 + rng.nextInt(60))).toMap
      val keys = rng.shuffle(
        weights.toSeq.flatMap { case (k, w) => Seq.fill(w)(k) })
      val n = keys.size
      val parts = 1 + rng.nextInt(9)
      val mg = keys.toDF("k").repartition(parts)
        .agg(misra_gries($"k", m).as("mg"))
        .selectExpr("mg").as[Map[String, Long]].head()
      assert(mg.size <= m, s"trial $trial: ${mg.size} counters > m=$m")
      for ((k, w) <- weights if w > n / (m + 1))
        assert(mg.contains(k),
          s"trial $trial (m=$m, n=$n, parts=$parts): heavy hitter $k (freq $w) missing")
      for ((k, est) <- mg) {
        assert(est <= weights(k), s"trial $trial: $k overestimated ($est > ${weights(k)})")
        assert(weights(k) - est <= n / (m + 1),
          s"trial $trial: $k error ${weights(k) - est} > n/(m+1)=${n / (m + 1)}")
      }
    }
  }

  test("text_chunk invariants hold for random document lengths") {
    import spark.implicits._
    val rng = new scala.util.Random(31337)
    val docs = (1L to 40L).map(i => (i, (0 until (1 + rng.nextInt(120)))
      .map(t => s"d${i}t$t").mkString(" ")))
    val dir = java.nio.file.Files.createTempDirectory("graft_propchunk").toString
    docs.toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length($"text").cast("long"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = SparkEntry.queries("text_chunk")(spark, dir)
      .as[(Long, Long, Long, String)].collect().groupBy(_._1)
    val C = 32; val S = 24
    for ((id, text) <- docs) {
      val words = text.split(" ").toSeq
      val n = words.size
      val chunks = out(id).sortBy(_._2).toSeq
      // chunk k covers words [k*S, k*S + C)
      for ((_, cid, nt, ct) <- chunks) {
        val expect = words.slice(cid.toInt * S, cid.toInt * S + C)
        assert(ct.split(" ").toSeq == expect && nt == expect.size,
          s"doc $id chunk $cid content mismatch (n=$n)")
      }
      // full coverage, contiguous ids, no redundant tail
      assert(chunks.map(_._2) == chunks.indices.map(_.toLong),
        s"doc $id: chunk ids not contiguous")
      assert(chunks.flatMap(_._4.split(" ")).toSet == words.toSet,
        s"doc $id: coverage gap (n=$n)")
      val last = chunks.last._2.toInt
      if (last > 0)
        assert((last - 1) * S + C < n,
          s"doc $id: redundant tail chunk (n=$n, last=$last)")
    }
  }

  test("q_pack_sequences invariants hold for random corpora") {
    import spark.implicits._
    val B = 256L
    val rng = new scala.util.Random(90210)
    for (trial <- 1 to 4) {
      val docs = (1L to (20 + rng.nextInt(40)).toLong).map { i =>
        val src = s"s${rng.nextInt(4)}"
        val n = 1 + rng.nextInt(500) // some docs span multiple sequences
        (i, src, (0 until n).map(t => s"w$t").mkString(" "))
      }
      val dir = java.nio.file.Files.createTempDirectory("graft_prop_pack").toString
      docs.toDF("doc_id", "source", "text")
        .withColumn("lang", lit("en"))
        .withColumn("n_chars", length($"text").cast("long"))
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
      val out = SparkEntry.queries("q_pack_sequences")(spark, dir)
        .as[(String, Long, Long, Long)].collect().toSeq
      val bySrc = out.groupBy(_._1)
      val wantTokens = docs.groupBy(_._2)
        .map { case (s, ds) => s -> ds.map(_._3.split(" ").length.toLong).sum }
      for ((src, seqs) <- bySrc) {
        val sorted = seqs.sortBy(_._2)
        // conservation: packing moves tokens, never drops or dups them
        assert(sorted.map(_._4).sum == wantTokens(src),
          s"trial $trial/$src: token count not conserved")
        // contiguous sequence ids from 0
        assert(sorted.map(_._2) == sorted.indices.map(_.toLong),
          s"trial $trial/$src: sequence ids not contiguous")
        // concat-and-split: every sequence except the last is exactly full
        sorted.init.foreach { s =>
          assert(s._4 == B, s"trial $trial/$src: non-final sequence ${s._2} has ${s._4} tokens")
        }
        assert(sorted.last._4 <= B, s"trial $trial/$src: final sequence overflows")
      }
    }
  }

  test("q_funnel agrees with a reference fold on random event streams") {
    import spark.implicits._
    val rng = new scala.util.Random(5150)
    for (trial <- 1 to 4) {
      val types = Seq("view", "click", "purchase", "error", "signup")
      val events = (1L to (60 + rng.nextInt(120)).toLong).map { id =>
        (id, rng.nextInt(50).toLong * 1000L, // µs-aligned ts, many ties
          rng.nextInt(8).toLong, types(rng.nextInt(types.size)))
      }
      val dir = java.nio.file.Files.createTempDirectory("graft_prop_fun").toString
      events.toDF("event_id", "ts", "user_id", "event_type")
        .withColumn("value", lit(1.0)).withColumn("props", lit("{}"))
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
      // reference: first view, first strictly-later click, first
      // strictly-later purchase — per user, straight fold over µs times
      val byUser = events.groupBy(_._3)
      val expected = byUser.flatMap { case (u, evs) =>
        val us = evs.map(e => (e._4, e._2 / 1000))
        val v = us.collect { case ("view", t) => t }.sorted.headOption
        val c = v.flatMap(vt => us.collect { case ("click", t) if t > vt => t }.sorted.headOption)
        val p = c.flatMap(ct => us.collect { case ("purchase", t) if t > ct => t }.sorted.headOption)
        (v, c, p) match { case (Some(vt), Some(ct), Some(pt)) => Some(u -> (vt, ct, pt)); case _ => None }
      }
      val nView = byUser.count(_._2.exists(_._4 == "view"))
      val nClick = byUser.values.count { evs =>
        val us = evs.map(e => (e._4, e._2 / 1000))
        us.collect { case ("view", t) => t }.sorted.headOption
          .exists(vt => us.exists { case ("click", t) => t > vt; case _ => false })
      }
      val out = SparkEntry.queries("q_funnel")(spark, dir)
        .as[(String, Long, Long)].collect().map(r => r._1 -> r._2).toMap
      assert(out("1_view") == nView, s"trial $trial: view-stage count")
      assert(out("2_click") == nClick, s"trial $trial: click-stage count")
      assert(out("3_purchase") == expected.size, s"trial $trial: purchase-stage count")
      // the streaming twin emits exactly the reference's converted users
      // (driven via funnelDs directly: the staged events.parquet is a
      // directory of part files, which the driver query's glob over the
      // testdata layout does not address)
      import org.apache.spark.sql.streaming.{OutputMode, Trigger}
      val schema = spark.read.parquet(s"$dir/events.parquet").schema
      val evs = spark.readStream.schema(schema).parquet(s"$dir/events.parquet")
        .withColumnRenamed("ts", "ts_ns")
        .select($"user_id", $"ts_ns", $"event_id", $"event_type")
        .as[streaming.Streaming.FEv]
      val q = streaming.Streaming.funnelDs(evs)
        .writeStream.format("memory").queryName(s"graft_prop_funnel_$trial")
        .outputMode(OutputMode.Append()).trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      val streamed = spark.table(s"graft_prop_funnel_$trial")
        .as[(Long, Long, Long, Long)].collect().toSeq
      assert(streamed.sortBy(_._1) ==
        expected.toSeq.sortBy(_._1).map { case (u, (vt, ct, pt)) => (u, vt, ct, pt) },
        s"trial $trial: stream_funnel disagrees with the reference fold")
    }
  }
}
