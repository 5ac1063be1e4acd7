package graft

import graft.crypto._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Behavior specs for the reference surface (SURVEY.md §2.1) beyond the
  * oracle queries: footer secrecy, key-resolution chain, null handling,
  * wrong-key failure modes, robustness cases from
  * /root/reference/src/main.cpp (sparse rows, empty row, long values).
  */
class CryptoSpec extends AnyFunSuite {
  import TestSession._
  private def tmp(name: String) = s"/tmp/graft_spec/$name"

  private lazy val cust = Tables.customer(spark, sf)

  test("kms: generateDataKey round-trips through the wrapped blob") {
    val dk = Kms.generateDataKey("mk-1")
    assert(dk.plaintext.length == 16)
    assert(!dk.wrapped.sameElements(dk.plaintext))
    assert(Kms.decryptDataKey(dk.wrapped, "mk-1").sameElements(dk.plaintext))
    intercept[Exception] { Kms.decryptDataKey(dk.wrapped, "mk-WRONG") }
  }

  test("key chain: explicit > kms > fallback > plaintext; bad lengths fall through") {
    val cfg = CryptoConfig("m", Seq(), fallbackKey = Some("ffffffffffffffff"))
    assert(cfg.resolveKeyForWrite(ColumnPolicy("c",
      explicitKey = Some("0123456789abcdef"))).mode == "column-key")
    // invalid-length explicit key falls through to kms
    assert(cfg.resolveKeyForWrite(ColumnPolicy("c",
      explicitKey = Some("short"), kmsMasterKeyId = Some("mk"))).mode == "kms")
    // no explicit/kms → fallback
    assert(cfg.resolveKeyForWrite(ColumnPolicy("c")).mode == "fallback")
    // nothing valid at all → plaintext (reference warning semantics)
    val bare = CryptoConfig("m", Seq(), fallbackKey = Some("bad"))
    assert(bare.resolveKeyForWrite(ColumnPolicy("c")).mode == "plaintext")
  }

  test("manifest on disk is ciphertext, decrypts only with the right master key") {
    val out = tmp("manifest")
    val cfg = CryptoConfig("master-A",
      Seq(ColumnPolicy("c_name", kmsMasterKeyId = Some("mk-n"))))
    EncryptedParquet.write(cust.limit(50), out, cfg)
    val raw = EncryptedParquet.rawManifestBytes(spark, out)
    assert(!new String(raw.drop(12), "ISO-8859-1").contains("c_name"),
      "manifest plaintext leaked")
    val m = EncryptedParquet.readManifest(spark, out, "master-A")
    assert(m.columns.map(_.name) == Seq("c_name") && m.rowCount == 50)
    intercept[Exception] { EncryptedParquet.readManifest(spark, out, "master-B") }
  }

  test("write stamps the manifest row count in the same pass as the data write") {
    val out = tmp("singlepass")
    val cfg = CryptoConfig("m",
      Seq(ColumnPolicy("c_name", explicitKey = Some("0123456789abcdef"))))
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      // shuffle-free single-stage input: the write plan is exactly one
      // job, so a manifest-count re-read would show as a second job
      val df = spark.range(40).selectExpr("id", "concat('name-', id) AS c_name")
      val m = EncryptedParquet.write(df, out, cfg)
      assert(m.rowCount == 40, "observed row count must match the data written")
      // listener bus is async — give posted events a beat to drain
      val deadline = System.currentTimeMillis() + 2000
      while (jobs.get() < 1 && System.currentTimeMillis() < deadline) Thread.sleep(50)
      Thread.sleep(200)
      assert(jobs.get() == 1,
        s"write must be ONE pass over the data (row count via observe, " +
          s"not a re-read), saw ${jobs.get()} jobs")
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("selective read: unrequested columns are the [ENCRYPTED] placeholder") {
    val out = tmp("selective")
    val cfg = CryptoConfig("m",
      Seq(ColumnPolicy("c_name", explicitKey = Some("0123456789abcdef")),
        ColumnPolicy("c_acctbal", explicitKey = Some("abcdef0123456789"))))
    EncryptedParquet.write(cust.limit(20), out, cfg)
    val df = EncryptedParquet.read(spark, out, Seq("c_acctbal"), cfg)
    val row = df.select(col("c_name"), col("c_acctbal")).limit(1).collect()(0)
    assert(row.getString(0) == EncryptedParquet.Placeholder)
    assert(!row.isNullAt(1)) // requested column decrypted to its orig double type
    assert(df.schema("c_acctbal").dataType.typeName == "double")
  }

  test("wrong key: aes_decrypt fails the task; try variant yields nulls") {
    val enc = ColumnCrypto.encryptColumns(cust.limit(5),
      Map("c_name" -> "0123456789abcdef".getBytes("UTF-8")))
    val wrong = Map("c_name" -> "ffffffffffffffff".getBytes("UTF-8"))
    intercept[Exception] {
      ColumnCrypto.decryptColumns(enc, wrong).collect()
    }
    val tried = ColumnCrypto.tryDecryptColumns(enc, wrong)
      .select(col("c_name")).collect()
    assert(tried.forall(_.isNullAt(0)))
  }

  test("nulls and empties survive encrypt→decrypt (reference sparse-row cases)") {
    import spark.implicits._
    // sparse rows (nulls), an all-empty row, and a 5000-char value —
    // the reference's robustness matrix (/root/reference/src/main.cpp)
    val df = Seq(
      (1L, Some("alice"), Some("x" * 5000)),
      (2L, None, Some("")),
      (3L, None, None)
    ).toDF("id", "a", "b")
    val keys = Map("a" -> "0123456789abcdef".getBytes("UTF-8"),
      "b" -> "abcdef0123456789".getBytes("UTF-8"))
    val back = ColumnCrypto.decryptColumns(ColumnCrypto.encryptColumns(df, keys), keys)
    val rows = back.orderBy("id").collect()
    assert(rows(0).getString(1) == "alice" && rows(0).getString(2) == "x" * 5000)
    assert(rows(1).isNullAt(1) && rows(1).getString(2) == "")
    assert(rows(2).isNullAt(1) && rows(2).isNullAt(2))
  }

  test("modular encryption: file unreadable without the crypto factory") {
    val out = tmp("modular")
    ModularEncryption.writeEncrypted(cust.limit(30), out,
      columnKeys = Map("mk-c" -> Seq("c_name")), footerKeyId = "mk-f")
    intercept[Exception] { spark.read.parquet(out).collect() } // footer is encrypted
    val dec = ModularEncryption.readEncrypted(spark, out)
    assert(dec.count() == 30)
    assert(dec.select("c_name").na.drop().count() == 30)
  }

  test("masking: hash is deterministic, partial keeps tail, redact constant") {
    import spark.implicits._
    val df = Seq(("4111111111111111", "s")).toDF("card", "x")
    val m = df.select(
      Masking.hashMask($"card").as("h"),
      Masking.partialMask($"card", 4).as("p"),
      Masking.redact.as("r")).collect()(0)
    assert(m.getString(0).matches("[0-9a-f]{64}"))
    assert(m.getString(1) == "************1111")
    assert(m.getString(2) == "***")
  }

  test("rbac: denied columns are absent, masked columns masked") {
    val policy = Rbac.Policy(Map("analyst" -> Map(
      "c_custkey" -> Rbac.Allow, "c_name" -> Rbac.Mask(Masking.hashMask))))
    val v = policy(cust, "analyst")
    assert(v.columns.toSeq == Seq("c_custkey", "c_name"))
    assert(v.select("c_name").limit(1).collect()(0).getString(0).matches("[0-9a-f]{64}"))
    intercept[IllegalArgumentException] { policy(cust, "nosuchrole") }
  }
}
