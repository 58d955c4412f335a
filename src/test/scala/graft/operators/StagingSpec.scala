package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

import scala.concurrent.{Await, Future}
import scala.concurrent.duration._
import scala.concurrent.ExecutionContext.Implicits.global

/** Contract tests for [[Staging]]: per-invocation unique staging paths
  * mean two pipelines (or two concurrent invocations of one operator)
  * may share a single `stagingDir` without clobbering each other's
  * staged relations — the collision the round-7 audit flagged against
  * constant subdirectory names.
  */
class StagingSpec extends SparkSuite {
  import spark.implicits._

  private val base = "the quick brown fox jumps over the lazy dog and runs far away " * 4
  private def corpus = Seq(
    (0L, base), (1L, base),
    (2L, base.replace("lazy", "sleepy")),
    (3L, "completely different content about catalyst optimizer rules " * 3)
  ).toDF("doc_id", "text")

  test("stage: same logical name twice under one dir → two distinct tables") {
    val dir = java.nio.file.Files.createTempDirectory("graft-stg").toString
    try {
      val a = Staging.stage(Seq(1, 2).toDF("x"), Some(dir), "t")
      val b = Staging.stage(Seq(30, 40).toDF("x"), Some(dir), "t")
      // the first staged relation must still read ITS data after the
      // second call — with a constant subdir the overwrite corrupted it
      assert(a.as[Int].collect().toSet == Set(1, 2))
      assert(b.as[Int].collect().toSet == Set(30, 40))
      assert(new java.io.File(dir).listFiles().count(_.getName.startsWith("t_")) == 2)
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
      ()
    }
  }

  test("two staged operators run CONCURRENTLY against one shared dir") {
    val dir = java.nio.file.Files.createTempDirectory("graft-stg-conc").toString
    try {
      val expectCorpus = Dedup.dedupCorpus(corpus, threshold = 0.5)
        .select($"doc_id").as[Long].collect().toSet
      val expectPairs = Dedup.minhashPairs(corpus, bands = 32, rowsPerBand = 2,
        threshold = 0.5).select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
      // dedupCorpus stages exact_survivors + signatures; minhashPairs
      // stages signatures — under round-6 constant names these collide
      val fCorpus = Future(Dedup.dedupCorpus(corpus, threshold = 0.5,
        stagingDir = Some(dir)).select($"doc_id").as[Long].collect().toSet)
      val fPairs = Future(Dedup.minhashPairs(corpus, bands = 32, rowsPerBand = 2,
        threshold = 0.5, stagingDir = Some(dir))
        .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet)
      assert(Await.result(fCorpus, 120.seconds) == expectCorpus)
      assert(Await.result(fPairs, 120.seconds) == expectPairs)
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
      ()
    }
  }

  test("drop removes a staged table") {
    val dir = java.nio.file.Files.createTempDirectory("graft-stg-drop").toString
    try {
      val (df, path) = Staging.stageAt(Seq(1).toDF("x"), dir, "gone")
      assert(df.count() == 1L)
      Staging.drop(spark, path)
      assert(!new java.io.File(path).exists())
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
      ()
    }
  }
}
