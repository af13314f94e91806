package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.Trigger
import graft.table.SnapTable

/** The `graft-snap` streaming source: snapshot ids as offsets. */
class SnapSourceSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  // the expire legs pin EXACT retention boundaries; checkpointEvery=1
  // (every manifest a full checkpoint) keeps the cut at keepLast
  // precisely instead of extending to the nearest checkpoint
  import TestSnapKnobs.withCheckpointEvery

  test("incremental reader sees exactly the appended rows; compaction invisible; expire fails loudly") {
    withCheckpointEvery(1) {
    import spark.implicits._
    val base = tmp("snapsrc")
    val root = s"$base/tbl"
    val ckpt = s"$base/ckpt"
    val got = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    def runOnce(): Seq[Long] = {
      got.clear()
      val q = spark.readStream.format("graft-snap").option("path", root).load()
        .writeStream.option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          b.select("id").as[Long].collect().foreach(got.add)
          ()
        }
        .start()
      q.awaitTermination()
      got.toArray(Array.empty[java.lang.Long]).map(_.longValue()).toSeq
    }
    SnapTable.append(spark, root, (0L until 10L).toDF("id"))
    SnapTable.append(spark, root, (10L until 20L).toDF("id"))
    assert(runOnce().sorted == (0L until 20L))
    // new commits between runs: the restarted stream resumes at the
    // checkpointed snapshot id and reads EXACTLY the new lineage,
    // through an interleaved compaction (rewrite adds no rows)
    SnapTable.append(spark, root, (20L until 30L).toDF("id"))
    SnapTable.rewrite(spark, root, _ => true, _.repartition(1))
    SnapTable.append(spark, root, (30L until 35L).toDF("id"))
    assert(runOnce().sorted == (20L until 35L))
    // a run with nothing new delivers nothing
    assert(runOnce().isEmpty)
    // a checkpoint that falls behind expire must fail loudly, not skip
    SnapTable.append(spark, root, (35L until 40L).toDF("id"))
    SnapTable.append(spark, root, (40L until 45L).toDF("id"))
    SnapTable.expire(spark, root, keepLast = 1)
    val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      runOnce()
    }
    def chain(t: Throwable): List[Throwable] =
      if (t == null) Nil else t :: chain(t.getCause)
    assert(chain(ex).exists(c => c.getMessage != null &&
      c.getMessage.contains("re-sync")), chain(ex).map(_.getMessage).toString)
    }
  }

  test("start=snapshot serves current content as batch one on an expired-genesis table; start=latest serves only new commits") {
    withCheckpointEvery(1) {
    import spark.implicits._
    val base = tmp("snapsrc4")
    val root = s"$base/tbl"
    SnapTable.append(spark, root, (0L until 10L).toDF("id"))
    SnapTable.append(spark, root, (10L until 20L).toDF("id"))
    SnapTable.expire(spark, root, keepLast = 1) // genesis lineage gone
    val got = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    def runOnce(ckpt: String, start: String): Seq[Long] = {
      got.clear()
      val q = spark.readStream.format("graft-snap").option("path", root)
        .option("start", start).load()
        .writeStream.option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          b.select("id").as[Long].collect().foreach(got.add)
          ()
        }
        .start()
      q.awaitTermination()
      got.toArray(Array.empty[java.lang.Long]).map(_.longValue()).toSeq
    }
    // genesis (default) cannot replay expired lineage — loud, with the
    // recovery options named
    val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      runOnce(s"$base/ckpt-genesis", "genesis")
    }
    def chain(t: Throwable): List[Throwable] =
      if (t == null) Nil else t :: chain(t.getCause)
    assert(chain(ex).exists(c => c.getMessage != null &&
      c.getMessage.contains("start")), chain(ex).map(_.getMessage).toString)
    // snapshot: full current content once, then incremental
    assert(runOnce(s"$base/ckpt-snap", "snapshot").sorted == (0L until 20L))
    SnapTable.append(spark, root, (20L until 25L).toDF("id"))
    assert(runOnce(s"$base/ckpt-snap", "snapshot").sorted == (20L until 25L))
    // latest: an empty first pass pins the head, later commits flow
    assert(runOnce(s"$base/ckpt-latest", "latest").isEmpty)
    SnapTable.append(spark, root, (25L until 30L).toDF("id"))
    assert(runOnce(s"$base/ckpt-latest", "latest").sorted == (25L until 30L))
    // bogus mode rejected
    intercept[IllegalArgumentException] {
      spark.readStream.format("graft-snap").option("path", root)
        .option("start", "bogus").load()
    }
    }
  }

  test("maxSnapshotsPerTrigger paces the backfill via ReadLimit admission control") {
    import spark.implicits._
    val base = tmp("snapsrc5")
    val root = s"$base/tbl"
    for (k <- 0 until 6)
      SnapTable.append(spark, root, (5L * k until 5L * k + 5).toDF("id"))
    val got = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val batchSizes = new java.util.concurrent.ConcurrentLinkedQueue[Int]()
    def runOnce(ckpt: String, maxSnaps: String, start: String = "genesis"): (Seq[Long], Seq[Int]) = {
      got.clear(); batchSizes.clear()
      val q = spark.readStream.format("graft-snap").option("path", root)
        .option("start", start)
        .option("maxSnapshotsPerTrigger", maxSnaps).load()
        .writeStream.option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          val rows = b.select("id").as[Long].collect()
          rows.foreach(got.add)
          batchSizes.add(rows.length)
          ()
        }
        .start()
      q.awaitTermination()
      (got.toArray(Array.empty[java.lang.Long]).map(_.longValue()).toSeq,
        batchSizes.toArray(Array.empty[java.lang.Integer]).map(_.intValue()).toSeq)
    }
    // 6 snapshots at 2 per trigger: everything arrives, in >= 3 paced
    // batches of <= 10 rows (2 snapshots x 5 rows) each
    val (rows1, sizes1) = runOnce(s"$base/ckpt", "2")
    assert(rows1.sorted == (0L until 30L))
    assert(sizes1.count(_ > 0) >= 3, sizes1.toString)
    assert(sizes1.forall(_ <= 10), sizes1.toString)
    // restart resumes the checkpoint and drains only the new commits
    SnapTable.append(spark, root, (30L until 35L).toDF("id"))
    val (rows2, _) = runOnce(s"$base/ckpt", "2")
    assert(rows2.sorted == (30L until 35L))
    // the snapshot start mode's FIRST batch is atomic — never paced
    val (rows3, sizes3) = runOnce(s"$base/ckpt-snap", "1", start = "snapshot")
    assert(rows3.sorted == (0L until 35L))
    assert(sizes3.count(_ > 0) == 1, sizes3.toString)
    // a bogus cap is rejected at analysis
    intercept[IllegalArgumentException] {
      spark.readStream.format("graft-snap").option("path", root)
        .option("maxSnapshotsPerTrigger", "0").load()
    }
  }

  test("AvailableNow on an empty-at-prepare table pins 'nothing' — racing commits are the next run's work") {
    import spark.implicits._
    val root = s"${tmp("snapsrc6")}/tbl"
    val schema = new org.apache.spark.sql.types.StructType()
      .add("id", org.apache.spark.sql.types.LongType)
    val src = new graft.table.SnapSource(spark.sqlContext, root, schema, "genesis")
    src.prepareForTriggerAvailableNow()
    // a writer races the drain: without the explicit empty pin this
    // would surface as a live head and keep extending the run
    SnapTable.append(spark, root, Seq(1L).toDF("id"))
    val limit = org.apache.spark.sql.connector.read.streaming.ReadLimit.allAvailable()
    assert(src.latestOffset(null, limit) == null)
    // a fresh (non-AvailableNow) source sees the commit immediately
    val live = new graft.table.SnapSource(spark.sqlContext, root, schema, "genesis")
    assert(live.latestOffset(null, limit).json.trim.toLong == 1L)
  }

  test("schema comes from the table; an empty table demands an explicit schema") {
    import spark.implicits._
    val root = s"${tmp("snapsrc2")}/tbl"
    SnapTable.append(spark, root, Seq((1L, "a")).toDF("id", "v"))
    val df = spark.readStream.format("graft-snap").option("path", root).load()
    assert(df.schema.fieldNames.toSeq == Seq("id", "v"))
    intercept[IllegalArgumentException] {
      spark.readStream.format("graft-snap")
        .option("path", s"${tmp("snapsrc3")}/none").load()
    }
  }
}
