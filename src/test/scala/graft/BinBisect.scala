package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev aid (round 10, VERDICT r9 #3): bisect the source_binary
  * 1.05 → 2.22 s r8→r9 regression. The r9 change was two-fold — a
  * driver-side sweep (listFiles + 5000 unlinks) on a FIXED scratch dir
  * replacing r8's fresh-temp-dir-per-call (creates into an empty dir,
  * stranding a corpus copy per pass), plus the null-payload branch in
  * the writer. This times each stage in isolation at sf0.1 (5000 docs)
  * so the cause is a measured number, not a guess:
  *
  *   sweep      — driver-side listFiles + unlink of the 5000 .bin
  *   write_cold — foreachPartition delivery into an EMPTY dir
  *   write_warm — same delivery OVERWRITING the existing 5000 files
  *   census     — the binaryFile read-back + per-mime agg alone
  *   full_r9    — the shipped query (sweep + write + census)
  *   full_r8    — the r8 shape (fresh temp dir per pass, no sweep)
  *
  * `SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "Test/runMain graft.BinBisect"`
  */
object BinBisect {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val iters = math.max(1, sys.env.getOrElse("SPARK_GRAFT_ITERS", "4").toInt)
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val src = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    def timed(what: String)(f: => Any): Double = {
      val times = (1 to iters).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"$what%-12s min=${times.min}%6.3f s  all=[${times.map(t => f"$t%.3f").mkString(", ")}]")
      times.min
    }

    val docs = Tables.documents(spark, src)
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
    val n = docs.count()
    println(s"corpus: $n docs; tmp fs = ${new java.io.File(sys.props("java.io.tmpdir")).toPath.getFileSystem}")

    val dir = new java.io.File(sys.props("java.io.tmpdir"), "graft_binbisect")
    dir.mkdirs()
    val tmp = dir.toString
    def write(): Unit = docs.foreachPartition {
      it: Iterator[org.apache.spark.sql.Row] =>
        it.foreach { r =>
          val bytes = r.getAs[Array[Byte]](1)
          java.nio.file.Files.write(
            java.nio.file.Paths.get(tmp, s"${r.getLong(0)}.bin"),
            if (bytes == null) Array.empty[Byte] else bytes)
        }
    }
    def census(path: String): Long =
      spark.read.format("binaryFile").option("pathGlobFilter", "*.bin").load(path)
        .select(length(col("content")).cast("long").as("nbytes"))
        .agg(sum("nbytes")).queryExecution.toRdd.count()

    // warm the codegen/scan units once
    write(); census(tmp)

    // sweep alone: repopulate untimed before each pass so every sweep
    // unlinks the full 5000
    val sweepTimes = (1 to iters).map { _ =>
      write()
      val t0 = System.nanoTime()
      dir.listFiles.foreach(_.delete())
      (System.nanoTime() - t0) / 1e9
    }
    println(f"${"sweep"}%-12s min=${sweepTimes.min}%6.3f s  all=[${sweepTimes.map(t => f"$t%.3f").mkString(", ")}]")
    // write into an EMPTY dir (sweep untimed, write timed)
    val coldTimes = (1 to iters).map { _ =>
      dir.listFiles.foreach(_.delete())
      val t0 = System.nanoTime(); write(); (System.nanoTime() - t0) / 1e9
    }
    println(f"${"write_cold"}%-12s min=${coldTimes.min}%6.3f s  all=[${coldTimes.map(t => f"$t%.3f").mkString(", ")}]")
    timed("write_warm")(write())
    // fresh frame per pass — isolates per-call read/plan construction
    timed("write_fresh")({
      Tables.documents(spark, src)
        .select(col("doc_id"), col("text").cast("binary").as("payload"))
        .foreachPartition { it: Iterator[org.apache.spark.sql.Row] =>
          it.foreach { r =>
            val bytes = r.getAs[Array[Byte]](1)
            java.nio.file.Files.write(
              java.nio.file.Paths.get(tmp, s"${r.getLong(0)}.bin"),
              if (bytes == null) Array.empty[Byte] else bytes)
          }
        }
    })
    timed("census")(census(tmp))
    timed("full_r9")({
      SparkEntry.queries("source_binary")(spark, src).queryExecution.toRdd.count()
    })
    // phase split of the registered query: build (sweep + delivery write)
    // vs the census action on the returned frame
    (1 to iters).foreach { i =>
      val t0 = System.nanoTime()
      val df = SparkEntry.queries("source_binary")(spark, src)
      val t1 = System.nanoTime()
      df.queryExecution.toRdd.count()
      val t2 = System.nanoTime()
      println(f"r9_split pass$i: build(sweep+write)=${(t1 - t0) / 1e9}%.3f s  census=${(t2 - t1) / 1e9}%.3f s")
    }
    // interleaved A/B — alternating passes remove order/page-cache
    // confounds between the two arms
    val ab = (1 to 2 * iters).map { i =>
      if (i % 2 == 1) {
        val t0 = System.nanoTime()
        SparkEntry.queries("source_binary")(spark, src).queryExecution.toRdd.count()
        ("r9", (System.nanoTime() - t0) / 1e9)
      } else {
        val t0 = System.nanoTime()
        val t = java.nio.file.Files.createTempDirectory("graft_bb_r8i").toString
        docs.foreachPartition { it: Iterator[org.apache.spark.sql.Row] =>
          it.foreach { r =>
            val bytes = r.getAs[Array[Byte]](1)
            java.nio.file.Files.write(java.nio.file.Paths.get(t, s"${r.getLong(0)}.bin"),
              if (bytes == null) Array.empty[Byte] else bytes)
          }
        }
        census(t)
        org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(t))
        ("r8", (System.nanoTime() - t0) / 1e9)
      }
    }
    for ((arm, ts) <- ab.groupBy(_._1).toSeq.sortBy(_._1))
      println(f"interleaved $arm: min=${ts.map(_._2).min}%6.3f  " +
        f"med=${ts.map(_._2).sorted.apply(ts.size / 2)}%6.3f  all=[${ts.map(t => f"${t._2}%.3f").mkString(", ")}]")
    timed("full_r8")({
      val t = java.nio.file.Files.createTempDirectory("graft_bb_r8").toString
      docs.foreachPartition { it: Iterator[org.apache.spark.sql.Row] =>
        it.foreach { r =>
          val bytes = r.getAs[Array[Byte]](1)
          java.nio.file.Files.write(java.nio.file.Paths.get(t, s"${r.getLong(0)}.bin"),
            if (bytes == null) Array.empty[Byte] else bytes)
        }
      }
      census(t)
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(t))
    })
    spark.stop()
  }
}
