package graft.delivery

import org.apache.spark.sql.SparkSession

/** Runnable example of the delivery surface: two-hop re-layout of the
  * lineitem fixture with integrity verification at each hop.
  * Usage: runMain graft.delivery.DeliveryDemo <sfDir> [workDir] */
object DeliveryDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val work = args.lift(1).getOrElse(
      java.nio.file.Files.createTempDirectory("delivery_demo").toString)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val src = s"$sfDir/lineitem.parquet"
    val hop1 = Deliver.copy(spark, src, s"$work/hop1", partitionBy = Seq("l_returnflag"))
    println(s"hop1 (partitioned by returnflag): $hop1")
    val hop2 = Deliver.copy(spark, s"$work/hop1", s"$work/hop2", repartitionTo = Some(3))
    println(s"hop2 (repartitioned to 3 files): $hop2")
    val ok = Deliver.verifyDelivery(spark, src, "parquet", s"$work/hop2", "parquet")
    println(s"source->hop2 verified: $ok (fingerprints + row counts match)")
    require(ok, "delivery verification failed")
    require(hop1.fingerprint == hop2.fingerprint, "fingerprint must be layout-invariant")
    spark.stop()
  }
}
