package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

object CandAB {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.queries.Llm
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def t(name: String)(df: => DataFrame): Unit = {
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        val n = df.queryExecution.toRdd.count()
        ((System.nanoTime() - t0) / 1e9, n)
      }
      println(f"$name%-30s min ${times.map(_._1).min}%6.2f s rows=${times.head._2} all ${times.map(x => f"${x._1}%5.2f").mkString(",")}")
    }
    graft.queries.Aggs.aggHash(spark, d).queryExecution.toRdd.count()
    graft.functions.VectorExprs.register(spark)
    val tok = graft.ops.Lineage.cut(Tables.documents(spark, d)
      .select(col("doc_id"), col("lang"), explode(split(col("text"), " ")).as("token")).distinct())
    val dfTok = tok.groupBy("token").agg(count(lit(1)).as("df"))
    val ntDf = tok.groupBy("doc_id").agg(count(lit(1)).as("nt"))
    val block = graft.ops.Lineage.cut(Llm.rarityBlocked(tok, dfTok, ntDf))
    val sizeOk = least(col("nt_a"), col("nt_b")) * (5 * 20000L) >=
                 greatest(col("nt_a"), col("nt_b")) * (4 * 20000L - 5)
    // plain self-join (no bucket here exceeds the shard threshold, so this
    // is what ShardedSelfJoin degenerates to)
    def raw = block.as("a").join(block.as("b"),
        col("a.block_tok") === col("b.block_tok") && col("a.lang") === col("b.lang") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.nt").as("nt_a"), col("b.nt").as("nt_b"))
      .where(sizeOk)
    t("join+filter only")(raw)
    t("join+filter+distinct")(raw.distinct())
    // emit-once after filter with hashed-long key arrays
    val blockH = graft.ops.Lineage.cut(
      Llm.rarityBlocked(tok, dfTok, ntDf)
        .withColumn("bk64", xxhash64(col("block_tok"))))
    val withSets = blockH.join(
      blockH.groupBy("doc_id").agg(sort_array(collect_set(col("bk64"))).as("bkeys")), "doc_id")
    val wsC = graft.ops.Lineage.cut(withSets)
    def emitOnce = wsC.as("a").join(wsC.as("b"),
        col("a.bk64") === col("b.bk64") && col("a.lang") === col("b.lang") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.nt").as("nt_a"), col("b.nt").as("nt_b"),
        col("a.bkeys").as("ka"), col("b.bkeys").as("kb"), col("a.bk64").as("k"))
      .where(sizeOk)
      .where(call_function("graft_emit_once", col("ka"), col("kb"), col("k")))
      .select("doc_a", "doc_b", "nt_a", "nt_b")
    t("emit-once after filter")(emitOnce)
    t("join+filter+distinct 2")(raw.distinct())
    t("emit-once after filter 2")(emitOnce)
    spark.stop()
  }
}
