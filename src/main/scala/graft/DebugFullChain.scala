package graft

// TEMPORARY diagnostic — phase timing for q_ivm_full_chain; not wired
// into any battery, deleted before round close.
object DebugFullChain {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.build("debug-fullchain")
    val dir = "/root/testdata/sf0.1"
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.{IntegerType, LongType, StringType, StructField, StructType}
    def phase[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[phase] $name%-22s ${(System.nanoTime() - t0) / 1e9}%6.2fs")
      r
    }
    val wh = java.nio.file.Files
      .createTempDirectory("debug_fullchain").toString
    val cat = new graft.sources.GraftCatalog(spark, wh)
    cat.createTable("fl9", StructType(Seq(
      StructField("okey", LongType), StructField("ln", IntegerType),
      StructField("pkey", LongType), StructField("qty", LongType))),
      pk = Seq("okey", "ln"))
    cat.createTable("fo9", StructType(Seq(
      StructField("okey", LongType),
      StructField("priority", StringType))), pk = Seq("okey"))
    cat.createTable("fp9", StructType(Seq(
      StructField("pkey", LongType),
      StructField("brand", StringType))), pk = Seq("pkey"))
    val li = Tables.t(spark, dir, "lineitem")
      .where($"l_orderkey" % 32 < 3)
      .groupBy($"l_orderkey".as("okey"), $"l_linenumber".as("ln"))
      .agg(max($"l_partkey".cast("long")).as("pkey"),
        sum($"l_quantity".cast("long")).as("qty"))
    val ord = Tables.t(spark, dir, "orders")
      .select($"o_orderkey".as("okey"),
        $"o_orderpriority".as("priority"))
      .where($"okey" % 32 < 4)
    val prt = Tables.t(spark, dir, "part")
      .select($"p_partkey".cast("long").as("pkey"),
        $"p_brand".as("brand"))
    phase("ingest") {
      cat.upsert("fl9", li)
      cat.upsert("fo9", ord.where($"okey" % 32 =!= 2))
      cat.upsert("fp9", prt)
    }
    val mv = wh + "/mvfc"
    phase("build") {
      graft.operators.MaterializeJoin.build(cat,
        graft.operators.MaterializeJoin.ChainSpec("fl9", Seq(
          graft.operators.MaterializeJoin.SideSpec("fo9", Seq("okey")),
          graft.operators.MaterializeJoin.SideSpec("fp9", Seq("pkey"))),
          fullOuter = true),
        Seq("priority", "brand"), Seq("qty"), mv)
    }
    phase("churn1") {
      cat.upsert("fo9", ord.where($"okey" % 32 === 2))
      cat.delete("fl9", $"okey" % 10 === 3)
    }
    phase("refresh1") {
      graft.operators.MaterializeJoin.refresh(cat, mv)
    }
    println(s"[gate] refresh1 recompute=" +
      graft.operators.MaterializeJoin.LastRefresh.recomputeRan +
      " affected=" +
      graft.operators.MaterializeJoin.LastRefresh.affectedGroups)
    phase("churn2") {
      cat.delete("fo9", $"okey" % 20 === 5)
      cat.delete("fp9", $"pkey" % 50 === 7)
      cat.upsert("fl9", li.where($"okey" % 100 === 1)
        .withColumn("qty", $"qty" + 7L))
    }
    phase("refresh2") {
      graft.operators.MaterializeJoin.refresh(cat, mv)
    }
    println(s"[gate] refresh2 recompute=" +
      graft.operators.MaterializeJoin.LastRefresh.recomputeRan +
      " affected=" +
      graft.operators.MaterializeJoin.LastRefresh.affectedGroups)
    phase("read") {
      graft.operators.MaterializeJoin.read(spark, mv)
        .select($"priority", $"brand", $"cnt", $"sum_qty",
          $"min_qty", $"max_qty")
        .orderBy($"priority", $"brand")
        .queryExecution.toRdd.count()
    }
    spark.stop()
  }
}
