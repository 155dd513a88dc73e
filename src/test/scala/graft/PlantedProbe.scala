package graft

// scratch probe for the planted-community fixture (not a gate)
object PlantedProbe {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import graft.queries.GraphOps
    def ring(c: Seq[Long], hops: Int = 1) =
      (1 to hops).flatMap { h =>
        c.indices.map(i => (c(i), c((i + h) % c.size)))
      }.map { case (x, y) => if (x < y) (x, y) else (y, x) }.distinct
    def clique(c: Seq[Long]) =
      (for { x <- c; y <- c if x < y } yield (x, y))

    def auc(und: Seq[(Long, Long)], pos: Seq[(Long, Long)],
        neg: Seq[(Long, Long)], tag: String): Unit = {
      val e = (und ++ und.map(_.swap)).distinct.toDF("src", "dst")
      val pmi = GraphOps.walkPmiFrom(
        GraphOps.walkPairsFrom(GraphOps.walkTableFrom(e)))
      val (v1, v2, _) = GraphOps.walkEmbedAxesFrom(pmi)
      val emb = v1.join(v2.withColumnRenamed("v", "v2"), "node")
        .localCheckpoint(true)
      def scored(df: org.apache.spark.sql.DataFrame, lbl: Long) = df
        .join(emb.select(col("node").as("u"), col("v").as("a1"),
          col("v2").as("a2")), "u")
        .join(emb.select(col("node").as("w"), col("v").as("b1"),
          col("v2").as("b2")), "w")
        .select((col("a1") * col("b1") + col("a2") * col("b2"))
          .as("score"), lit(lbl).as("lbl"))
      val r = GraphOps.rankSumAuc(scored(pos.toDF("u", "w"), 1L)
        .unionAll(scored(neg.toDF("u", "w"), 0L))).collect()(0)
      println(s"AUC[$tag] = ${r.getDouble(3)} " +
        s"(pos=${r.getLong(0)}, neg=${r.getLong(1)})")
    }

    // fixture 1: two 32-node chorded rings (i+1, i+2), 2 bridges
    {
      val a = (0L until 64L by 2).toSeq
      val b = (200L until 264L by 2).toSeq
      val intra = ring(a, 2) ++ ring(b, 2)
      val bridges = Seq((0L, 200L), (2L, 202L))
      val neg = (for { x <- a; y <- b } yield (x, y))
        .filterNot(bridges.contains)
      auc(intra ++ bridges, intra, neg, "2x chorded-ring-32")
    }
    // fixture 2: unequal rings 16 vs 96
    {
      val a = (0L until 32L by 2).toSeq
      val b = (200L until 392L by 2).toSeq
      val intra = ring(a) ++ ring(b)
      val bridges = Seq((0L, 200L), (2L, 202L))
      val neg = (for { x <- a; y <- b.take(32) } yield (x, y))
        .filterNot(bridges.contains)
      auc(intra ++ bridges, intra, neg, "ring16 vs ring96")
    }
    // fixture 3: core-periphery — dense core (chorded ring h=3),
    // pendant periphery; pos = core edges, neg = periphery pairs
    {
      val core = (0L until 32L by 2).toSeq
      val peri = (200L until 296L by 2).toSeq
      val coreE = ring(core, 3)
      val pendE = peri.zipWithIndex.map { case (p, i) =>
        (core(i % core.size), p)
      }
      val negPP = (for { x <- peri; y <- peri if x < y } yield (x, y))
        .take(600)
      auc(coreE ++ pendE, coreE, negPP, "core-periphery")
    }
    // fixture 5: 24-clique community vs background of 4-cycles —
    // engineered so the clique block's row sums (≈23 partners × w)
    // dominate the background's (3 × w'), letting 4 power iterations
    // localize v1 on the community
    {
      val a = (0L until 48L by 2).toSeq
      val b = (200L until 640L by 2).toSeq // 220 nodes
      val cycles = b.grouped(4).flatMap(ring(_)).toSeq
      val intra = clique(a) ++ cycles
      val bridges = Seq((0L, 200L), (2L, 204L))
      val neg = (for { x <- a; y <- b.take(30) } yield (x, y))
        .filterNot(bridges.contains)
      auc(intra ++ bridges, clique(a), neg, "clique24-vs-4cycles")
    }
    // fixture 4: small clique community in big sparse ring background
    {
      val a = (0L until 24L by 2).toSeq
      val b = (200L until 360L by 2).toSeq
      val intra = clique(a) ++ ring(b)
      val bridges = Seq((0L, 200L), (2L, 202L))
      val neg = (for { x <- a; y <- b.take(40) } yield (x, y))
        .filterNot(bridges.contains)
      auc(intra ++ bridges, clique(a), neg, "clique12-in-ring80")
    }
    spark.stop()
  }
}
