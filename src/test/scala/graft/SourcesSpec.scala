package graft

import graft.api.VectorRecord
import graft.index.Grid
import org.apache.spark.sql.functions._

/** Sources/sinks beyond parquet (SURVEY §2.2 scans row) + typed Dataset
  * facade + ingest validation. */
class SourcesSpec extends SparkSpecBase {
  import spark.implicits._

  private lazy val docs = spark.read.parquet(s"$sfDir/documents.parquet")

  test("CSV round-trip preserves rows and schema (with header + explicit schema)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_csv").toString
    docs.select("doc_id", "lang", "source", "n_chars")
      .write.mode("overwrite").option("header", "true").csv(dir)
    val back = spark.read.option("header", "true")
      .schema("doc_id LONG, lang STRING, source STRING, n_chars LONG").csv(dir)
    assert(back.count() == docs.count())
    assert(back.agg(sum("n_chars")).head().getLong(0) ==
      docs.agg(sum("n_chars")).head().getLong(0))
  }

  test("JSON-lines round-trip preserves rows including the text column") {
    val dir = java.nio.file.Files.createTempDirectory("graft_json").toString
    docs.write.mode("overwrite").json(dir)
    val back = spark.read.json(dir)
    assert(back.count() == docs.count())
    assert(back.select(md5(col("text"))).distinct().count() ==
      docs.select(md5(col("text"))).distinct().count())
  }

  test("ORC round-trip preserves rows incl. the float-array embedding column") {
    val dir = java.nio.file.Files.createTempDirectory("graft_orc").toString
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    emb.write.mode("overwrite").orc(dir)
    val back = spark.read.orc(dir)
    assert(back.count() == emb.count())
    assert(back.schema("embedding").dataType == emb.schema("embedding").dataType)
    // vectors survive bit-exactly: same top-k under the same query
    val q = graft.core.Fixtures.Q64
    val a = graft.operators.Knn.bruteForce(back,
      graft.functions.Distances.squaredL2Lit(col("embedding"), q), 5)
      .collect().map(r => (r.getLong(0), r.getDouble(2))).toSeq
    val b = graft.operators.Knn.bruteForce(emb,
      graft.functions.Distances.squaredL2Lit(col("embedding"), q), 5)
      .collect().map(r => (r.getLong(0), r.getDouble(2))).toSeq
    assert(a == b)
  }

  test("typed Dataset[VectorRecord] round-trips through the encoder") {
    val ds = spark.read.parquet(s"$sfDir/embeddings.parquet").as[VectorRecord]
    val filtered = ds.filter(_.label == 3).map(r => r.copy(vec_id = r.vec_id + 1))
    val n = filtered.count()
    assert(n > 0 && n == spark.read.parquet(s"$sfDir/embeddings.parquet")
      .filter(col("label") === 3).count())
  }

  test("dynamic partition overwrite replaces ONLY the partitions in the incoming batch") {
    // the warehouse idiom for re-running one period of a partitioned
    // layout: overwrite mode with partitionOverwriteMode=dynamic must
    // replace the touched month and leave every other month intact
    // (static overwrite would drop the whole table)
    val dir = java.nio.file.Files.createTempDirectory("graft_dynover").toString
    val prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try {
      val orders = spark.read.parquet(s"$sfDir/orders.parquet")
        .withColumn("ym", (year(col("o_orderdate")) * 100 + month(col("o_orderdate"))).cast("int"))
      orders.write.mode("overwrite").partitionBy("ym").parquet(dir)
      val before = spark.read.parquet(dir)
      val months = before.select("ym").distinct().count()
      assert(months > 1, "need several months for the semantic to be observable")
      val target = before.select(min(col("ym"))).head().getInt(0)
      // materialize the expectation BEFORE the second write — `before` is
      // a lazy view over the directory and would re-read post-overwrite
      val othersBefore = before.filter(col("ym") =!= target).count()
      val replacement = before.filter(col("ym") === target).limit(3)
        .localCheckpoint(true)
      replacement.write.mode("overwrite").partitionBy("ym").parquet(dir)
      val after = spark.read.parquet(dir)
      assert(after.filter(col("ym") === target).count() == 3,
        "touched partition must hold exactly the new batch")
      assert(after.filter(col("ym") =!= target).count() == othersBefore,
        "untouched partitions must survive the overwrite")
    } finally {
      spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    }
  }

  test("schema evolution on read: mergeSchema unions old and new file schemas") {
    // the additive-column evolution a long-lived corpus store goes
    // through: files written before the column exists read as NULL,
    // new files carry it — one logical table, no rewrite of history
    val dir = java.nio.file.Files.createTempDirectory("graft_evolve").toString
    Seq((1L, "alpha"), (2L, "beta")).toDF("doc_id", "text")
      .write.mode("append").parquet(dir)
    Seq((3L, "gamma", 0.9)).toDF("doc_id", "text", "quality")
      .write.mode("append").parquet(dir)
    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(merged.columns.sorted.toSeq == Seq("doc_id", "quality", "text"))
    assert(merged.count() == 3)
    assert(merged.filter(col("quality").isNull).count() == 2)
    assert(merged.filter(col("doc_id") === 3L).head().getAs[Double]("quality") == 0.9)
  }

  test("ingest validation raises on wrong-dim vectors and passes good ones") {
    val good = Seq((1L, Array.fill(4)(0.1f))).toDF("vec_id", "embedding")
    assert(Grid.requireDim(good, "embedding", 4).count() == 1)
    val bad = Seq((1L, Array.fill(3)(0.1f))).toDF("vec_id", "embedding")
    val ex = intercept[Exception] { Grid.requireDim(bad, "embedding", 4).count() }
    def chain(t: Throwable): Seq[Throwable] =
      Option(t).toSeq.flatMap(e => e +: chain(e.getCause))
    assert(chain(ex).exists(_.getMessage != null) &&
      chain(ex).exists(e => e.getMessage != null && e.getMessage.contains("ingest validation")))
  }
}
