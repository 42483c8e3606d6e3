package graft.io

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Schema evolution laws ([[Store.addColumns]] + the catalog's `ALTER
  * TABLE ADD COLUMN` face): an add-column is a metadata-only epoch (same
  * file set, widened declared schema), every epoch reads under ITS OWN
  * schema, pre-evolution files project the new columns as null, the COW
  * and OPTIMIZE paths preserve evolved columns, and everything that is
  * not an additive nullable top-level add stays loudly refused.
  */
class SchemaEvolutionSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def mk(lo: Long, hi: Long) = spark.range(lo, hi)
    .select(col("id").as("k"), (col("id") % 13).as("v"))

  test("curve store: add-column is a same-fileset epoch; each epoch keeps its " +
    "own schema; old files read null; appends carry the new column") {
    val base = Files.createTempDirectory("graft_se1").toString
    val store = new Store(spark, base)
    store.writeZordered(mk(0, 1000), "tbl", Seq("k", "v"), files = 2)   // epoch 0
    val files0 = new java.io.File(s"$base/tbl").listFiles()
      .filter(f => f.isFile && !f.getName.startsWith(".") && !f.getName.startsWith("_"))
      .map(f => f.getName -> f.lastModified).toMap

    store.addColumns("tbl", new StructType().add("score", DoubleType))  // epoch 1
    // metadata-only: the data files did not move, nothing was staged
    val files1 = new java.io.File(s"$base/tbl").listFiles()
      .filter(f => f.isFile && !f.getName.startsWith(".") && !f.getName.startsWith("_"))
      .map(f => f.getName -> f.lastModified).toMap
    assert(files1 == files0, "add-column must not touch any data file")

    // current read: widened schema, old rows null
    val snap1 = store.readSnapshot("tbl")
    assert(snap1.schema.fieldNames.toSeq == Seq("k", "v", "score"))
    assert(snap1.where(col("score").isNotNull).count() == 0)

    // append v2 rows WITH the new column (epoch 2)
    store.appendZordered(
      mk(1000, 1100).withColumn("score", col("k") * 0.5), "tbl",
      Seq("k", "v"), files = 1)
    val snap2 = store.readSnapshot("tbl")
    assert(snap2.count() == 1100)
    assert(snap2.where(col("score").isNotNull).count() == 100)
    assert(snap2.agg(sum("score")).head.getDouble(0) ==
      (1000L until 1100L).map(_ * 0.5).sum)

    // VERSION AS OF: epoch 0 shows the NARROW schema, epoch 1 the wide one
    assert(store.readVersion("tbl", 0L).schema.fieldNames.toSeq == Seq("k", "v"))
    assert(store.readVersion("tbl", 1L).schema.fieldNames.toSeq ==
      Seq("k", "v", "score"))
    assert(store.readVersion("tbl", 1L).count() == 1000)

    // COW update touches only match-bearing files and PRESERVES the
    // evolved column through the region rewrite (mixed-vintage region)
    store.updateWhere("tbl", col("k") === 1050L,
      Map("score" -> lit(99.0)))                                        // epoch 3
    val snap3 = store.readSnapshot("tbl")
    assert(snap3.where(col("k") === 1050L).head.getAs[Double]("score") == 99.0)
    assert(snap3.schema.fieldNames.toSeq == Seq("k", "v", "score"))
    assert(snap3.count() == 1100)

    // scoped OPTIMIZE folds the append layer without dropping the column
    store.scopedRecluster("tbl")                                        // epoch 4
    val snap4 = store.readSnapshot("tbl")
    assert(snap4.schema.fieldNames.toSeq == Seq("k", "v", "score"))
    assert(snap4.where(col("score").isNotNull).count() == 100)
  }

  test("SQL face: ALTER TABLE graft.t ADD COLUMN widens through the catalog; " +
    "VERSION AS OF reads each epoch's own schema; refusals stay loud") {
    val base = Files.createTempDirectory("graft_se2").toString
    val store = new Store(spark, base)
    store.writeZordered(mk(0, 500), "tbl", Seq("k", "v"), files = 2)    // epoch 0
    spark.conf.set("spark.sql.catalog.graft_se2", "graft.sql.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graft_se2.base", base)

    spark.sql("ALTER TABLE graft_se2.tbl ADD COLUMN score DOUBLE")      // epoch 1
    assert(spark.table("graft_se2.tbl").schema.fieldNames.toSeq ==
      Seq("k", "v", "score"))
    store.appendZordered(mk(500, 600).withColumn("score", lit(2.0)),
      "tbl", Seq("k", "v"), files = 1)                                  // epoch 2
    val agg = spark.sql(
      "SELECT COUNT(*) AS n, SUM(score) AS s FROM graft_se2.tbl").head
    assert(agg.getLong(0) == 600 && agg.getDouble(1) == 200.0)
    assert(spark.sql("SELECT * FROM graft_se2.tbl VERSION AS OF 0")
      .schema.fieldNames.toSeq == Seq("k", "v"))
    assert(spark.sql("SELECT * FROM graft_se2.tbl VERSION AS OF 1")
      .schema.fieldNames.toSeq == Seq("k", "v", "score"))

    // refusal witnesses: drop / rename / type change / NOT NULL add
    for (ddl <- Seq(
      "ALTER TABLE graft_se2.tbl DROP COLUMN v",
      "ALTER TABLE graft_se2.tbl RENAME COLUMN v TO w",
      "ALTER TABLE graft_se2.tbl ALTER COLUMN v TYPE INT",
      "ALTER TABLE graft_se2.tbl ADD COLUMN nn INT NOT NULL")) {
      val e = intercept[Exception] { spark.sql(ddl) }
      assert(e.getMessage.contains("read-only") ||
        e.getMessage.contains("ALTER TABLE"), s"$ddl -> ${e.getMessage}")
    }
    // duplicate name refused at the Store face
    val eDup = intercept[Exception] {
      store.addColumns("tbl", new StructType().add("v", LongType))
    }
    assert(eDup.getMessage.contains("already exists"))
    // a stray column the declared schema does not know is an append error,
    // not silent loss
    val eStray = intercept[Exception] {
      store.appendZordered(mk(600, 610).withColumn("oops", lit(1)),
        "tbl", Seq("k", "v"), files = 1)
    }
    assert(eStray.getMessage.contains("declared"), eStray.getMessage)
    // manifest-less tables have no epochs to evolve
    val plain = Files.createTempDirectory("graft_se2p").toString
    val pstore = new Store(spark, plain)
    mk(0, 10).write.parquet(s"$plain/raw")
    val ePlain = intercept[Exception] {
      pstore.addColumns("raw", new StructType().add("x", IntegerType))
    }
    assert(ePlain.getMessage.contains("manifest"))
  }

  test("partitioned managed store: add-column slots before dt; upserts carry " +
    "it; old epochs keep the narrow schema with dt reconstructed") {
    val base = Files.createTempDirectory("graft_se3").toString
    val store = new Store(spark, base)
    val days = spark.range(300).select(
      (col("id") % 60).as("k"),
      expr("timestamp'2024-01-01 00:00:00' + make_interval(0,0,0,cast(id % 3 as int),0,0,0)").as("ts"),
      (col("id") % 7).cast("double").as("value"))
    store.writePartitionedManaged(days, "ptbl", tsCol = "ts")           // epoch 0
    store.addColumns("ptbl", new StructType().add("label", StringType)) // epoch 1
    assert(store.readSnapshot("ptbl").schema.fieldNames.toSeq ==
      Seq("k", "ts", "value", "label", "dt"),
      store.readSnapshot("ptbl").schema.fieldNames.mkString(","))
    // upsert one day WITH the label populated (epoch 2)
    val day = days.where(expr("cast(ts as date) = date'2024-01-02'"))
      .withColumn("label", lit("good"))
    store.upsertPartitionsManaged(day, "ptbl", tsCol = "ts")
    val snap = store.readSnapshot("ptbl")
    assert(snap.where(col("label").isNotNull).count() ==
      day.count(), "only the upserted day carries labels")
    assert(snap.select(countDistinct(col("dt"))).head.getLong(0) == 3)
    // catalog face agrees, dt reconstructed
    spark.conf.set("spark.sql.catalog.graft_se3", "graft.sql.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graft_se3.base", base)
    assert(spark.sql(
      "SELECT COUNT(*) FROM graft_se3.ptbl WHERE label = 'good' AND dt = date'2024-01-02'")
      .head.getLong(0) == day.count())
    // the pre-evolution epoch reads narrow, partition column intact
    val v0 = store.readVersion("ptbl", 0L)
    assert(v0.schema.fieldNames.toSeq == Seq("k", "ts", "value", "dt"))
    assert(v0.count() == 300)
  }
}
