package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** 100× profile of the PRODUCTION image-dedup path (VERDICT r13 #5):
  * SCALE_r16 §7 profiled the m8 ENTRY's synthetic raster stage; this
  * drives the path real corpora take — committed image BYTES → the
  * ImageIO decode inside `phashDedupCore` → grayscale → dHash →
  * collapse-first clustering — plus the round-14 dispatch gate's two
  * regimes on the same corpus, and the incremental `phash_match` shape
  * (hash ∝ batch against committed fingerprints).
  *
  * Per directory: (1) render + commit the corpus's PNGs to scratch
  * parquet ONCE (the committed `db.imgs` table a user's CALL reads);
  * (2) cold + warm `phashDedupCore` walls over those real bytes;
  * (3) the same corpus through the DISTRIBUTED clustering regime
  * (`spark.graft.d7.driverMaxPairs = 0`) — identical row count,
  * measured wall delta; (4) `phashFingerprints` commit (the
  * phash_index artifact) and a 1%-of-corpus `phash_match` probe
  * against it.
  *
  * Usage: runMain graft.ProfPhash100 <dir> [<dir> …] */
object ProfPhash100 {
  def t(name: String)(f: => Long): Long = {
    val t0 = System.nanoTime(); val n = f
    println(f"[prof] $name%-28s ${(System.nanoTime() - t0) / 1e9}%7.2fs rows=$n")
    n
  }
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").config(Tables.sessionConfs).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (dir <- args.toSeq) {
      println(s"== $dir")
      val scratch = java.nio.file.Files
        .createTempDirectory("phash-prof").toString
      val imgsPath = s"$scratch/imgs.parquet"
      t("render+commit corpus PNGs")({
        operators.Multimodal.pngEncoded(spark, dir).toDF("doc_id", "img")
          .write.mode("overwrite").parquet(imgsPath)
        spark.read.parquet(imgsPath).count()
      })
      def imgs = spark.read.parquet(imgsPath)
      t("phash_dedup cold")(operators.Multimodal.phashDedupCore(imgs).count())
      // the warm pass's count doubles as the regime-identity reference
      // — no third untimed corpus decode (review r14)
      val driverRows =
        t("phash_dedup warm")(operators.Multimodal.phashDedupCore(imgs).count())
      // the dispatch gate's OTHER regime on the same corpus: force the
      // distributed min-label path and require the identical cluster
      // row count (the spec proves row-level identity at small scale)
      spark.conf.set("spark.graft.d7.driverMaxPairs", "0")
      try t("phash_dedup distributed")({
        val n = operators.Multimodal.phashDedupCore(imgs).count()
        require(n == driverRows,
          s"regime mismatch: driver=$driverRows distributed=$n")
        n
      })
      finally spark.conf.unset("spark.graft.d7.driverMaxPairs")
      // the incremental intake shape: fingerprints committed once,
      // a 1% batch hashed and matched against them
      val fpsPath = s"$scratch/fps.parquet"
      t("phash_index commit")({
        operators.Multimodal.phashFingerprints(imgs)
          .write.mode("overwrite").parquet(fpsPath)
        spark.read.parquet(fpsPath).count()
      })
      val batch = imgs.filter(col("doc_id") % 100 === 7)
        .select((col("doc_id") + 5000000000L).as("doc_id"), col("img"))
        .localCheckpoint(true)
      t("phash_match 1% batch")(operators.Multimodal
        .phashMatchCore(batch, spark.read.parquet(fpsPath)).count())
      t("phash_match warm")(operators.Multimodal
        .phashMatchCore(batch, spark.read.parquet(fpsPath)).count())
      // the video modality at the same scale: AVI render + container
      // walk + <= 64 sampled-frame decodes per clip + collapse
      t("m12_video_neardup cold")(operators.Multimodal
        .m12VideoNeardup(spark, dir).count())
      t("m12_video_neardup warm")(operators.Multimodal
        .m12VideoNeardup(spark, dir).count())
      // the incremental entries end-to-end (corpus render cached for
      // m10 after the cold pass; m11's WAV stage re-runs per call)
      t("m10_incremental cold")(operators.Multimodal
        .m10IncrementalPhash(spark, dir).count())
      t("m10_incremental warm")(operators.Multimodal
        .m10IncrementalPhash(spark, dir).count())
      t("m11_incremental_audio")(operators.Multimodal
        .m11IncrementalAudio(spark, dir).count())
      // m13 rides m12's cached signature pass — the warm wall is the
      // pure batch-vs-committed match cost on the video modality
      t("m13_incremental cold")(operators.Multimodal
        .m13IncrementalVideo(spark, dir).count())
      t("m13_incremental warm")(operators.Multimodal
        .m13IncrementalVideo(spark, dir).count())
    }
    spark.stop()
  }
}
