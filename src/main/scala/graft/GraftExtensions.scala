package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.LongType

import graft.expressions._

/** SparkSessionExtensions entry point: registers the graft native kernels
  * as SQL functions, so `spark.sql("SELECT graft_cosine(a, b) ...")` works
  * for SQL-first users and the library's Column API shares one
  * implementation with the SQL surface.
  *
  * Activate with:
  *   .config("spark.sql.extensions", "graft.GraftExtensions")
  * or programmatically via `withExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def intArg(e: Expression, name: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$name must be an integer literal, got $other")
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    // Catalyst Rule tier: top-one-per-key windows become min_by/max_by hash
    // aggregates (no per-partition sort) — see TopOneWindowToMinMaxBy.
    ext.injectOptimizerRule(_ => graft.plans.TopOneWindowToMinMaxBy)

    ext.injectFunction((
      new FunctionIdentifier("graft_cosine"),
      new ExpressionInfo(classOf[CosineSim].getName, "graft_cosine"),
      (args: Seq[Expression]) => CosineSim(args(0), args(1))))

    ext.injectFunction((
      new FunctionIdentifier("graft_minhash"),
      new ExpressionInfo(classOf[MinHashSig].getName, "graft_minhash"),
      (args: Seq[Expression]) => MinHashSig(args(0), intArg(args(1), "numPerm"))))

    ext.injectFunction((
      new FunctionIdentifier("graft_shingle_hashes"),
      new ExpressionInfo(classOf[ShingleHashes].getName, "graft_shingle_hashes"),
      (args: Seq[Expression]) =>
        ShingleHashes(args(0), intArg(args(1), "n"),
          word = args.length < 3 || intArg(args(2), "word") != 0)))

    // Math.log (glibc-bit-identical), NOT Spark ln's StrictMath.log — see
    // the MathLn scaladoc; required by any ln-carrying hash-gated lane
    ext.injectFunction((
      new FunctionIdentifier("graft_ln"),
      new ExpressionInfo(classOf[MathLn].getName, "graft_ln"),
      (args: Seq[Expression]) => MathLn(args(0))))

    ext.injectFunction((
      new FunctionIdentifier("graft_simhash16"),
      new ExpressionInfo(classOf[SimHash16].getName, "graft_simhash16"),
      (args: Seq[Expression]) => SimHash16(args(0))))

    ext.injectFunction((
      new FunctionIdentifier("graft_sorted_intersect"),
      new ExpressionInfo(classOf[SortedIntersectCount].getName, "graft_sorted_intersect"),
      (args: Seq[Expression]) => SortedIntersectCount(args(0), args(1))))

    ext.injectFunction((
      new FunctionIdentifier("graft_chunk_bounds"),
      new ExpressionInfo(classOf[ChunkBoundaries].getName, "graft_chunk_bounds"),
      (args: Seq[Expression]) =>
        ChunkBoundaries(args(0), intArg(args(1), "w"), intArg(args(2), "modulus"))))

    ext.injectFunction((
      new FunctionIdentifier("graft_nfc"),
      new ExpressionInfo(classOf[NfcNormalize].getName, "graft_nfc"),
      (args: Seq[Expression]) => NfcNormalize(args(0))))

    ext.injectFunction((
      new FunctionIdentifier("graft_deflate_size"),
      new ExpressionInfo(classOf[DeflateSize].getName, "graft_deflate_size"),
      (args: Seq[Expression]) =>
        DeflateSize(args(0), if (args.length > 1) intArg(args(1), "level") else 6)))

    ext.injectFunction((
      new FunctionIdentifier("graft_hll_distinct"),
      new ExpressionInfo(classOf[HllDistinct].getName, "graft_hll_distinct"),
      (args: Seq[Expression]) =>
        HllDistinct(args(0), if (args.length > 1) intArg(args(1), "p") else 12)))

    ext.injectFunction((
      new FunctionIdentifier("graft_bloom_build"),
      new ExpressionInfo(classOf[BloomBuild].getName, "graft_bloom_build"),
      (args: Seq[Expression]) =>
        BloomBuild(args(0), intArg(args(1), "numBits"), intArg(args(2), "numHashes"))))

    ext.injectFunction((
      new FunctionIdentifier("graft_bloom_merge"),
      new ExpressionInfo(classOf[BloomMerge].getName, "graft_bloom_merge"),
      (args: Seq[Expression]) => BloomMerge(args(0))))

    ext.injectFunction((
      new FunctionIdentifier("graft_bloom_might_contain"),
      new ExpressionInfo(classOf[BloomMightContain].getName, "graft_bloom_might_contain"),
      (args: Seq[Expression]) => BloomMightContain(args(0), args(1))))

    ext.injectFunction((
      new FunctionIdentifier("graft_count_min"),
      new ExpressionInfo(classOf[CountMinBuild].getName, "graft_count_min"),
      (args: Seq[Expression]) =>
        CountMinBuild(args(0), intArg(args(1), "depth"), intArg(args(2), "width"))))

    ext.injectFunction((
      new FunctionIdentifier("graft_count_min_estimate"),
      new ExpressionInfo(classOf[CountMinQuery].getName, "graft_count_min_estimate"),
      (args: Seq[Expression]) => CountMinQuery(args(0), args(1))))

    ext.injectFunction((
      new FunctionIdentifier("graft_count_min_merge"),
      new ExpressionInfo(classOf[CountMinMerge].getName, "graft_count_min_merge"),
      (args: Seq[Expression]) => CountMinMerge(args(0))))

    ext.injectFunction((
      new FunctionIdentifier("graft_hilbert"),
      new ExpressionInfo(classOf[HilbertIndex].getName, "graft_hilbert"),
      (args: Seq[Expression]) => HilbertIndex(args(0), args(1))))

    // r10 kernels: join-size estimation, PCA sufficient statistic, PQ ADC
    ext.injectFunction((
      new FunctionIdentifier("graft_count_min_inner"),
      new ExpressionInfo(classOf[CountMinInner].getName, "graft_count_min_inner"),
      (args: Seq[Expression]) => CountMinInner(args(0), args(1))))

    ext.injectFunction((
      new FunctionIdentifier("graft_gram"),
      new ExpressionInfo(classOf[GramBuild].getName, "graft_gram"),
      (args: Seq[Expression]) => GramBuild(args(0), intArg(args(1), "dim"),
        intArg(args(2), "scale").toLong)))

    ext.injectFunction((
      new FunctionIdentifier("graft_pq_adc"),
      new ExpressionInfo(classOf[PqAdc].getName, "graft_pq_adc"),
      (args: Seq[Expression]) => PqAdc(args(0), args(1), intArg(args(2), "ks"))))

    // r11 kernels: exact distinct-value bitmaps
    ext.injectFunction((
      new FunctionIdentifier("graft_bitmap"),
      new ExpressionInfo(classOf[BitmapBytes].getName, "graft_bitmap"),
      // Cast to LONG like the Scala API (Bitmap.sketch) — without it an INT
      // or string column from SQL would ClassCastException at runtime.
      (args: Seq[Expression]) => BitmapBytes(Cast(args(0), LongType))))

    ext.injectFunction((
      new FunctionIdentifier("graft_bitmap_merge"),
      new ExpressionInfo(classOf[BitmapMergeAgg].getName, "graft_bitmap_merge"),
      (args: Seq[Expression]) => BitmapMergeAgg(args(0))))

    ext.injectFunction((
      new FunctionIdentifier("graft_bitmap_count"),
      new ExpressionInfo(classOf[BitmapCount].getName, "graft_bitmap_count"),
      (args: Seq[Expression]) => BitmapCount(args(0))))

    ext.injectFunction((
      new FunctionIdentifier("graft_bitmap_and_count"),
      new ExpressionInfo(classOf[BitmapAndCount].getName, "graft_bitmap_and_count"),
      (args: Seq[Expression]) => BitmapAndCount(args(0), args(1))))

    // r12 kernels: canonical mergeable rank/quantile sample
    ext.injectFunction((
      new FunctionIdentifier("graft_rank_sample"),
      new ExpressionInfo(classOf[RankSampleAgg].getName, "graft_rank_sample"),
      (args: Seq[Expression]) => RankSampleAgg(
        Cast(args(0), LongType), Cast(args(1), LongType), intArg(args(2), "k"))))

    ext.injectFunction((
      new FunctionIdentifier("graft_rank_sample_merge"),
      new ExpressionInfo(classOf[RankSampleMergeAgg].getName, "graft_rank_sample_merge"),
      (args: Seq[Expression]) => RankSampleMergeAgg(args(0), intArg(args(1), "k"))))

    ext.injectFunction((
      new FunctionIdentifier("graft_rank_sample_quantile"),
      new ExpressionInfo(classOf[RankSampleQuantile].getName, "graft_rank_sample_quantile"),
      (args: Seq[Expression]) => RankSampleQuantile(args(0), intArg(args(1), "q_pct"))))

    ext.injectFunction((
      new FunctionIdentifier("graft_rank_sample_count"),
      new ExpressionInfo(classOf[RankSampleCount].getName, "graft_rank_sample_count"),
      (args: Seq[Expression]) => RankSampleCount(args(0))))
  }
}
