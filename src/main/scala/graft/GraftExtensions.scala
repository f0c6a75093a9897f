package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

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
  }
}
