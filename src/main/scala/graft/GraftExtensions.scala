package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{DamerauLevenshtein, DotProduct, GraftFunctions, MisraGriesAgg, NfcNormalize, SortedIntersectCount, TopKAgg}

/** `spark.sql.extensions` entry point: a deployment that cannot call
  * [[graft.functions.GraftFunctions.register]] programmatically (e.g. a
  * shared Thrift/Connect server, spark-submit with --conf only) injects
  * the native expressions at session build instead:
  *
  * {{{
  *   spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
  * }}}
  *
  * Injection happens once per session at construction, so `spark.sql(
  * "SELECT graft_dot(a, b)")` works without any library call — the same
  * codegen'd expressions the DataFrame API paths use.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      GraftFunctions.binaryBuilder("graft_dot", DotProduct(_, _))))
    ext.injectFunction((
      FunctionIdentifier("graft_isect"),
      new ExpressionInfo(classOf[SortedIntersectCount].getName, "graft_isect"),
      GraftFunctions.binaryBuilder("graft_isect", SortedIntersectCount(_, _))))
    ext.injectFunction((
      FunctionIdentifier("graft_heavy_hitters"),
      new ExpressionInfo(classOf[MisraGriesAgg].getName, "graft_heavy_hitters"),
      GraftFunctions.binaryBuilder("graft_heavy_hitters", (c, k) =>
        MisraGriesAgg(c,
          GraftFunctions.literalCapacity("graft_heavy_hitters", k)))))
    ext.injectFunction((
      FunctionIdentifier("graft_heavy_hitters_w"),
      new ExpressionInfo(classOf[MisraGriesAgg].getName, "graft_heavy_hitters_w"),
      GraftFunctions.heavyHittersWeightedBuilder))
    ext.injectFunction((
      FunctionIdentifier("graft_topk"),
      new ExpressionInfo(classOf[TopKAgg].getName, "graft_topk"),
      GraftFunctions.topKBuilder))
    ext.injectFunction((
      FunctionIdentifier("graft_nfc"),
      new ExpressionInfo(classOf[NfcNormalize].getName, "graft_nfc"),
      GraftFunctions.unaryBuilder("graft_nfc", NfcNormalize(_))))
    ext.injectFunction((
      FunctionIdentifier("graft_dl"),
      new ExpressionInfo(classOf[DamerauLevenshtein].getName, "graft_dl"),
      GraftFunctions.binaryBuilder("graft_dl", DamerauLevenshtein(_, _))))
  }
}
