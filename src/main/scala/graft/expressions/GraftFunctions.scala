package graft.expressions

import org.apache.spark.sql.{Column, GraftSqlBridge, SparkSession}

/** Column/SQL bindings for graft's native Catalyst expressions. */
object GraftFunctions {

  /** Native codegen'd dot product (see [[DotProduct]]). */
  def graftDot(a: Column, b: Column): Column =
    GraftSqlBridge.column(
      DotProduct(GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))

  /** One-pass k-minhash signature of a shingle array (see [[MinHashSignature]]). */
  def graftMinHash(shingles: Column, numHashes: Int): Column =
    GraftSqlBridge.column(
      MinHashSignature(GraftSqlBridge.expression(shingles), numHashes))

  /** One-pass 64-bit SimHash of a token array (see [[SimHash64]]). */
  def graftSimHash(tokens: Column): Column =
    GraftSqlBridge.column(SimHash64(GraftSqlBridge.expression(tokens)))

  /** 62-bit SimHash with the explicit SQL-reproducible token hash
    * (see [[SimHashExplicit62]]). */
  def graftSimHash62(tokens: Column): Column =
    GraftSqlBridge.column(SimHashExplicit62(GraftSqlBridge.expression(tokens)))

  /** Distinct word n-grams of a token array (see [[WordNGrams]]). */
  def graftNGrams(tokens: Column, n: Int): Column =
    GraftSqlBridge.column(WordNGrams(GraftSqlBridge.expression(tokens), n))

  /** Most-frequent-n-gram fraction (see [[TopNGramFrac]]). */
  def graftTopNGramFrac(tokens: Column, n: Int): Column =
    GraftSqlBridge.column(TopNGramFrac(GraftSqlBridge.expression(tokens), n))

  /** Banded random-hyperplane LSH signature (see [[HyperplaneBands]]). */
  def graftHyperplaneBands(vec: Column, numPlanes: Int, bands: Int): Column =
    GraftSqlBridge.column(
      HyperplaneBands(GraftSqlBridge.expression(vec), numPlanes, bands))

  /** One-pass multi-profile stopword ratios (see [[StopwordRatios]]). */
  def graftStopRatios(tokens: Column, profiles: Seq[Seq[String]]): Column =
    GraftSqlBridge.column(
      StopwordRatios(GraftSqlBridge.expression(tokens), profiles))

  /** Expose the expressions to SQL in this session. */
  def register(spark: SparkSession): Unit = {
    GraftSqlBridge.registerFunction(spark, "graft_dot",
      exprs => DotProduct(exprs.head, exprs(1)))
    GraftSqlBridge.registerFunction(spark, "graft_simhash",
      exprs => SimHash64(exprs.head))
  }
}
