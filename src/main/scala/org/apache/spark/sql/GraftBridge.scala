package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into Spark's package-private classic Column↔Expression
  * converters (Spark 4 wraps Columns in ColumnNodes; custom Catalyst
  * expressions need the classic bridge to surface as Columns).
  */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  def logicalPlan(df: DataFrame): org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    df.queryExecution.analyzed

  def ofRows(spark: SparkSession,
             plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Every InMemoryRelation cache builder currently registered in the
    * session's CacheManager — reflective read of the private `cachedData`
    * list (verified against the shipped Spark 4.1.2 field; the single
    * reflective access point, so a Spark upgrade has exactly one place to
    * break). CachedRDDBuilder is private[sql], hence this lives in the
    * bridge package.
    */
  private def cacheBuilders(spark: SparkSession)
      : Seq[org.apache.spark.sql.execution.columnar.CachedRDDBuilder] = {
    val cm = spark.asInstanceOf[classic.SparkSession].sharedState.cacheManager
    val f = classOf[org.apache.spark.sql.execution.CacheManager]
      .getDeclaredField("cachedData")
    f.setAccessible(true)
    f.get(cm)
      .asInstanceOf[scala.collection.immutable.IndexedSeq[
        org.apache.spark.sql.execution.CachedData]]
      .map(_.cachedRepresentation.cacheBuilder)
  }

  /** [[cacheBuilders]] restricted to builders whose column buffers are
    * already materialized. The bench snapshots which builders are ALREADY
    * materialized before a timed plan is constructed, so pins the plan's
    * own construction fills (Lloyd-trained codebooks, PCA power steps —
    * their driver-side collects materialize the corpus pin
    * mid-construction) are distinguishable from warm caches an earlier
    * run left behind.
    */
  def materializedCacheBuilders(spark: SparkSession): Seq[AnyRef] =
    cacheBuilders(spark).filter(_.isCachedColumnBuffersLoaded)

  /** Invalidate (and lazily re-materialize) every plan-equality cache
    * entry whose relations read files under `path` — the CacheManager's
    * own refresh hook, wrapped here because the classic-session cast is
    * package-private. Caches.evictArtifacts uses it so a regenerated
    * data dir invalidates cached frames the artifact registry never knew
    * about.
    */
  def recacheByPath(spark: SparkSession, path: String): Unit =
    spark.asInstanceOf[classic.SparkSession].sharedState.cacheManager
      .recacheByPath(spark.asInstanceOf[classic.SparkSession], path)

  /** The PREPARED physical plan with AQE unwrapped: executedPlan after
    * EnsureRequirements (exchanges/sorts present — `sparkPlan` predates
    * them), descending into AdaptiveSparkPlanExec's initialPlan (the
    * statically-planned tree AQE starts from; `initialPlan` is
    * private[sql], hence this lives in the bridge package). The static
    * lints (PlanAudit) read this: it is the plan that ships to an
    * arbitrary cluster before any runtime re-plan.
    */
  def preparedPlan(df: DataFrame)
      : org.apache.spark.sql.execution.SparkPlan =
    df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.initialPlan
      case p => p
    }
}
