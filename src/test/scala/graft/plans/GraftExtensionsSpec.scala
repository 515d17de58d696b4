package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.{GraftSqlShim, SparkSession}
import org.apache.spark.sql.functions._

/** The `spark.sql.extensions=graft.plans.GraftExtensions` route must
  * expose the whole library surface — every native function and the
  * as-of planner strategy — on a session this library did not build,
  * with no `NativeFns.register` / `AsOf.register` calls.
  */
class GraftExtensionsSpec extends SparkSpec {

  test("withExtensions session resolves native fns and plans as-of") {
    val base = spark // materialize the shared context first
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    // new session (same SparkContext), extensions applied at build time
    val ext = SparkSession.builder()
      .master("local[4]")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    try {
      assert(ext ne base)

      // native scalar + aggregate functions resolve via SQL text alone
      val d = ext.sql(
        "SELECT graft_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d")
        .head().getDouble(0)
      assert(d == 11.0)
      val kmv = ext.sql(
        """SELECT graft_bottomk_distinct(v, v * 7 % 101, 8) AS s
          |FROM VALUES (1L),(1L),(2L),(2L),(3L) AS t(v)""".stripMargin)
        .head().getSeq[Long](0)
      assert(kmv.toSet == Set(1L, 2L, 3L))

      // the as-of logical node plans through the INJECTED strategy:
      // this session's experimental.extraStrategies stays empty
      import ext.implicits._
      val l = Seq((1L, 10L, 100L), (2L, 10L, 205L)).toDF("event_id", "k", "t")
      val r = Seq((101L, 10L, 90L), (104L, 10L, 200L)).toDF("order_id", "rk", "ot")
      def attr(df: org.apache.spark.sql.DataFrame, n: String) =
        df.queryExecution.analyzed.output.find(_.name == n).get
      val node = AsOfJoinNode(
        l.queryExecution.analyzed, r.queryExecution.analyzed,
        attr(l, "k"), attr(r, "rk"), attr(l, "t"), attr(r, "ot"),
        Seq(attr(r, "order_id")))
      assert(ext.experimental.extraStrategies.isEmpty)
      val res = GraftSqlShim.ofRows(ext, node)
        .select(col("event_id"), col("order_id"))
        .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
      assert(res == Map(1L -> 101L, 2L -> 104L))
    } finally {
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
      // do NOT ext.stop(): it would stop the shared SparkContext
    }
  }

  // NOTE: the `spark.sql.extensions=<class>` config route is NOT
  // testable here — it is a STATIC SQL conf read from the SparkContext
  // at session build, and the suite's context predates it. Both routes
  // funnel through the same applyExtensions(GraftExtensions) call the
  // test above exercises.
}
