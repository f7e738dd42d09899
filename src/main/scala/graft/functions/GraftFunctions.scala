package graft.functions

import org.apache.spark.sql.SparkSession

/** SQL registration for the engine's custom expressions, so `spark.sql`
  * users get the same operators as the DataFrame API:
  *
  *   SELECT vec_l2sq(a.embedding, b.embedding) FROM ...
  *   SELECT feature_hash_embed(text, 64) FROM documents
  *
  * Registered per-session (temp functions); a SparkSessionExtensions
  * variant would inject the same builders at session build for cluster
  * deployments.
  */
object GraftFunctions {
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("vec_dot",
      exprs => FloatVecDot(exprs(0), exprs(1)), "scala_udf")
    reg.createOrReplaceTempFunction("vec_l2sq",
      exprs => FloatVecL2Sq(exprs(0), exprs(1)), "scala_udf")
    reg.createOrReplaceTempFunction("feature_hash_embed",
      exprs => graft.vector.FeatureHashEmbed(exprs(0),
        exprs(1).eval().asInstanceOf[Int]), "scala_udf")
  }
}
