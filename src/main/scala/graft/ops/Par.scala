package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.plans.logical._

/** Parallelism seeding for per-row-heavy map stages over narrow sources.
  *
  * On a real corpus layout the scan arrives in many splits and `seed` is
  * a no-op (the guard). But an unsplittable small input — one parquet row
  * group, the shape of every small-SF test table — pins everything
  * upstream of the first shuffle into a single task: shingle expansion,
  * signature generation and hashing would all serialize, and a
  * `localCheckpoint` of that stream freezes the single-partition layout
  * into every downstream consumer. Rebalancing the raw doc/vector stream
  * BEFORE expansion is the cheapest point to buy the cluster's
  * parallelism: rows are smallest there, the exchange hashes on the
  * stable row key (deterministic layout), and downstream per-key
  * aggregations reuse the partitioning where Catalyst can prove it.
  *
  * The probe (`df.rdd.getNumPartitions`) only runs on SHUFFLE-FREE plans
  * (scans/projects/filters/unions): there it builds the RDD without
  * launching a job. On a join/aggregate/window-derived input, `.rdd`
  * under AQE would EXECUTE the upstream stages just to read a partition
  * count — and those inputs arrive shuffle-partitioned (≥ the configured
  * shuffle parallelism) anyway, so seeding has nothing to buy; `seed` is
  * an identity there.
  *
  * Deliberately NOT applied to map-only operators (PII redaction,
  * repetition signals, tokenize, quality metrics): their zero-shuffle
  * plan IS the scale contract — pinned by `ScalePatternsSpec` — and a
  * repartition there would trade a full corpus shuffle for parallelism a
  * real layout already has. Only operators that shuffle anyway (bands,
  * blocks, gram aggregations, candidate joins) seed their source.
  */
object Par {
  private def shuffleFree(plan: LogicalPlan): Boolean = !plan.exists {
    case _: Join | _: Aggregate | _: Window | _: Distinct | _: Deduplicate |
        _: RepartitionByExpression | _: Sort | _: GlobalLimit => true
    case r: Repartition => r.shuffle // coalesce (shuffle=false) stays probe-safe
    case _ => false
  }

  def seed(df: DataFrame, key: Column): DataFrame = {
    if (!shuffleFree(df.queryExecution.logical)) df
    else {
      val slots = df.sparkSession.sparkContext.defaultParallelism
      if (df.rdd.getNumPartitions >= slots) df
      else df.repartition(slots, key)
    }
  }
}
