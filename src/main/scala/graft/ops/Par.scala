package graft.ops

import org.apache.spark.sql.{Column, DataFrame}

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
  * Deliberately NOT applied to map-only operators (PII redaction,
  * repetition signals, tokenize, quality metrics): their zero-shuffle
  * plan IS the scale contract — pinned by `ScalePatternsSpec` — and a
  * repartition there would trade a full corpus shuffle for parallelism a
  * real layout already has. Only operators that shuffle anyway (bands,
  * blocks, gram aggregations, candidate joins) seed their source.
  */
object Par {
  def seed(df: DataFrame, key: Column): DataFrame = {
    val slots = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions >= slots) df
    else df.repartition(slots, key)
  }
}
