package graft

import org.apache.spark.sql.functions._
import graft.ops.Relational

class RelationalSpec extends SparkSpec {

  test("pricingSummary groups all flag/status combos with exact sums") {
    val out = Relational.pricingSummary(Tables.lineitem(spark, sf)).collect()
    assert(out.nonEmpty && out.length <= 6)
    val total = out.map(_.getAs[Long]("count_order")).sum
    val expected = Tables.lineitem(spark, sf)
      .filter(col("l_shipdate") <= lit("2001-06-01").cast("timestamp")).count()
    assert(total == expected)
    out.foreach { r =>
      assert(math.abs(r.getAs[Double]("avg_qty") -
        r.getAs[Double]("sum_qty") / r.getAs[Long]("count_order")) < 1e-9)
    }
  }

  test("shippingPriority returns top-k ordered by revenue desc") {
    val rev = Relational.shippingPriority(Tables.customer(spark, sf),
      Tables.orders(spark, sf), Tables.lineitem(spark, sf))
      .collect().map(_.getAs[Double]("revenue"))
    assert(rev.length <= 10)
    assert(rev.sameElements(rev.sortBy(-_)), "not sorted desc")
  }

  test("running window sums are cumulative within supplier") {
    val rows = Relational.supplierRunningShipments(Tables.lineitem(spark, sf))
      .collect().groupBy(_.getAs[Long]("l_suppkey"))
    rows.values.foreach { rs =>
      val sorted = rs.sortBy(_.getAs[Int]("rn"))
      var acc = 0.0
      sorted.foreach { r =>
        acc += r.getAs[Double]("l_quantity")
        assert(math.abs(r.getAs[Double]("running_qty") - acc) < 1e-9)
      }
    }
  }

  test("anti and semi joins partition the urgent-order customer space") {
    val c = Tables.customer(spark, sf)
    val o = Tables.orders(spark, sf)
    val anti = Relational.customersWithoutOrders(c, o).count()
    val semi = Relational.customersWithUrgentOrders(c, o).count()
    assert(anti + semi == c.count())
  }

  test("rollup includes grand total row equal to table size") {
    val out = Relational.returnsRollup(Tables.lineitem(spark, sf)).collect()
    val grand = out.find(r => r.getAs[String]("returnflag") == "ALL" &&
      r.getAs[String]("linestatus") == "ALL").get
    assert(grand.getAs[Long]("n_rows") == Tables.lineitem(spark, sf).count())
  }

  test("order-count distribution partitions the customer space; dormant customers have no orders") {
    val c = Tables.customer(spark, sf)
    val o = Tables.orders(spark, sf)
    // Q13 shape: the histogram's custdist column sums to ALL customers
    // (zero-order customers included via the left join).
    val dist = Relational.orderCountDistribution(c, o).collect()
    assert(dist.map(_.getAs[Long]("custdist")).sum == c.count())
    // Q22 shape: every reported group only counts customers with no URGENT
    // orders and above-average balance — cross-check via recomputation.
    val out = Relational.globalSalesOpportunity(c, o).collect()
    val total = out.map(_.getAs[Long]("numcust")).sum
    val urgentCust = o.filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_custkey")).distinct()
    val recount = c.filter(col("c_nationkey").isin(1, 3, 5, 7, 9))
      .join(urgentCust, col("c_custkey") === col("o_custkey"), "left_anti").count()
    assert(total > 0 && total <= recount,
      "Q22 must be a non-empty subset of dormant eligible customers")
    // Q15 shape: every returned supplier carries the same (max) revenue.
    val top = Relational.topSupplierRevenue(Tables.supplier(spark, sf), Tables.lineitem(spark, sf))
      .collect()
    assert(top.nonEmpty && top.map(_.getAs[Double]("total_revenue")).distinct.length == 1)
  }

  test("Q8/Q9/Q16/Q20/Q21 shapes hold their invariants") {
    val (region, nation) = (Tables.region(spark, sf), Tables.nation(spark, sf))
    val (customer, supplier) = (Tables.customer(spark, sf), Tables.supplier(spark, sf))
    val (orders, lineitem, part) =
      (Tables.orders(spark, sf), Tables.lineitem(spark, sf), Tables.part(spark, sf))
    // Q8: one row per order year in range, share within [0, 1].
    val share = Relational.marketShare(region, nation, customer, orders, lineitem, supplier, part)
      .collect()
    assert(share.map(_.getAs[Long]("o_year")).toSet == Set(1997L, 1998L))
    share.foreach { r =>
      val s = r.getAs[Double]("mkt_share")
      assert(s >= 0.0 && s <= 1.0 && r.getAs[Double]("total_volume") > 0.0)
    }
    // Q9: profit strictly positive, (nation, year) unique.
    val profit = Relational.nationProfit(nation, orders, lineitem, supplier, part).collect()
    assert(profit.nonEmpty)
    assert(profit.map(r => (r.getString(0), r.getLong(1))).distinct.length == profit.length)
    profit.foreach(r => assert(r.getAs[Double]("profit") > 0.0))
    // Q16: counts positive and sorted descending.
    val counts = Relational.partSupplierCounts(part, lineitem, supplier)
      .collect().map(_.getAs[Long]("supplier_cnt"))
    assert(counts.nonEmpty && counts.forall(_ > 0) && counts.sameElements(counts.sortBy(-_)))
    // Q20: every returned supplier belongs to the filter nation.
    val nkey = nation.filter(col("n_name") === "NATION_3")
      .collect().head.getAs[Int]("n_nationkey")
    val excess = Relational.excessSupplySuppliers(nation, supplier, part, lineitem).collect()
    val nat3Supps = supplier.filter(col("s_nationkey") === nkey)
      .collect().map(_.getAs[Long]("s_suppkey")).toSet
    excess.foreach(r => assert(nat3Supps.contains(r.getAs[Long]("s_suppkey"))))
    // Q21: each waiting supplier was the SOLE late supplier on ≥1 multi-
    // supplier finalized order (numwait ≥ 1 by construction).
    val waiting = Relational.waitingSuppliers(nation, supplier, orders, lineitem).collect()
    waiting.foreach(r => assert(r.getAs[Long]("numwait") >= 1L))
    // Q2: each emitted (part, supplier) really achieves its part's minimum
    // offered unit cost; ranking is by balance descending.
    val q2 = Relational.minCostSupplier(region, nation, supplier, part, lineitem).collect()
    assert(q2.nonEmpty)
    val bals = q2.map(_.getAs[Double]("s_acctbal"))
    assert(bals.sameElements(bals.sortBy(-_)))
    // Q11: every share exceeds the threshold of the group total.
    val q11 = Relational.importantStock(nation, supplier, lineitem).collect()
    assert(q11.nonEmpty)
    val vals = q11.map(_.getAs[Double]("stock_value"))
    assert(vals.sameElements(vals.sortBy(-_)))
  }

  test("distributed exact quantile ≡ percentile bitwise on the high-cardinality column") {
    val li = Tables.lineitem(spark, sf)
    val qs = Seq(0.1, 0.25, 0.5, 0.9, 0.99)
    // l_extendedprice is ~distinct-per-row — exactly the column where
    // percentile's value→count buffer degenerates to O(rows) at scale.
    val dist = Relational.exactQuantilesDistributed(li, "l_returnflag", "l_extendedprice", qs)
      .collect().map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2)).toMap
    val viaPercentile = li.groupBy(col("l_returnflag"))
      .agg(expr(s"percentile(l_extendedprice, array(${qs.mkString(",")}))").as("ps"))
      .collect().flatMap { r =>
        r.getSeq[Double](1).zip(qs).map { case (p, q) => (r.getString(0), q) -> p }
      }.toMap
    assert(dist.keySet == viaPercentile.keySet)
    dist.foreach { case (k, vd) =>
      assert(java.lang.Double.doubleToLongBits(vd) ==
        java.lang.Double.doubleToLongBits(viaPercentile(k)),
        s"$k: distributed $vd != percentile ${viaPercentile(k)}")
    }
  }

  test("value-count quantile engine ≡ the raw-row engine bitwise (weights = pre-counts)") {
    val li = Tables.lineitem(spark, sf)
    val qs = Seq(0.1, 0.25, 0.5, 0.9, 0.99)
    // l_quantity repeats heavily — the case where the pre-counted table is
    // genuinely smaller than the raw rows and sum(cnt) ≠ count(1) would show.
    val stats = li.groupBy(col("l_returnflag")).agg(
      min(col("l_quantity").cast("double")).as("mn"),
      max(col("l_quantity").cast("double")).as("mx"),
      count(col("l_quantity")).as("n"))
    val raw = Relational.exactQuantilesWithStats(li, "l_returnflag", "l_quantity", qs, stats)
      .collect().map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2)).toMap
    val vc = li.groupBy(col("l_returnflag"), col("l_quantity").cast("double").as("v"))
      .agg(count(lit(1)).as("cnt"))
    val counted = Relational.exactQuantilesFromCounts(vc, "l_returnflag", "v", "cnt", qs, stats)
      .collect().map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2)).toMap
    assert(raw.keySet == counted.keySet && raw.nonEmpty)
    raw.foreach { case (k, v) =>
      assert(java.lang.Double.doubleToLongBits(v) ==
        java.lang.Double.doubleToLongBits(counted(k)), s"$k: raw $v != counted ${counted(k)}")
    }
  }

  test("distributed exact quantile handles degenerate and tiny groups") {
    import spark.implicits._
    // constant-valued group (zero histogram width), 1-row group, 2-row group
    val df = (Seq.fill(100)(("const", 7.5)) ++ Seq(("one", 3.0)) ++
      Seq(("two", 1.0), ("two", 2.0))).toDF("g", "x")
    val out = Relational.exactQuantilesDistributed(df, "g", "x", Seq(0.5))
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(out("const") == 7.5)
    assert(out("one") == 3.0)
    assert(out("two") == 1.5)
  }

  test("columnStats profiles nulls, exact ndv, extent, and quartiles per column") {
    import spark.implicits._
    val df = Seq(
      (Some(1.0), 10L), (Some(2.0), 10L), (Some(2.0), 20L),
      (None, 30L), (Some(4.0), 30L))
      .toDF("x", "k")
    val got = Relational.columnStats(df, Seq("x", "k")).collect()
      .map(r => r.getString(0) -> r).toMap
    val x = got("x")
    assert(x.getAs[Long]("n_rows") == 5L)
    assert(x.getAs[Long]("n_nulls") == 1L)
    assert(x.getAs[Long]("ndv") == 3L) // nulls excluded from ndv
    assert(x.getAs[Double]("min_val") == 1.0 && x.getAs[Double]("max_val") == 4.0)
    // percentile over the 4 non-null values [1,2,2,4]
    assert(x.getAs[Double]("p50") == 2.0)
    assert(x.getAs[Double]("p25") == 1.75)
    val k = got("k")
    assert(k.getAs[Long]("ndv") == 3L && k.getAs[Long]("n_nulls") == 0L)
    assert(k.getAs[Double]("p50") == 20.0)
  }

  test("revenue concentration: ranks dense, shares positive, cumulative share monotone and consistent") {
    val r = Relational.revenueConcentration(
      Tables.orders(spark, sf), Tables.lineitem(spark, sf)).collect()
    assert(r.map(_.getAs[Long]("rank")).toSeq == (1L to r.length))
    val shares = r.map(_.getAs[Double]("revenue_share"))
    assert(shares.forall(_ > 0) && shares.sameElements(shares.sortBy(-_)),
      "shares must be positive and ordered with the revenue ranking")
    val cums = r.map(_.getAs[Double]("cum_share"))
    assert(cums.zip(cums.tail).forall { case (a, b) => b >= a }, "cum_share must be monotone")
    assert(math.abs(cums.last - shares.sum) < 1e-12 && cums.last <= 1.0)
  }

  test("rankCorrelation: bucketed tied-average ranks ≡ brute reference on skewed random data") {
    import spark.implicits._
    // Heavy ties (values mod 7 / mod 5) + two groups; tiny nBuckets forces
    // real multi-bucket offsets, so the bucketed path itself is exercised.
    // Bucket-count sweep: 1 (everything in one bucket — offsets degenerate),
    // 2 and 7 (real multi-bucket offset paths), 4096 (more buckets than
    // distinct values). Negative values exercise the extent shift.
    val rng = new scala.util.Random(42)
    val rows = (0 until 120).map { i =>
      (if (i % 2 == 0) "g0" else "g1", (rng.nextInt(100) % 7).toLong - 3L,
        (rng.nextInt(100) % 5).toLong)
    }
    def rank2(vs: Seq[Long]): Seq[Long] =
      vs.map(v => 2L * vs.count(_ < v) + vs.count(_ == v) + 1L)
    for (nb <- Seq(1, 2, 7, 4096)) {
      val got = Relational.rankCorrelation(rows.toDF("g", "a", "b"), "g", "a", "b", nBuckets = nb)
        .collect().map(r => r.getString(0) ->
          ((r.getLong(1), r.getDecimal(2).toBigInteger, r.getDecimal(3).toBigInteger,
            r.getDecimal(4).toBigInteger, r.getDouble(5)))).toMap
      rows.groupBy(_._1).foreach { case (g, rs) =>
        val (ra, rb) = (rank2(rs.map(_._2)), rank2(rs.map(_._3)))
        val n = rs.size.toLong
        val sab = ra.zip(rb).map { case (x, y) => BigInt(x) * y }.sum
        val saa = ra.map(x => BigInt(x) * x).sum
        val sbb = rb.map(x => BigInt(x) * x).sum
        val (gn, gab, gaa, gbb, grho) = got(g)
        assert((gn, BigInt(gab), BigInt(gaa), BigInt(gbb)) == ((n, sab, saa, sbb)),
          s"group $g exact rank sums at nBuckets=$nb")
        val nD = n.toDouble; val srD = nD * (nD + 1.0)
        val num = nD * sab.toDouble - srD * srD
        val den = math.sqrt(nD * saa.toDouble - srD * srD) *
          math.sqrt(nD * sbb.toDouble - srD * srD)
        assert(math.abs(grho - num / den) < 1e-12, s"group $g rho at nBuckets=$nb")
      }
    }
  }

  test("rankCorrelation endpoints: monotone pair → ρ ≈ 1, reversed → ρ ≈ −1, constant signal → NULL") {
    import spark.implicits._
    val mono = (1 to 50).map(i => ("g", i.toLong, (i * 3 + 7).toLong)).toDF("g", "a", "b")
    val up = Relational.rankCorrelation(mono, "g", "a", "b").collect().head.getDouble(5)
    assert(math.abs(up - 1.0) < 1e-12)
    val rev = (1 to 50).map(i => ("g", i.toLong, (1000 - i).toLong)).toDF("g", "a", "b")
    val dn = Relational.rankCorrelation(rev, "g", "a", "b").collect().head.getDouble(5)
    assert(math.abs(dn + 1.0) < 1e-12)
    val const = (1 to 50).map(i => ("g", i.toLong, 9L)).toDF("g", "a", "b")
    val r = Relational.rankCorrelation(const, "g", "a", "b").collect().head
    assert(r.isNullAt(5), "zero-variance signal must yield NULL rho")
  }

  test("rankCorrelationPpm fails loud past the DECIMAL-exactness bound instead of nulling") {
    import spark.implicits._
    // 7100 > the n≈7000 bound where num²·10⁶ exceeds DECIMAL(38,0). Under
    // non-ANSI Spark the overflow would NULL silently — and NULL is the
    // zero-variance encoding, so a perfectly correlated big group would
    // misreport as "nothing to correlate". The raise_error guard must
    // throw regardless of the engine's overflow mode.
    val big = (1 to 7100).map(i => ("g", i.toLong, (i * 2).toLong)).toDF("g", "a", "b")
    val ex = intercept[Exception] {
      Relational.rankCorrelationPpm(big, "g", "a", "b").collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ messages(e.getCause))
    assert(messages(ex).exists(_.contains("rankCorrelationPpm")),
      s"expected the explicit exactness-bound error, got: $ex")
  }

  test("rankCorrelationPpm: integer emission equals BigInt floor arithmetic over brute rank sums") {
    import spark.implicits._
    val rng = new scala.util.Random(7)
    val rows = (0 until 90).map { i =>
      (if (i % 2 == 0) "g0" else "g1", (rng.nextInt(40) % 6).toLong,
        (rng.nextInt(40) % 4).toLong)
    } ++ (1 to 20).map(i => ("gconst", i.toLong, 5L)) // zero-variance group
    def rank2(vs: Seq[Long]): Seq[Long] =
      vs.map(v => 2L * vs.count(_ < v) + vs.count(_ == v) + 1L)
    val got = Relational.rankCorrelationPpm(rows.toDF("g", "a", "b"), "g", "a", "b")
      .collect().map(r => r.getString(0) -> r).toMap
    rows.groupBy(_._1).foreach { case (g, rs) =>
      val (ra, rb) = (rank2(rs.map(_._2)), rank2(rs.map(_._3)))
      val n = BigInt(rs.size)
      val sab = ra.zip(rb).map { case (x, y) => BigInt(x) * y }.sum
      val saa = ra.map(x => BigInt(x) * x).sum
      val sbb = rb.map(x => BigInt(x) * x).sum
      val srd = n * (n + 1)
      val (num, denA, denB) = (n * sab - srd * srd, n * saa - srd * srd, n * sbb - srd * srd)
      val row = got(g)
      if (denA > 0 && denB > 0) {
        // BigInt / truncates toward zero ≡ floor here (operands non-negative)
        assert(row.getAs[Long]("corr_sign") == num.signum.toLong, s"group $g sign")
        assert(BigInt(row.getAs[Long]("rho2_ppm")) == num * num * 1000000 / (denA * denB),
          s"group $g rho2_ppm")
        // and the ppm form is consistent with the spec-pinned double ρ:
        // ρ² rounds to rho2_ppm within one ulp of the floor division
        val rho = (n * sab - srd * srd).toDouble /
          (math.sqrt((n * saa - srd * srd).toDouble) * math.sqrt((n * sbb - srd * srd).toDouble))
        assert(math.abs(rho * rho * 1e6 - row.getAs[Long]("rho2_ppm").toDouble) <= 1.0,
          s"group $g ppm ≈ ρ²·10⁶")
      } else {
        assert(row.isNullAt(row.fieldIndex("corr_sign")), s"group $g degenerate sign NULL")
        assert(row.isNullAt(row.fieldIndex("rho2_ppm")), s"group $g degenerate ppm NULL")
      }
    }
  }

  test("rankCorrelationPpm: every emitted column is int64 or string (hash-surface pin)") {
    import spark.implicits._
    import org.apache.spark.sql.types.{LongType, StringType}
    // r10/r11 lesson: a value-equal DECIMAL output column still hash-reds
    // across the oracle driver's readers. The registered surface must be
    // int64/utf8 only — the rank sums cast to BIGINT at the projection.
    val d = Seq(("g", 1L, 2L), ("g", 2L, 4L), ("g", 3L, 5L)).toDF("g", "a", "b")
    val schema = Relational.rankCorrelationPpm(d, "g", "a", "b").schema
    schema.fields.foreach { f =>
      assert(f.dataType == LongType || f.dataType == StringType,
        s"column ${f.name} has non-int64/utf8 type ${f.dataType}")
    }
    assert(schema.fieldNames.toSet ==
      Set("g", "n", "s_ab", "s_aa", "s_bb", "corr_sign", "rho2_ppm"))
  }

  test("percentileRanks: exact ppm arithmetic, boundary ties move together, nulls drop") {
    import spark.implicits._
    // values [10, 20, 20, 30] in one group: avg ranks 1 / 2.5 / 2.5 / 4 →
    // pct_ppm 250000 / 625000 / 625000 / 1000000.
    val d = Seq(("g", 1L, Some(10L)), ("g", 2L, Some(20L)), ("g", 3L, Some(20L)),
      ("g", 4L, Some(30L)), ("g", 5L, None)).toDF("g", "id", "v")
    val got = Relational.percentileRanks(d, "g", "v").collect()
      .map(r => r.getAs[Long]("id") -> ((r.getAs[Long]("pct_ppm"), r.getAs[Boolean]("keep"))))
      .toMap
    assert(got == Map(1L -> ((250000L, false)), 2L -> ((625000L, false)),
      3L -> ((625000L, false)), 4L -> ((1000000L, true))), got.toString)
    assert(!got.contains(5L), "null signal must drop, never occupy a rank")
    // A cut landing ON the tie: both tied rows cross together.
    val wide = Relational.percentileRanks(d, "g", "v", keepTopPpm = 500000L)
      .filter(col("keep")).collect().map(_.getAs[Long]("id")).sorted
    assert(wide.sameElements(Array(2L, 3L, 4L)), "tied pair enters the gate together")
  }

  test("regression moments agree with built-in corr/regr within float tolerance and exactly on a fixture") {
    val li = Tables.lineitem(spark, sf)
    val r = Relational.regressionMoments(li, "l_quantity", "l_extendedprice")
      .collect().head
    val builtin = li.agg(corr(col("l_quantity"), col("l_extendedprice"))).head.getDouble(0)
    assert(math.abs(r.getAs[Double]("corr") - builtin) < 1e-9,
      s"decimal-exact corr ${r.getAs[Double]("corr")} vs built-in $builtin")
    // exact fixture: y = 2x + 1 → slope 2, intercept 1, corr 1
    import spark.implicits._
    val d = Seq((1.0, 3.0), (2.0, 5.0), (3.0, 7.0), (4.0, 9.0)).toDF("x", "y")
    val f = Relational.regressionMoments(d, "x", "y").collect().head
    assert(f.getAs[Double]("slope") == 2.0 && f.getAs[Double]("intercept") == 1.0)
    assert(f.getAs[Double]("corr") == 1.0)
  }
}
