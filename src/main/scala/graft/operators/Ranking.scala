package graft.operators

import graft.functions.TopKAggregate
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact global ordering at scale.
  *
  * `row_number() OVER (PARTITION BY g ORDER BY …)` moves every row of
  * a group into ONE task — fine when groups are bounded by
  * construction (IVF cells, per-doc windows, per-shard permutations,
  * as used across this library), fatal when a group is "all of one
  * crawl source": a 30 TB window partition lands on a single executor.
  * The operators here compute the SAME exact ranks from a range
  * repartition plus a per-(partition, group) offset table — every
  * window partition is bounded by the range-partition width, and the
  * only small state is (partitions × groups) row counts: metadata,
  * the same class of bookkeeping AQE itself collects per shuffle.
  */
object Ranking {

  /** Exact 1-based rank of every row within its `groupCol` group,
    * ordered lexicographically by `orderCols`. Append a per-group
    * unique tiebreaker as the last order column — the rank is then a
    * total order and the result is deterministic under any
    * partitioning.
    *
    * How: range-repartition by (group, order…) — partition i's keys
    * precede partition i+1's, so a group spans a CONTIGUOUS run of
    * partitions — then stamp each row with its partition id and
    * lineage-truncate ([[Dedup.truncate]]), which freezes (data, pid)
    * together. The pid must be data, not recomputed: a later
    * `spark_partition_id()` or `TaskContext` read evaluates in
    * whatever stage the plan fuses it into (a downstream
    * `coalesce(1)` would collapse every row to pid 0), and the two
    * consumers below must agree on it. A per-group running sum over
    * the (pid, group) census gives each (pid, group) its global
    * offset; rank = offset + row_number within the (pid, group)
    * window. That window is bounded by the range-partition width —
    * no group ever concentrates on one task, which is the point.
    *
    * Cost: the one wide exchange any global sort pays, plus a narrow
    * (pid, group)-keyed window shuffle and a broadcast of the
    * metadata-sized offset table.
    *
    * NULLs in `orderCols` rank FIRST (Spark's ascending default;
    * DuckDB's default is NULLS LAST) — callers needing
    * engine-neutral semantics over nullable values should filter or
    * coalesce them first, as [[groupQuantiles]] does.
    *
    * `numPartitions` defaults to the session shuffle parallelism.
    * Output: the input columns + `rank` (long). */
  def groupRank(
      df: DataFrame,
      groupCol: String,
      orderCols: Seq[String],
      numPartitions: Int = 0): DataFrame =
    prefixAgg(df, groupCol, orderCols, lit(1L), "rank", numPartitions)

  /** The shared scaffold behind [[groupRank]] and [[groupRunningSum]]:
    * exact per-group inclusive prefix sum of `value` in `orderCols`
    * order (rank IS the value ≡ 1 case). Range-repartition by
    * (group, order…), pin (data, pid) together, census the
    * per-(pid, group) SUBTOTALS, broadcast-join each row its
    * earlier-pids offset, and finish with a window bounded by the
    * range-partition width. The pid must be data, not recomputed: a
    * later `spark_partition_id()` evaluates in whatever stage the
    * plan fuses it into, and the census and the per-row window must
    * agree on it. */
  private def prefixAgg(
      df: DataFrame,
      groupCol: String,
      orderCols: Seq[String],
      value: Column,
      outName: String,
      numPartitions: Int): DataFrame =
    prefixAggMulti(df, groupCol, orderCols, Seq(value -> outName),
      numPartitions)

  /** [[prefixAgg]] over SEVERAL measures in one pass — one range
    * exchange, one census, one bounded window, however many prefix
    * sums ride it. The single-measure form is the `values.size == 1`
    * case; callers needing k simultaneous prefixes (a count AND a
    * positive-count, a byte total AND a row rank) would otherwise pay
    * k identical wide exchanges. */
  private def prefixAggMulti(
      df: DataFrame,
      groupCol: String,
      orderCols: Seq[String],
      values: Seq[(Column, String)],
      numPartitions: Int): DataFrame = {
    require(orderCols.nonEmpty, "orderCols must be non-empty")
    require(values.nonEmpty, "values must be non-empty")
    // Internal working columns would be silently overwritten (then
    // dropped) by withColumn below — reject clashing inputs at every
    // call site in one place.
    val clash = (Seq("__pid", "__opid", "__og") ++
      values.indices.map(i => s"__off$i"))
      .filter(df.columns.contains)
    require(clash.isEmpty,
      s"input already has internal working column(s) ${clash.mkString(", ")}" +
        " — rename them before calling the Ranking prefix operators")
    val n = if (numPartitions > 0) numPartitions
      else df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    val keys = col(groupCol) +: orderCols.map(col)
    val parted = Dedup.truncate(
      df.repartitionByRange(n, keys: _*)
        .withColumn("__pid", spark_partition_id()))
    // Offset census: value subtotals per (pid, group), then the running
    // sum of earlier pids' subtotals within each group. Metadata-sized
    // (partitions × groups), so the window here is trivial and the
    // join back broadcasts.
    val census = parted.groupBy(col("__pid"), col(groupCol))
      .agg(sum(values.head._1).as("__c0"),
        values.tail.zipWithIndex.map { case ((v, _), i) =>
          sum(v).as(s"__c${i + 1}") }: _*)
    val offW = Window.partitionBy(col(groupCol)).orderBy(col("__pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = census.select(
      col("__pid").as("__opid") +: col(groupCol).as("__og") +:
        values.indices.map(i =>
          coalesce(sum(col(s"__c$i")).over(offW), lit(0L))
            .as(s"__off$i")): _*)
    val runW = Window.partitionBy(col("__pid"), col(groupCol))
      .orderBy(orderCols.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // Null-safe group match: a NULL group is a real group (the census
    // saw it), and a plain equi-join would silently drop its rows.
    val joined = parted.join(broadcast(offsets),
      col("__pid") === col("__opid") && col(groupCol) <=> col("__og"))
    values.zipWithIndex.foldLeft(joined) {
      case (acc, ((v, name), i)) =>
        acc.withColumn(name, col(s"__off$i") + sum(v).over(runW))
    }.drop("__pid" +: "__opid" +: "__og" +:
      values.indices.map(i => s"__off$i"): _*)
  }

  /** Exact per-group inclusive running sums of SEVERAL value columns
    * at once in `orderCols` order — [[groupRunningSum]]'s contract
    * (range-repartition, bounded windows, broadcast offset census,
    * unique-tiebreaker order, NULL groups are real groups) paying the
    * wide exchange once for all measures. `valueCols` maps each input
    * column to its output prefix-column name. */
  def groupRunningSums(
      df: DataFrame,
      groupCol: String,
      orderCols: Seq[String],
      valueCols: Seq[(String, String)],
      numPartitions: Int = 0): DataFrame =
    prefixAggMulti(df, groupCol, orderCols,
      valueCols.map { case (v, out) => col(v) -> out }, numPartitions)

  /** Exact per-group INCLUSIVE running sum of `valueCol` in
    * `orderCols` order — the distributed prefix sum behind sequence
    * packing and byte-offset assignment, built exactly like
    * [[groupRank]] (rank IS this with value ≡ 1): range-repartition
    * by (group, order…), pin, then a per-(partition, group) local
    * running sum plus a broadcast offset census of per-(partition,
    * group) SUBTOTALS. `row_number().over(partitionBy(group))`-style
    * prefix sums put a whole group's rows on one task; here every
    * window is bounded by the range-partition width. Same contract as
    * [[groupRank]]: `orderCols` must end in a per-group-unique
    * tiebreaker, NULL order values sort first, NULL groups are real
    * groups.
    *
    * Output: the input columns + `running` (long). */
  def groupRunningSum(
      df: DataFrame,
      groupCol: String,
      orderCols: Seq[String],
      valueCol: String,
      numPartitions: Int = 0): DataFrame =
    prefixAgg(df, groupCol, orderCols, col(valueCol), "running",
      numPartitions)

  /** [[groupRank]] and [[groupRunningSum]] in ONE scaffold pass —
    * `rank` (prefix count) and `running` (prefix sum of `valueCol`)
    * over the same (group, order) in a single range exchange + census
    * + bounded window, for callers that need both (r19: the Pettitt
    * chain paid two full scaffolds for prefixes over the SAME order —
    * guide §2.4's "two operations keyed the same way share one
    * exchange"). Contracts as [[groupRank]]: unique tiebreaker last,
    * NULL order values first, NULL groups are real groups. */
  def groupRankAndRunningSum(
      df: DataFrame,
      groupCol: String,
      orderCols: Seq[String],
      valueCol: String,
      numPartitions: Int = 0): DataFrame =
    prefixAggMulti(df, groupCol, orderCols,
      Seq(lit(1L) -> "rank", col(valueCol) -> "running"), numPartitions)

  /** Exact per-group lagged payloads: every row gains
    * `<payload>_lag<j>` columns (j = 1..lags) holding the payload of
    * the row j positions EARLIER within its group under `orderCols`
    * order (NULL when the group has no such predecessor) — the
    * replacement for the groupRank + (group, rank−j) self-join idiom,
    * which pays the rank scaffold AND two full-data exchanges per
    * lag join (r19, guide §2.4). One scaffold pass instead:
    * range-repartition by (group, order…), pin (data, pid), take
    * window lags within each bounded (pid, group) window, and repair
    * the ≤ lags boundary rows per (pid, group) from the previous
    * pids' tail rows — head and tail sets are (pids × groups)-bounded
    * slivers, so the repair join moves metadata, not data.
    *
    * Boundary completeness: a head row's j-th predecessor has at most
    * j − 1 ≤ lags − 1 group rows after it overall, hence at most that
    * many within its own pid — so it sits in its pid's last-`lags`
    * tail by construction.
    *
    * Contracts as [[groupRank]]: `orderCols` must end in a per-group-
    * unique tiebreaker (the order must be total), NULL order values
    * sort first, NULL groups are real groups. Payload columns may be
    * NULL (a NULL-valued predecessor yields NULL exactly like the
    * self-join form). */
  def groupLag(
      df: DataFrame,
      groupCol: String,
      orderCols: Seq[String],
      payloadCols: Seq[String],
      lags: Int,
      numPartitions: Int = 0): DataFrame = {
    require(orderCols.nonEmpty, "orderCols must be non-empty")
    require(payloadCols.nonEmpty, "payloadCols must be non-empty")
    require(lags >= 1 && lags <= 8, "lags must be in [1, 8]")
    val outCols = for (p <- payloadCols; j <- 1 to lags)
      yield s"${p}_lag$j"
    val clash = (Seq("__pid", "__rn", "__cnt", "__og", "__opid",
      "__off", "__gp") ++ outCols).filter(df.columns.contains)
    require(clash.isEmpty,
      s"input already has internal working column(s) ${clash.mkString(", ")}" +
        " — rename them before calling groupLag")
    val n = if (numPartitions > 0) numPartitions
      else df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    val keys = col(groupCol) +: orderCols.map(col)
    val parted = Dedup.truncate(
      df.repartitionByRange(n, keys: _*)
        .withColumn("__pid", spark_partition_id()))
    val w = Window.partitionBy(col("__pid"), col(groupCol))
      .orderBy(orderCols.map(col): _*)
    val wAll = Window.partitionBy(col("__pid"), col(groupCol))
    val withLags = payloadCols.foldLeft(
      parted.withColumn("__rn", row_number().over(w).cast("long"))
        .withColumn("__cnt", count(lit(1)).over(wAll))) {
      case (acc, p) =>
        (1 to lags).foldLeft(acc) { case (a, j) =>
          a.withColumn(s"${p}_lag$j", lag(col(p), j).over(w)) }
    }
    // Global (pid, group) offsets — the prefixAgg census, broadcast.
    val census = parted.groupBy(col("__pid"), col(groupCol))
      .agg(count(lit(1)).as("__c"))
    val offW = Window.partitionBy(col(groupCol)).orderBy(col("__pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = census.select(col("__pid").as("__opid"),
      col(groupCol).as("__og"),
      coalesce(sum(col("__c")).over(offW), lit(0L)).as("__off"))
    def withGlobalPos(d: DataFrame): DataFrame =
      d.join(broadcast(offsets),
          col("__pid") === col("__opid") && col(groupCol) <=> col("__og"))
        .withColumn("__gp", col("__off") + col("__rn"))
        .drop("__opid", "__og", "__off")
    val heads = withGlobalPos(withLags.filter(col("__rn") <= lags)
      .select(col("__pid") +: col(groupCol) +: col("__rn") +: Nil: _*))
    val tails = withGlobalPos(withLags
      .filter(col("__rn") > col("__cnt") - lags)
      .select(col("__pid") +: col(groupCol) +: col("__rn") +:
        payloadCols.map(col): _*))
      .select(col(groupCol).as("__tg") +: col("__gp").as("__tgp") +:
        payloadCols.map(p => col(p).as(s"__t_$p")): _*)
    // One small-⋈-small repair join fixing exactly the rows whose
    // within-pid lag j is out of reach (__rn <= j): the per-depth
    // matches are unioned and collapsed to one row per repaired
    // (pid, group, row) — each (row, depth) match is a singleton, so
    // max() just selects it — and attached with a single broadcast
    // join however many depths are in play.
    val fixes = (1 to lags).map { j =>
      heads.filter(col("__rn") <= j)
        .join(tails, col(groupCol) <=> col("__tg") &&
          col("__gp") - j === col("__tgp"))
        .select(col("__pid").as("__fpid") +: col(groupCol).as("__fg") +:
          col("__rn").as("__frn") +:
          (for (p <- payloadCols; jj <- 1 to lags) yield
            (if (jj == j) col(s"__t_$p")
             else lit(null).cast(df.schema(p).dataType))
              .as(s"__f_${p}_$jj")): _*)
    }
    val fixAggs = for (p <- payloadCols; jj <- 1 to lags) yield
      max(col(s"__f_${p}_$jj")).as(s"__f_${p}_$jj")
    val fixAll = fixes.reduce(_ unionByName _)
      .groupBy(col("__fpid"), col("__fg"), col("__frn"))
      .agg(fixAggs.head, fixAggs.tail: _*)
    val joined = withLags.join(broadcast(fixAll),
      col("__pid") === col("__fpid") &&
        col(groupCol) <=> col("__fg") &&
        col("__rn") === col("__frn"), "left")
    val repaired = payloadCols.foldLeft(joined) { case (a0, p) =>
      (1 to lags).foldLeft(a0) { case (a, j) =>
        a.withColumn(s"${p}_lag$j",
          // Window lag is NULL on every repaired row (__rn <= j) by
          // construction; rows beyond the boundary never carry a
          // repair row, so coalesce cannot overwrite a real lag.
          coalesce(col(s"${p}_lag$j"), col(s"__f_${p}_$j")))
      }
    }.drop("__fpid", "__fg", "__frn")
      .drop((for (p <- payloadCols; jj <- 1 to lags) yield
        s"__f_${p}_$jj"): _*)
    repaired.drop("__pid", "__rn", "__cnt")
  }

  /** Exact per-group top-k with aggregation state bounded by k — the
    * replacement for `row_number().over(partitionBy(group)) <= k` when
    * the group is unbounded (all candidate docs of one query, all rows
    * of one key): the window form concentrates the whole group on one
    * task before discarding all but k, while this form never holds
    * more than k rows per group anywhere — map-side partials keep ≤ k
    * per (input partition, group), the shuffle moves only those, and
    * the merge is k-vs-k ([[graft.functions.TopKAggregate.TopKRows]]).
    *
    * `sortFields` defines the order: ascending lexicographic over the
    * fields in sequence (negate a numeric field for descending), and
    * MUST contain a per-group-unique tiebreaker before any
    * payload-only fields so the order is total and the result
    * deterministic under any partitioning — the same contract as
    * [[groupRank]]. All fields are carried to the output.
    *
    * Rows whose PRIMARY sort field is NULL are excluded before the
    * aggregate. Struct comparison is NULLS FIRST, so under the
    * negate-for-descending idiom a NULL score would silently rank
    * FIRST — the inverse of the `orderBy(desc)` windows this
    * replaces, which rank NULLs last. Excluding them matches the
    * window semantics whenever the group has ≥ k scored rows (the
    * only case where it changes the answer is a group padded out with
    * unscored rows, where ranking them is meaningless anyway), and it
    * matches [[groupQuantiles]]' documented NULL stance.
    *
    * Output: groupCols + `rank` (int, 1-based) + one column per
    * sortField, in order. */
  def groupTopK(
      df: DataFrame,
      groupCols: Seq[String],
      sortFields: Seq[Column],
      k: Int): DataFrame = {
    require(groupCols.nonEmpty, "groupCols must be non-empty")
    require(sortFields.nonEmpty, "sortFields must be non-empty")
    val g = groupCols.map(col)
    df.filter(sortFields.head.isNotNull)
      .groupBy(g: _*)
      .agg(TopKAggregate.topKStructs(sortFields, k).as("__topk"))
      .select(g :+ posexplode(col("__topk")).as(Seq("__pos", "__e")): _*)
      .select(g ++ Seq((col("__pos") + 1).cast("int").as("rank"),
        col("__e.*")): _*)
  }

  /** Exact per-group quantiles by distributed selection: for each
    * probability q, the group's value at rank ⌈q·n⌉ — the lower /
    * type-1 quantile, always an actual data value, so no floating
    * interpolation enters the result. (The ⌈q·n⌉ target itself is one
    * IEEE multiply+ceil over exact integers — identical in any
    * engine.) `tieCol` must be per-group unique so ranks are total.
    *
    * Exact quantiles are normally the painful one at scale (a
    * per-group sort on one task, or sampled sketches with error
    * bars); here [[groupRank]] does the heavy lifting and the
    * (groups × qs) target-rank table broadcasts onto the ranked data
    * — selection is a map-side filter, no second sort, no
    * approximation.
    *
    * NULL values are excluded before ranking — the SQL-standard
    * percentile semantics, and the engine-neutral one: under Spark's
    * NULLS FIRST a NULL-bearing group would otherwise return NULL as
    * its low quantiles while DuckDB (NULLS LAST) returned data values.
    * n in ⌈q·n⌉ is therefore the group's NON-NULL count; a group that
    * is all NULLs vanishes from the output.
    *
    * Output: (group, q, value). */
  def groupQuantiles(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      tieCol: String,
      qs: Seq[Double]): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q > 0.0 && q <= 1.0),
      "qs must be in (0, 1]")
    val ranked = groupRank(
      df.filter(col(valueCol).isNotNull)
        .select(col(groupCol), col(valueCol), col(tieCol)),
      groupCol, Seq(valueCol, tieCol))
    val targets = ranked.groupBy(col(groupCol))
      .agg(count(lit(1)).as("cnt"))
      .select(col(groupCol).as("__tg"),
        explode(array(qs.map(lit): _*)).as("q"), col("cnt"))
      .select(col("__tg"), col("q"),
        ceil(col("q") * col("cnt")).cast("long").as("__target"))
    ranked.join(broadcast(targets), col(groupCol) <=> col("__tg"))
      .filter(col("rank") === col("__target"))
      .select(col(groupCol), col("q"), col(valueCol))
  }

  /** Per-group winsorization: clip every value into its group's
    * [p(loQ), p(hiQ)] band, both bounds EXACT [[groupQuantiles]]
    * selections — the standard tail-taming move before averaging
    * heavy-tailed quality signals (a handful of million-token docs
    * otherwise own the mean). Clipping is pure integer/order
    * arithmetic on actual data values — nothing to round, bit-equal
    * in any engine. Bounds come from the NON-NULL values (see
    * [[groupQuantiles]]); a NULL value row keeps a NULL `clipped`
    * (Spark's least/greatest skip NULL operands, which would
    * otherwise clip a NULL to `hi`).
    *
    * Output: (group, value, tie, lo, hi, clipped). */
  def winsorize(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      tieCol: String,
      loQ: Double = 0.05,
      hiQ: Double = 0.95): DataFrame = {
    require(0.0 < loQ && loQ < hiQ && hiQ <= 1.0, "need 0 < loQ < hiQ <= 1")
    val base = df.select(col(groupCol), col(valueCol), col(tieCol))
    val bounds = groupQuantiles(base, groupCol, valueCol, tieCol,
        Seq(loQ, hiQ))
      .groupBy(col(groupCol))
      .agg(min(when(col("q") === loQ, col(valueCol))).as("lo"),
        min(when(col("q") === hiQ, col(valueCol))).as("hi"))
      .withColumnRenamed(groupCol, "__bg")
    // LEFT join: a group whose values are ALL NULL has no bounds row,
    // but its rows must still pass through (with NULL lo/hi/clipped),
    // not silently vanish.
    base.join(broadcast(bounds), col(groupCol) <=> col("__bg"), "left")
      .drop("__bg")
      .withColumn("clipped",
        when(col(valueCol).isNotNull,
          greatest(least(col(valueCol), col("hi")), col("lo"))))
  }

  /** Robust per-group standardization: z = (x − median) / MAD, with
    * both the median and the median-absolute-deviation EXACT (the
    * ⌈n/2⌉-th value / deviation, [[groupQuantiles]] type-1 semantics)
    * — outlier-proof where mean/stddev standardization is dragged by
    * the very tail docs it exists to flag. The score is quantized
    * once to integer micro-units and displayed with one exact divide
    * (the cross-engine rounding idiom); a zero-MAD group (over half
    * its values identical to the median) yields NULL z rather than a
    * division by zero. Median and MAD come from the NON-NULL values;
    * NULL-value rows pass through with a NULL z.
    *
    * Scale: ONE [[groupRank]] pass (the one wide range exchange a
    * sort pays) serves both statistics. The median is the rank-⌈n/2⌉
    * selection; the MAD is selected from the SAME value-ranked rows
    * without ever ranking deviations: |x − med| is weakly unimodal
    * over the value order (decreasing to the median, increasing
    * after), so the k smallest deviations always form a contiguous
    * rank window of size k = ⌈n/2⌉, and the k-th smallest deviation —
    * the MAD — equals min over all size-k windows of the larger
    * end-deviation. That turns the former second quantile pass
    * (another full range exchange + checkpoint over derived
    * deviations) into one rank-offset self equi-join
    * (hi.rank = lo.rank + k − 1) plus a map-side-combinable min-agg.
    *
    * Output: (group, id, value, med, mad, z). */
  def robustZScores(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      tieCol: String): DataFrame = {
    val base = df.select(col(groupCol), col(valueCol), col(tieCol))
    // Pinned: referenced by the median selection and BOTH self-join
    // sides — the range exchange must run once.
    val ranked = Dedup.truncate(groupRank(
      base.filter(col(valueCol).isNotNull), groupCol,
      Seq(valueCol, tieCol)))
    // k = ⌈n/2⌉ per group — the same ceil(q·n) arithmetic as
    // groupQuantiles, so the selected rank is bit-identical.
    val kTab = ranked.groupBy(col(groupCol))
      .agg(count(lit(1)).as("__n"))
      .select(col(groupCol).as("__kg"),
        ceil(lit(0.5) * col("__n")).cast("long").as("__k"))
    val medK = ranked.join(broadcast(kTab), col(groupCol) <=> col("__kg"))
      .filter(col("rank") === col("__k"))
      .select(col(groupCol).as("__mg"), col("__k"),
        col(valueCol).as("med"))
    val lo = ranked.join(broadcast(medK), col(groupCol) <=> col("__mg"))
    val hi = ranked.select(col(groupCol).as("__hg"),
      col(valueCol).as("__hv"), col("rank").as("__hr"))
    val mad = lo.join(hi, col(groupCol) <=> col("__hg") &&
        col("__hr") === col("rank") + col("__k") - 1)
      .select(col(groupCol), greatest(
        abs(col(valueCol) - col("med")),
        abs(col("__hv") - col("med"))).as("__cand"))
      .groupBy(col(groupCol))
      .agg(min(col("__cand")).as("mad"))
      .withColumnRenamed(groupCol, "__dg")
    val med = medK.select(col("__mg"), col("med"))
    // LEFT joins, as in winsorize: all-NULL groups keep their rows
    // (NULL med/mad/z) instead of dropping out of the result.
    base.join(broadcast(med), col(groupCol) <=> col("__mg"), "left")
      .drop("__mg")
      .join(broadcast(mad), col(groupCol) <=> col("__dg"), "left")
      .drop("__dg")
      .withColumn("z",
        when(col("mad") > 0,
          round(lit(1e6) * (col(valueCol) - col("med")).cast("double")
            / col("mad").cast("double")).cast("long").cast("double") / 1e6))
      .select(col(groupCol), col(tieCol), col(valueCol), col("med"),
        col("mad"), col("z"))
  }

  /** Per-row percentile within its group — the rank-based CDF
    * transform (pct = rank / n ∈ (0, 1]) that calibrates
    * heterogeneous per-source scores onto one comparable scale
    * before cross-source mixing: a "good" score in a clean source
    * and a "good" score in a noisy one land on the same percentile
    * axis. Ranks come from the scale-safe [[groupRank]]; n is the
    * group's non-null count. pct needs no quantization: rank and n
    * are exact longs and one IEEE divide of the same two integers is
    * correctly rounded — bit-identical — in any engine. NULL values
    * are excluded (as [[groupQuantiles]]); NULL-value rows are
    * absent from the output.
    *
    * Output: (group, tie, value, rank, pct). */
  def percentileRanks(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      tieCol: String): DataFrame = {
    val ranked = groupRank(
      df.filter(col(valueCol).isNotNull)
        .select(col(groupCol), col(valueCol), col(tieCol)),
      groupCol, Seq(valueCol, tieCol))
    val cnt = ranked.groupBy(col(groupCol))
      .agg(count(lit(1)).as("__n"))
      .withColumnRenamed(groupCol, "__cg")
    ranked.join(broadcast(cnt), col(groupCol) <=> col("__cg"))
      .withColumn("pct",
        col("rank").cast("double") / col("__n").cast("double"))
      .select(col(groupCol), col(tieCol), col(valueCol), col("rank"),
        col("pct"))
  }

  /** Equal-frequency bucket per row within its group, from the exact
    * [[groupRank]]: bucket = (rank−1)·nBuckets div groupCount, an
    * integer in [0, nBuckets). Ranks and counts are exact Longs; the
    * bucket edge is integer division — no floating point anywhere, so
    * the cut is bit-identical in any engine.
    *
    * Output: the input columns + `rank` + `bucket` (int). */
  def groupBuckets(
      df: DataFrame,
      groupCol: String,
      orderCols: Seq[String],
      nBuckets: Int): DataFrame = {
    require(nBuckets > 0, "nBuckets must be positive")
    val ranked = groupRank(df, groupCol, orderCols)
    val cnt = ranked.groupBy(col(groupCol))
      .agg(count(lit(1)).as("cnt"))
      .withColumnRenamed(groupCol, "__cg")
    ranked.join(broadcast(cnt), col(groupCol) <=> col("__cg"))
      .withColumn("bucket",
        expr(s"CAST(((rank - 1) * $nBuckets) div cnt AS INT)"))
      .drop("__cg", "cnt")
  }

  /** Integer budget apportionment by the largest-remainder (Hare
    * quota) method: split `budget` units across keys proportionally
    * to `weightCol`, exactly — Σ alloc = budget always, which plain
    * rounding cannot promise. The crawl-budget / shard-quota /
    * sample-quota shape: fetch slots ∝ domain PageRank, shard sizes ∝
    * source mix, sampled rows ∝ stratum size.
    *
    * base = ⌊budget·w / W⌋ (exact Long `div`); the leftover
    * R = budget − Σ base units go +1 each to the R keys with the
    * largest division remainders (`budget·w mod W` — same order as
    * fractional parts, no floats anywhere), ties broken by key
    * ascending. Requires budget·max(w) to fit a Long.
    *
    * Scale: W and R are 1-row broadcast scalars; the remainder
    * ranking runs through [[groupRank]] (range-partitioned, no
    * single-task window) even though a weight table is usually
    * model-sized — the same discipline as every other global rank
    * here. Output: (key, weight, base, alloc). */
  def apportionLargestRemainder(
      df: DataFrame,
      keyCol: String,
      weightCol: String,
      budget: Long): DataFrame = {
    require(budget >= 0, "budget must be non-negative")
    // "__wsum", not "__W": Spark resolves names case-INsensitively by
    // default, so a "__w" column next to a "__W" column is ambiguous.
    val w = df.select(col(keyCol), col(weightCol).cast("long").as("__w"))
      .filter(col("__w") > 0)
    val tot = w.agg(sum(col("__w")).as("__wsum"))
    val based = Dedup.truncate(w.crossJoin(broadcast(tot))
      .select(col(keyCol), col("__w"),
        expr(s"(${budget}L * __w) div __wsum").as("base"),
        expr(s"(${budget}L * __w) % __wsum").as("__rem")))
    val leftover = based.agg((lit(budget) - sum(col("base"))).as("__R"))
    groupRank(based.withColumn("__g", lit(1))
        .withColumn("__nr", -col("__rem")), "__g", Seq("__nr", keyCol))
      .crossJoin(broadcast(leftover))
      .select(col(keyCol), col("__w").as("weight"), col("base"),
        (col("base") + when(col("rank") <= col("__R"), 1L).otherwise(0L))
          .as("alloc"))
  }

  /** Exact per-group ROC AUC by the Mann–Whitney identity — the
    * standard "can this score separate the classes" number, computed
    * distributively with EXACT tie handling: collapse to
    * (group, score) cells, prefix-sum cell counts in score order
    * through [[groupRunningSum]] (so no per-group single-partition
    * window anywhere), and accumulate DOUBLED tie-averaged rank sums
    * — a tie block at ranks cb+1..cb+cnt contributes
    * pos·(2·cb+cnt+1), keeping everything integer. AUC then is one
    * rounded divide: (2·ranksum − n₁(n₁+1)) / (2·n₁·n₀), NULL when a
    * group is single-class (nothing to separate). NULL scores are
    * dropped (they rank nowhere); a nonzero label is a positive.
    *
    * Scores are micro-quantized (round(1e6·score)) before ranking so
    * fractional scores keep their order to 1e-6 instead of silently
    * truncating to long (which would merge distinct scores into
    * artificial ties); AUC is rank-based, so for already-integer
    * scores the quantization is a strictly monotone map and the
    * result is bit-identical. The micro grid is exact for |score| ≤
    * ~9e9 (beyond that the ×1e6 double product coarsens) — pre-scale
    * wider inputs.
    *
    * Scale: one (group, score) hash-agg, the range-partitioned
    * prefix machinery, one per-group reduce. Overflow: rank sums
    * bound by n₁·2N — keep group size × positives under ~9·10¹⁸.
    * Output: (groupCol, n_pos, n_neg, auc_micro). */
  def groupAuc(
      df: DataFrame,
      groupCol: String,
      scoreCol: String,
      labelCol: String): DataFrame = {
    val cells = df.filter(col(scoreCol).isNotNull)
      .groupBy(col(groupCol),
        round(col(scoreCol).cast("double") * lit(1e6)).cast("long")
          .as("__sc"))
      .agg(count(lit(1)).as("__cnt"),
        sum(when(col(labelCol).cast("long") =!= 0L, 1L).otherwise(0L))
          .as("__pos"))
    groupRunningSum(cells, groupCol, Seq("__sc"), "__cnt")
      .withColumn("__cb", col("running") - col("__cnt"))
      .groupBy(col(groupCol))
      .agg(sum(col("__pos")).as("__n1"),
        sum(col("__cnt") - col("__pos")).as("__n0"),
        sum(col("__pos") * (lit(2L) * col("__cb") + col("__cnt") + 1L))
          .as("__trs"))
      .select(col(groupCol), col("__n1").as("n_pos"),
        col("__n0").as("n_neg"),
        when(col("__n1") === 0L || col("__n0") === 0L,
          lit(null).cast("long"))
          .otherwise(round(lit(1e6) *
            (col("__trs") - col("__n1") * (col("__n1") + 1L))
              .cast("double") /
            (lit(2.0) * col("__n1").cast("double") *
              col("__n0").cast("double"))).cast("long"))
          .as("auc_micro"))
  }

  /** Exact per-group Average Precision (the area under the
    * precision–recall curve in its standard retrieval form) — the
    * class-imbalance companion to [[groupAuc]]: AUC asks "does a
    * random positive outrank a random negative", AP asks "how pure
    * are the prefixes above each positive", which is what a
    * needle-in-haystack retrieval or filtering stage actually
    * experiences. AP = (1/P)·Σ_{j=1..P} j/k_j over the positives'
    * hit ranks k_j.
    *
    * Ties break DETERMINISTICALLY by (score desc, id asc) — stated
    * contract rather than tie-interpolation, so the result is a
    * total-order property and bit-identical on any engine. Ranks
    * come from [[groupRank]] over (−micro-score, id) and each
    * positive's index j from ONE more range-partitioned prefix over
    * the rank order; each j/k quantizes to an exact integer micro
    * ((1e6·j) div k) before the order-free integer sum. Single-class
    * groups report NULL.
    * Output: (groupCol, n, n_pos, ap_micro). */
  def averagePrecision(
      df: DataFrame,
      groupCol: String,
      idCol: String,
      scoreCol: String,
      labelCol: String): DataFrame = {
    val base = df.filter(col(scoreCol).isNotNull)
      .select(col(groupCol).as("__g"),
        col(idCol).cast("long").as("__id"),
        (-round(col(scoreCol).cast("double") * lit(1e6)).cast("long"))
          .as("__ns"),
        when(col(labelCol).cast("long") =!= 0L, 1L).otherwise(0L)
          .as("__y"))
    val ranked = groupRank(base, "__g", Seq("__ns", "__id"))
    val withJ = groupRunningSum(ranked, "__g", Seq("rank"), "__y")
    val prec = withJ.filter(col("__y") === 1L)
      .select(col("__g"),
        expr("(1000000L * running) div rank").as("__p"))
      .groupBy(col("__g"))
      .agg(count(lit(1)).as("__np"), sum(col("__p")).as("__sp"))
    val totals = base.groupBy(col("__g"))
      .agg(count(lit(1)).as("n"))
    totals.join(prec, Seq("__g"), "left")
      .select(col("__g").as(groupCol), col("n"),
        coalesce(col("__np"), lit(0L)).as("n_pos"),
        when(col("__np") > 0L && col("__np") < col("n"),
          round(col("__sp").cast("double") /
            col("__np").cast("double")).cast("long"))
          .otherwise(lit(null).cast("long")).as("ap_micro"))
  }

  /** Per-group Spearman rank correlation, tie-exact — "is the
    * relationship monotone" where Pearson
    * ([[Profile.correlationCensus]]) asks "is it linear": each
    * value's tie-averaged rank is carried DOUBLED (2·cb + cnt + 1,
    * an integer — the same trick as [[groupAuc]]), Pearson's formula
    * then runs over exact integer rank sums in DECIMAL(38,0), and
    * the ONE floating step is the final divide-over-two-sqrts.
    * NULL rho for a group with a constant side (no ranking to
    * correlate). Rows with a NULL x or y are dropped
    * (pairwise-complete, like the Pearson census).
    *
    * Scale: two (group, value) cell aggs with running-free tie math
    * (cb from [[groupRunningSum]]'s range-partitioned prefix), two
    * row-to-cell equi-joins, one per-group reduce. Output:
    * (groupCol, n, rho_micro). */
  def spearman(
      df: DataFrame,
      groupCol: String,
      xCol: String,
      yCol: String): DataFrame = {
    // Micro-quantize both sides (same rationale as groupAuc: rho is
    // rank-based, so for integer inputs this is bit-identical, and
    // fractional inputs keep 1e-6 order instead of truncating).
    val base = Dedup.truncate(df
      .filter(col(xCol).isNotNull && col(yCol).isNotNull)
      .select(col(groupCol),
        round(col(xCol).cast("double") * lit(1e6)).cast("long").as("__x"),
        round(col(yCol).cast("double") * lit(1e6)).cast("long").as("__y")))
    // Doubled tie-averaged rank per distinct value: 2·cb + cnt + 1.
    def ranks(valueCol: String, out: String): DataFrame = {
      val cells = base.groupBy(col(groupCol), col(valueCol))
        .agg(count(lit(1)).as("__cnt"))
      groupRunningSum(cells, groupCol, Seq(valueCol), "__cnt")
        .select(col(groupCol), col(valueCol),
          (lit(2L) * (col("running") - col("__cnt")) + col("__cnt") + 1L)
            .as(out))
    }
    val dec = "decimal(38,0)"
    val withRanks = base
      .join(ranks("__x", "__rx"), Seq(groupCol, "__x"))
      .join(ranks("__y", "__ry"), Seq(groupCol, "__y"))
    val agg = withRanks.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"),
        sum(col("__rx").cast(dec)).as("__sx"),
        sum(col("__ry").cast(dec)).as("__sy"),
        sum((col("__rx") * col("__ry")).cast(dec)).as("__sxy"),
        sum((col("__rx") * col("__rx")).cast(dec)).as("__sxx"),
        sum((col("__ry") * col("__ry")).cast(dec)).as("__syy"))
    val n = col("n").cast(dec)
    val num = n * col("__sxy") - col("__sx") * col("__sy")
    val denx = n * col("__sxx") - col("__sx") * col("__sx")
    val deny = n * col("__syy") - col("__sy") * col("__sy")
    agg.select(col(groupCol), col("n"),
      when(denx <= 0 || deny <= 0, lit(null).cast("long"))
        .otherwise(round(lit(1e6) * num.cast("double") /
          (sqrt(denx.cast("double")) * sqrt(deny.cast("double"))))
          .cast("long")).as("rho_micro"))
  }

  /** Kendall's τ-b per group — [[spearman]]'s pair-concordance
    * sibling (ρ asks "are the RANK LISTS linear", τ asks "what
    * fraction of PAIRS agree" — τ is the one with the clean
    * probabilistic reading and the gentler tail sensitivity):
    *
    *   τ_b = (C − D) / √( (n₀ − n₁)(n₀ − n₂) ),
    *
    * C − D = Σ_{i<j} sgn(xⱼ−xᵢ)·sgn(yⱼ−yᵢ) exactly over the pair
    * census, n₀ = n(n−1)/2, and n₁/n₂ the standard per-column tie
    * corrections Σt(t−1)/2 off the value censuses — all exact
    * integers into ONE sqrt-product divide, micro-rounded. Either
    * column fully tied ⇒ NULL (no order to correlate).
    *
    * Scale: the pair census is quadratic per group, so rows
    * truncate to the first `maxN` in (idCol) order — the
    * [[graft.operators.TimeSeries.mannKendall]] bound, with `n`
    * showing what was used. Output: (groupCol, n, cd, tau_micro). */
  def kendallTau(
      df: DataFrame,
      groupCol: String,
      xCol: String,
      yCol: String,
      idCol: String,
      maxN: Int = 512): DataFrame = {
    require(maxN >= 2, "maxN must be at least 2")
    // One bounded-heap aggregation selects the same first-maxN set
    // ((__id, __x, __y) is total per group, NULLS-FIRST like the
    // former groupRank) and the whole pair census — cd and both tie
    // counts, all exact integers — runs as ONE in-task kernel over
    // the collected series (r18: range exchange + pair self-join +
    // three aggregations → one bounded-state shuffle; guide §2.3/§2.4).
    val series = df
      .filter(col(xCol).isNotNull && col(yCol).isNotNull)
      .select(col(groupCol).as("__g"), col(idCol).as("__id"),
        round(col(xCol).cast("double") * lit(1e6)).cast("long")
          .as("__x"),
        round(col(yCol).cast("double") * lit(1e6)).cast("long")
          .as("__y"))
      .groupBy(col("__g"))
      .agg(graft.functions.TopKAggregate.topKStructs(
        Seq(col("__id"), col("__x"), col("__y")), maxN).as("__s"))
    series
      .select(col("__g"),
        graft.functions.SeriesKernels.kendallTauStats(
          transform(col("__s"), e => e.getField("__x")),
          transform(col("__s"), e => e.getField("__y"))).as("__st"))
      .filter(col("__st").isNotNull)
      .select(col("__g"), col("__st.n").as("n"),
        col("__st.cd").as("cd"),
        col("__st.t1").as("__t1"), col("__st.t2").as("__t2"),
        (col("__st.n") * (col("__st.n") - 1L) / lit(2L)).as("__n0"))
      .select(col("__g").as(groupCol), col("n"), col("cd"),
        when(col("__n0") > col("__t1") && col("__n0") > col("__t2"),
          round(lit(1e6) * col("cd").cast("double") /
            (sqrt((col("__n0") - col("__t1")).cast("double")) *
              sqrt((col("__n0") - col("__t2")).cast("double"))))
            .cast("long"))
          .otherwise(lit(null).cast("long")).as("tau_micro"))
  }

  /** RBO suffix-weight table: S(m) = Σ_{d=m..k} (1−p)·p^{d−1}/d in
    * micro units, m = 1..k — computed once driver-side and embedded
    * as literals on both engines. An item first present in both
    * top-d lists at depth m contributes to every deeper overlap
    * fraction, i.e. exactly S(m) — which turns rank-biased overlap
    * into an order-free integer SUM per query. */
  def rboSuffixMicro(p: Double, k: Int): Seq[Long] = {
    require(p > 0 && p < 1, s"p must be in (0,1), got $p")
    require(k >= 1, "k must be at least 1")
    val terms = (1 to k).map(d => (1 - p) * math.pow(p, d - 1) / d)
    (1 to k).map { m =>
      scala.math.BigDecimal(1e6 * terms.drop(m - 1).sum)
        .setScale(0, scala.math.BigDecimal.RoundingMode.HALF_UP).toLong
    }
  }

  /** Fixed-depth rank-biased overlap (Webber et al. 2010) between two
    * top-k rankings per query — "how much did my ranking CHANGE",
    * the drift number for index rebuilds, model swaps, and recrawl
    * deltas, top-weighted the way users read lists. RBO@k =
    * (1−p)·Σ_{d≤k} p^{d−1}·|A∩B @ d|/d; an item with ranks (ra, rb)
    * joins the intersection at depth max(ra, rb), so each common
    * item contributes exactly [[rboSuffixMicro]](max(ra, rb)) and
    * the metric is one equi-join plus one integer sum — no per-depth
    * pass, no window. Identical lists score Σ table ≈ 1−pᵏ micro;
    * disjoint lists 0. Queries present in only ONE ranking are
    * absent (nothing to compare).
    *
    * Scale: the (query, item) equi-join of two k-bounded lists, one
    * hash-agg. Output: (queryCol, n_common, rbo_micro). */
  def rbo(
      a: DataFrame,
      b: DataFrame,
      queryCol: String,
      itemCol: String,
      rankCol: String,
      k: Int,
      p: Double = 0.9): DataFrame = {
    val table = rboSuffixMicro(p, k)
    val ra = a.filter(col(rankCol) <= k).select(col(queryCol),
      col(itemCol), col(rankCol).cast("long").as("__ra"))
    val rb = b.filter(col(rankCol) <= k).select(col(queryCol),
      col(itemCol), col(rankCol).cast("long").as("__rb"))
    val qs = ra.select(col(queryCol)).distinct()
      .join(rb.select(col(queryCol)).distinct(), Seq(queryCol))
    ra.join(rb, Seq(queryCol, itemCol))
      .select(col(queryCol),
        element_at(typedLit(table),
          greatest(col("__ra"), col("__rb")).cast("int")).as("__s"))
      .groupBy(col(queryCol))
      .agg(count(lit(1)).as("n_common"), sum(col("__s")).as("rbo_micro"))
      .join(qs, Seq(queryCol), "right")
      .select(col(queryCol),
        coalesce(col("n_common"), lit(0L)).as("n_common"),
        coalesce(col("rbo_micro"), lit(0L)).as("rbo_micro"))
  }

  /** Micro DCG discounts 1/log₂(r+1) for ranks 1..k, computed ONCE
    * driver-side and embedded as literals on both the Spark and the
    * oracle path (the srpWeights convention) — so NDCG needs no
    * runtime libm at all and cannot drift between engines. */
  def dcgDiscountsMicro(k: Int): Seq[Long] = {
    require(k >= 1, "k must be at least 1")
    (1 to k).map { r =>
      scala.math.BigDecimal(1e6 / (math.log(r + 1.0) / math.log(2.0)))
        .setScale(0, scala.math.BigDecimal.RoundingMode.HALF_UP).toLong
    }
  }

  /** Per-query ranking evaluation — NDCG@k, reciprocal rank, and
    * precision@k of a system ranking against graded relevance: the
    * scorecard every retrieval stack (BM25, ANN, RRF fusion) is
    * tuned by. Gains are linear (gain = rel); each rank's discount
    * comes from [[dcgDiscountsMicro]]'s literal table, so DCG and
    * IDCG are order-free integer sums of rel·discount terms, and
    * NDCG is their one rounded divide — NULL when the query has no
    * relevant item at all (nothing to normalize by). Results missing
    * from `truth` score relevance 0; relevant items the system never
    * returned cost NDCG through IDCG, exactly as they should.
    *
    * Scale: results cap to rank ≤ k (map-only filter), one
    * (query, item) equi-join against truth, one per-query hash-agg;
    * the ideal side ranks truth per query through [[groupTopK]]'s
    * bounded-heap aggregate (O(k) state per query, no window).
    * Output: (queryCol, n_results, dcg_micro, idcg_micro,
    * ndcg_micro, rr_micro, precision_micro). */
  def rankEval(
      results: DataFrame,
      truth: DataFrame,
      queryCol: String,
      itemCol: String,
      rankCol: String,
      relCol: String,
      k: Int): DataFrame = {
    val disc = dcgDiscountsMicro(k)
    val discAt = (r: Column) => element_at(typedLit(disc), r.cast("int"))
    val res = results.filter(col(rankCol) <= k)
      .select(col(queryCol), col(itemCol), col(rankCol).cast("long")
        .as("__r"))
    val rel = truth.select(col(queryCol), col(itemCol),
      col(relCol).cast("long").as("__rel"))
    val sys = res.join(rel, Seq(queryCol, itemCol), "left")
      .withColumn("__rel", coalesce(col("__rel"), lit(0L)))
      .groupBy(col(queryCol))
      .agg(count(lit(1)).as("n_results"),
        sum(col("__rel") * discAt(col("__r"))).as("dcg_micro"),
        min(when(col("__rel") > 0L, col("__r"))).as("__fr"),
        sum(when(col("__rel") > 0L, 1L).otherwise(0L)).as("__hits"))
    val ideal = Ranking.groupTopK(
        rel.filter(col("__rel") > 0L), Seq(queryCol),
        Seq((-col("__rel")).as("__nrel"), col(itemCol)), k)
      .groupBy(col(queryCol))
      .agg(sum((-col("__nrel")) * discAt(col("rank"))).as("idcg_micro"))
    sys.join(ideal, Seq(queryCol), "left")
      .select(col(queryCol), col("n_results"), col("dcg_micro"),
        coalesce(col("idcg_micro"), lit(0L)).as("idcg_micro"),
        when(coalesce(col("idcg_micro"), lit(0L)) === 0L,
          lit(null).cast("long"))
          .otherwise(round(lit(1e6) * col("dcg_micro").cast("double") /
            col("idcg_micro").cast("double")).cast("long"))
          .as("ndcg_micro"),
        when(col("__fr").isNull, lit(null).cast("long"))
          .otherwise(round(lit(1e6) / col("__fr").cast("double"))
            .cast("long")).as("rr_micro"),
        round(lit(1e6) * col("__hits").cast("double") / lit(k.toDouble))
          .cast("long").as("precision_micro"))
  }
}
