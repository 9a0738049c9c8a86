package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Token-budget corpus selection (beyond-reference LLM-pipeline op): keep
  * the best-scoring documents, in score order, until a global token budget
  * is exhausted — the greedy selection step of data-constrained
  * pretraining ("sort by quality, take the top B tokens"). A doc is kept
  * iff it fits the remaining budget ENTIRELY at its position in the
  * (score DESC, id ASC) order; ties break on id so the cut is
  * deterministic.
  *
  * Scale design: the same two-pass distributed prefix sum as
  * [[SeqPack.assign]] (the textbook `sum OVER (ORDER BY ...)` collapses to
  * one partition) — range-partition by the selection order, materialize
  * once, per-partition totals -> exclusive bases, then one map pass. The
  * budget adds a pruning step SeqPack cannot have: partitions whose BASE
  * already exceeds the budget hold no selectable rows (weights are
  * non-negative, so the exclusive prefix only grows) and are dropped
  * before the second pass reads them — at 100 TB with a 1% budget, ~99%
  * of the data is never read twice.
  */
object CorpusSelect {

  /** Second pass shared by both selectors: TRUE partition pruning over the
    * materialized pass, then the per-partition selection kernel on the Row
    * RDD directly. A `filter` on the frozen pid column would still
    * schedule and scan every checkpoint partition, discarding rows one by
    * one — PartitionPruningRDD never schedules the dead partitions at all,
    * so a 1% budget reads ~1% of the corpus in the second pass. Running
    * the kernel on the RDD (instead of Dataset.mapPartitions over a
    * pruned createDataFrame) keeps the conversion count identical on the
    * pruned and unpruned paths: one InternalRow->Row per input row, one
    * Row->InternalRow per EMITTED row. Partition indices align 1:1 with
    * the frozen `spark_partition_id` column — the checkpoint materialized
    * the partitioning and nothing shuffles after it; the in-data pid (not
    * the task's index) remains the base lookup key.
    */
  private def selectPass(
      parted: DataFrame,
      live: Set[Int],
      n: Int,
      outSchema: org.apache.spark.sql.types.StructType)(
      kernel: Iterator[Row] => Iterator[Row]): DataFrame = {
    val spark = parted.sparkSession
    val rows = parted.rdd
    val pruned =
      if (live.size == n) rows
      else org.apache.spark.rdd.PartitionPruningRDD.create(rows, live.contains)
    spark.createDataFrame(pruned.mapPartitions(kernel), outSchema)
  }

  /** Rows of `df` that fit the budget, with their selection offset.
    * `weightCol` (token count) must be non-negative; `budget` is in the
    * same unit. Output = input columns + `sel_offset` (the exclusive
    * running-weight sum at the doc's position in (`scoreCol` DESC,
    * `idCol` ASC) order).
    */
  def selectByBudget(
      df: DataFrame,
      idCol: String,
      scoreCol: String,
      weightCol: String,
      budget: Long,
      numPartitions: Int = 0,
      reliable: Boolean = false): DataFrame = {
    require(budget >= 0, s"budget must be non-negative (got $budget)")
    val spark = df.sparkSession
    val n =
      if (numPartitions > 0) numPartitions
      else spark.sessionState.conf.numShufflePartitions
    val pidCol = "__cs_pid"
    require(!df.columns.contains(pidCol), s"column $pidCol is reserved")
    // cluster runs: same executor-loss hazard as SeqPack.assign(reliable)
    // — recomputing a lost partition could re-sample range boundaries
    // between the two passes; checkpoint to fault-tolerant storage
    if (reliable) require(spark.sparkContext.getCheckpointDir.isDefined,
      "CorpusSelect.selectByBudget(reliable=true) needs " +
        "sparkContext.setCheckpointDir (a fault-tolerant location both passes can re-read)")
    val order: Seq[Column] = Seq(col(scoreCol).desc, col(idCol).asc)
    // frozen partition id — same rationale as SeqPack.assign: a downstream
    // coalesce() must not re-map bases
    val staged = df.repartitionByRange(n, order: _*)
      .sortWithinPartitions(order: _*)
      .withColumn(pidCol, spark_partition_id())
    val parted =
      if (reliable) staged.checkpoint(eager = true)
      else staged.localCheckpoint(true)

    val totals = parted
      .groupBy(pidCol).agg(sum(col(weightCol).cast("long")).as("t"))
      .collect()
      .map(r => (r.getInt(0), if (r.isNullAt(1)) 0L else r.getLong(1))).toMap
    val base = new Array[Long](n)
    var acc = 0L
    (0 until n).foreach { p => base(p) = acc; acc += totals.getOrElse(p, 0L) }

    // budget pruning: a partition whose exclusive base is already past the
    // budget cannot contribute (non-negative weights) — skip reading it.
    // `<=`, not `<`: a zero-weight doc whose exclusive offset EQUALS the
    // budget still fits (sel_offset + 0 <= budget), matching the window
    // formulation
    val live = (0 until n).filter(p => base(p) <= budget).toSet
    val bc = spark.sparkContext.broadcast(base)
    val wIdx = parted.schema.fieldIndex(weightCol)
    val pidIdx = parted.schema.fieldIndex(pidCol)
    val outSchema = org.apache.spark.sql.types.StructType(
      parted.schema.filterNot(_.name == pidCol))
      .add("sel_offset", LongType, nullable = false)
    val b = budget
    selectPass(parted, live, n, outSchema) { rows =>
      var curPid = -1
      var off = 0L
      rows.flatMap { r =>
        val pid = r.getInt(pidIdx)
        if (pid != curPid) { curPid = pid; off = bc.value(pid) }
        val w = r.get(wIdx) match {
          case null      => 0L
          case x: Number => x.longValue()
          case other     => throw new IllegalArgumentException(
            s"non-numeric weight $other")
        }
        if (w < 0) throw new IllegalArgumentException(s"negative weight $w")
        val start = off
        off += w
        if (start + w <= b)
          Some(Row.fromSeq(r.toSeq.patch(pidIdx, Nil, 1) :+ start))
        else None
      }
    }
  }

  /** Per-domain budget selection: [[selectByBudget]] where every value of
    * `groupCol` (a source/domain label) has its OWN token budget — the
    * per-source cap step of corpus curation ("at most B_web web tokens,
    * B_code code tokens, ..."). A doc is kept iff it fits its domain's
    * remaining budget at its position in the domain's (score DESC, id)
    * order; `sel_offset` is the offset within the domain.
    *
    * Scale design: ONE range partitioning over (group, score DESC, id)
    * serves every domain — partitions hold contiguous (group, rank)
    * runs, so the per-(partition, group) totals (<= partitions x domains
    * rows on the driver) give exact per-domain exclusive bases, and the
    * second pass re-seeds its running offset at each group transition.
    * Partitions where EVERY overlapping domain's base is already past its
    * budget are pruned before the second pass.
    */
  /** Waterfill selection: fill a GLOBAL budget with PER-DOMAIN ceilings —
    * the corpus-curation composition "at most C_g tokens of each domain,
    * B tokens overall, best-first". When a domain underflows its ceiling,
    * the unused allowance spills to other domains automatically: stage 1
    * caps each domain at its ceiling (per-domain quality order), stage 2
    * fills the global budget over the survivors in GLOBAL quality order.
    * Deterministic (ties on id), exactly the two-window SQL formulation.
    *
    * Output = input columns + `domain_offset` (exclusive running weight
    * within the domain) + `sel_offset` (exclusive running weight over
    * capped survivors in global order).
    *
    * Scale: two [[selectByBudget]]-shaped passes, each with its own
    * partition pruning — a tight global budget still never reads the dead
    * tail of the capped survivors twice.
    */
  def selectWaterfill(
      df: DataFrame,
      idCol: String,
      groupCol: String,
      scoreCol: String,
      weightCol: String,
      globalBudget: Long,
      ceilings: Map[String, Long],
      defaultCeiling: Long = Long.MaxValue,
      numPartitions: Int = 0,
      reliable: Boolean = false): DataFrame = {
    val capped = selectByBudgetPerGroup(df, idCol, groupCol, scoreCol,
        weightCol, ceilings, defaultCeiling, numPartitions, reliable)
      .withColumnRenamed("sel_offset", "domain_offset")
    selectByBudget(capped, idCol, scoreCol, weightCol, globalBudget,
      numPartitions, reliable)
  }

  def selectByBudgetPerGroup(
      df: DataFrame,
      idCol: String,
      groupCol: String,
      scoreCol: String,
      weightCol: String,
      budgets: Map[String, Long],
      defaultBudget: Long = 0L,
      numPartitions: Int = 0,
      reliable: Boolean = false): DataFrame = {
    require(budgets.values.forall(_ >= 0) && defaultBudget >= 0,
      "budgets must be non-negative")
    // the driver's base table and the executors' running pass must derive
    // the SAME key from a group value; for non-string types the SQL cast
    // and JVM toString disagree (Timestamp, Binary, ...) — domain labels
    // are strings, so require that instead of guessing a rendering. Null
    // groups stay null (covered by defaultBudget), never colliding with a
    // domain literally named "null".
    require(df.schema(groupCol).dataType ==
      org.apache.spark.sql.types.StringType,
      s"groupCol '$groupCol' must be StringType (domain labels); got " +
        df.schema(groupCol).dataType.simpleString)
    val spark = df.sparkSession
    val n =
      if (numPartitions > 0) numPartitions
      else spark.sessionState.conf.numShufflePartitions
    val pidCol = "__cs_pid"
    require(!df.columns.contains(pidCol), s"column $pidCol is reserved")
    if (reliable) require(spark.sparkContext.getCheckpointDir.isDefined,
      "CorpusSelect.selectByBudgetPerGroup(reliable=true) needs " +
        "sparkContext.setCheckpointDir (a fault-tolerant location both passes can re-read)")
    val order: Seq[Column] =
      Seq(col(groupCol).asc, col(scoreCol).desc, col(idCol).asc)
    val staged = df.repartitionByRange(n, order: _*)
      .sortWithinPartitions(order: _*)
      .withColumn(pidCol, spark_partition_id())
    val parted =
      if (reliable) staged.checkpoint(eager = true)
      else staged.localCheckpoint(true)

    // per-(partition, group) totals -> per-group exclusive base at each
    // partition; <= n x |domains| rows of driver state
    val totals = parted
      .groupBy(col(pidCol), col(groupCol))
      .agg(sum(col(weightCol).cast("long")).as("t"))
      .collect()
      .map(r => ((r.getInt(0), r.getString(1)),
        if (r.isNullAt(2)) 0L else r.getLong(2)))
    val tmap = totals.toMap
    val groups = totals.map(_._1._2).distinct
    val base = scala.collection.mutable.Map.empty[(Int, String), Long]
    groups.foreach { g =>
      var acc = 0L
      (0 until n).foreach { p =>
        base((p, g)) = acc
        acc += tmap.getOrElse((p, g), 0L)
      }
    }
    def budgetOf(g: String): Long = budgets.getOrElse(g, defaultBudget)
    // prune: keep a partition iff SOME group present in it still has
    // budget left at this partition's base
    val present = totals.map(_._1).groupBy(_._1).map { case (p, ks) => (p, ks.map(_._2)) }
    val live = (0 until n).filter { p =>
      present.get(p).exists(_.exists(g => base((p, g)) <= budgetOf(g)))
    }.toSet
    val bc = spark.sparkContext.broadcast(base.toMap)
    val bBudgets = spark.sparkContext.broadcast(budgets)
    val dflt = defaultBudget
    val wIdx = parted.schema.fieldIndex(weightCol)
    val gIdx = parted.schema.fieldIndex(groupCol)
    val pidIdx = parted.schema.fieldIndex(pidCol)
    val outSchema = org.apache.spark.sql.types.StructType(
      parted.schema.filterNot(_.name == pidCol))
      .add("sel_offset", LongType, nullable = false)
    selectPass(parted, live, n, outSchema) { rows =>
      var curPid = -1
      var curG: String = null
      var first = true
      var off = 0L
      rows.flatMap { r =>
        val pid = r.getInt(pidIdx)
        val g = r.getString(gIdx) // may be null; keys match the driver's
        if (first || pid != curPid || g != curG) {
          first = false; curPid = pid; curG = g
          off = bc.value.getOrElse((pid, g), 0L)
        }
        val w = r.get(wIdx) match {
          case null      => 0L
          case x: Number => x.longValue()
          case other     => throw new IllegalArgumentException(
            s"non-numeric weight $other")
        }
        if (w < 0) throw new IllegalArgumentException(s"negative weight $w")
        val start = off
        off += w
        if (start + w <= bBudgets.value.getOrElse(g, dflt))
          Some(Row.fromSeq(r.toSeq.patch(pidIdx, Nil, 1) :+ start))
        else None
      }
    }
  }
}
