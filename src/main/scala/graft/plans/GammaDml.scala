package graft.plans

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.functions.{coalesce, col, lit}
import org.apache.spark.sql.graft.Bridge

import graft.sources.GammaSqlTable
import graft.table.GammaTable

/** SQL `UPDATE` / `MERGE INTO` / predicate-`DELETE` for gamma tables — the
  * row-level write surface of the reference's AddOrUpdate/Delete verbs
  * (search/gamma_engine.cc:761-800, 802-949) completed in pure SQL.
  *
  * Mechanism: an analyzer rule converts the resolved `UpdateTable` /
  * `MergeIntoTable` / `DeleteFromTable` plans over a gamma DSv2 relation
  * into runnable commands that route through [[GammaTable]]'s existing
  * transactional write path (merge-join upsert + manifest swap). This is
  * the extension-rule shape Delta Lake ships UPDATE/MERGE with: the
  * alternative — DSv2 `SupportsRowLevelOperations` — forces a
  * per-task `BatchWrite` reimplementation of the bucket writer, while
  * here executors still do all row work (scan, join, parquet write)
  * through the same plan `addOrUpdate` always runs; only the commit
  * orchestration stays on the driver, exactly as it does for every other
  * write verb.
  *
  * Scale shape: `UPDATE` ships a NARROW delta — only the key and the
  * assigned columns are selected from the matched scan (so a
  * metadata-only `UPDATE ... SET` never reads the vector column; the
  * preserved fields ride the merge join inside `addOrUpdate` from the
  * bucket files it must rewrite anyway), and the `WHERE` pushes into the
  * gamma scan (bucket pruning applies). `MERGE` joins source against the
  * target scan once per action class; its updates are full-width because
  * the same delta batch may carry inserts (a present-null must not
  * clobber a preserved field).
  */
object GammaDml {

  /** The gamma relation under optional aliases, refusing snapshots. */
  private[plans] def gammaRel(p: LogicalPlan): Option[DataSourceV2Relation] =
    p match {
      case r: DataSourceV2Relation =>
        r.table match {
          case g: GammaSqlTable =>
            g.asOf.foreach(v => throw new UnsupportedOperationException(
              s"gamma: cannot write to a snapshot (VERSION AS OF $v)"))
            Some(r)
          case _ => None
        }
      case SubqueryAlias(_, child) => gammaRel(child)
      // a `USING gamma` temp view resolves as View(name, [output], relation)
      case v: View => gammaRel(v.child)
      case _ => None
    }

  private[plans] def rootOf(rel: DataSourceV2Relation): String =
    rel.table.asInstanceOf[GammaSqlTable].root
}

/** Analyzer rule: resolved row-level SQL over a gamma relation becomes a
  * gamma command. Injected via [[GraftSparkExtensions]]
  * (`spark.sql.extensions=graft.plans.GraftSparkExtensions`); it runs in
  * the main resolution batch, so the conversion happens before Spark's
  * own row-level-operation rewrites would reject the table.
  */
case class GammaDmlRewrite(spark: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = {
    plan.resolveOperatorsDown {
      case u @ UpdateTable(table, assignments, condition)
          if u.childrenResolved && assignments.forall(_.resolved) &&
            condition.forall(_.resolved) =>
        GammaDml.gammaRel(table)
          .map(rel => GammaUpdateCommand(rel,
            condition.map(Filter(_, table)).getOrElse(table), assignments))
          .getOrElse(u)

      case m: MergeIntoTable if m.childrenResolved && m.resolved =>
        GammaDml.gammaRel(m.targetTable)
          .map { rel =>
            if (m.withSchemaEvolution)
              throw new UnsupportedOperationException(
                "gamma MERGE: WITH SCHEMA EVOLUTION is not supported — a " +
                  "delta with new columns already unions in through " +
                  "INSERT INTO / addOrUpdate")
            GammaMergeCommand(rel, m.sourceTable, m.mergeCondition,
              m.matchedActions, m.notMatchedActions, m.notMatchedBySourceActions)
          }
          .getOrElse(m)

      // DELETE with predicates SupportsDelete cannot translate (subqueries,
      // expressions over vector columns): route through deleteByQuery via
      // the relation scan. Simple filters keep taking the pushed
      // SupportsDelete path (this rule only sees what that path would
      // otherwise refuse at runtime — converting here is strictly wider).
      case d @ DeleteFromTable(table, condition)
          if d.childrenResolved && condition.resolved &&
            SubqueryExpression.hasSubquery(condition) =>
        GammaDml.gammaRel(table)
          .map(rel => GammaDeleteCommand(rel, Filter(condition, table)))
          .getOrElse(d)
    }
  }
}

/** `UPDATE t SET c = expr, ... WHERE p` — a narrow-delta field patch:
  * reads (key, assigned exprs) for matched rows and upserts; omitted
  * columns are preserved by `addOrUpdate`'s field-patch merge.
  */
case class GammaUpdateCommand(
    rel: DataSourceV2Relation,
    // the filtered target as a PLAN field (not an Expression): a WHERE
    // with an IN/EXISTS subquery is only legal inside a Filter node, so
    // carrying the raw condition would trip checkAnalysis on the command
    matched: LogicalPlan,
    assignments: Seq[Assignment]) extends LeafRunnableCommand {

  override def run(session: SparkSession): Seq[Row] = {
    val t = GammaTable.load(session, GammaDml.rootOf(rel))
    val key = t.meta.keyField
    val sets: Seq[(String, Column)] = assignments.map { a =>
      a.key match {
        case ar: AttributeReference =>
          require(ar.name != key,
            s"gamma UPDATE cannot reassign the table key '$key' — a key " +
              "change is DELETE + INSERT (docs are addressed by key)")
          require(ar.name != GammaTable.DocidCol,
            s"gamma UPDATE cannot assign the storage docid ('${ar.name}')")
          ar.name -> Bridge.column(a.value)
        case other => throw new UnsupportedOperationException(
          "gamma UPDATE supports top-level column assignments only, got " +
            other.sql)
      }
    }
    // simultaneous-assignment semantics: every RHS sees ORIGINAL values
    // (a single select, not chained withColumn)
    val delta = Bridge.ofRows(session, matched).select(
      (col(key) +: sets.map { case (c, v) => v.as(c) }): _*)
    t.addOrUpdate(delta)
    Nil
  }
}

/** `DELETE FROM t WHERE p` for predicates the pushed `SupportsDelete`
  * path cannot express (subqueries). Matched keys stay distributed —
  * `GammaTable.delete` routes them by bucket hash.
  */
case class GammaDeleteCommand(
    rel: DataSourceV2Relation,
    matched: LogicalPlan) extends LeafRunnableCommand {

  override def run(session: SparkSession): Seq[Row] = {
    val t = GammaTable.load(session, GammaDml.rootOf(rel))
    t.delete(Bridge.ofRows(session, matched).select(t.meta.keyField))
    Nil
  }
}

/** `MERGE INTO target USING source ON cond ...` with first-true action
  * semantics per SQL: matched UPDATE/DELETE, not-matched INSERT,
  * not-matched-by-source UPDATE/DELETE. A target row matched by more than
  * one source row is a cardinality violation (checked, loud error — the
  * standard's behavior, and Spark's). Upserts and deletes land as (at
  * most) two commits: all UPDATE/INSERT rows in one `addOrUpdate` batch,
  * all DELETE keys in one `delete`.
  */
case class GammaMergeCommand(
    rel: DataSourceV2Relation,
    source: LogicalPlan,
    mergeCondition: Expression,
    matchedActions: Seq[MergeAction],
    notMatchedActions: Seq[MergeAction],
    notMatchedBySourceActions: Seq[MergeAction]) extends LeafRunnableCommand {

  override def run(session: SparkSession): Seq[Row] = {
    val t = GammaTable.load(session, GammaDml.rootOf(rel))
    val key = t.meta.keyField
    val target = Bridge.ofRows(session, rel)
    val src = Bridge.ofRows(session, source)
    val cond = Bridge.column(mergeCondition)
    // disambiguation: every target column reference below goes through the
    // relation's ATTRIBUTES (exprId-exact), never by name — target and
    // source may share column names
    val tAttr: Map[String, Column] =
      rel.output.map(a => a.name -> Bridge.column(a)).toMap
    val dataCols = rel.output.map(_.name)
      .filterNot(_ == GammaTable.DocidCol)

    // matched pairs, materialized once: read by the cardinality check and
    // every matched action split
    val joined = target.join(src, cond, "inner")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      if (matchedActions.nonEmpty &&
          joined.groupBy(tAttr(key)).count()
            .filter(col("count") > 1).limit(1).count() > 0)
        throw new IllegalStateException(
          "gamma MERGE cardinality violation: a target row matched more " +
            "than one source row (make the ON condition key-unique)")

      // first-true action split: action i applies where its condition is
      // true and no EARLIER condition was (null-safe — a null condition
      // does not fire and does not block later actions)
      def splits(rows: DataFrame, actions: Seq[MergeAction]): Seq[(MergeAction, DataFrame)] = {
        val conds = actions.map(_.condition.map(Bridge.column).getOrElse(lit(true)))
        actions.zipWithIndex.map { case (a, i) =>
          val mine = coalesce(conds(i), lit(false))
          val gate = conds.take(i).foldLeft(mine) { (acc, earlier) =>
            acc && !coalesce(earlier, lit(false))
          }
          (a, rows.filter(gate))
        }
      }

      /** Full-width row build: every data column, assigned value where the
        * action provides one, carried target value otherwise (for insert
        * rows there is no target — absent columns become typed nulls).
        * An assignment to `_docid` (star expansion covers the exposed
        * docid; the source must carry one) is storage-ignored — the
        * table assigns docids.
        */
      def assignedRows(rows: DataFrame, assignments: Seq[Assignment],
          carryTarget: Boolean): DataFrame = {
        val byName: Map[String, Column] = assignments.map { a =>
          a.key match {
            case ar: AttributeReference => ar.name -> Bridge.column(a.value)
            case other => throw new UnsupportedOperationException(
              "gamma MERGE supports top-level column assignments only, " +
                s"got ${other.sql}")
          }
        }.toMap
        val schema = rel.schema
        rows.select(dataCols.map { c =>
          byName.get(c)
            .orElse(if (carryTarget) Some(tAttr(c)) else None)
            .getOrElse(lit(null).cast(schema(c).dataType))
            .as(c)
        }: _*)
      }

      def actionFrames(rows: DataFrame, actions: Seq[MergeAction],
          carryTarget: Boolean): (Seq[DataFrame], Seq[DataFrame]) = {
        val ups = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
        val dels = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
        splits(rows, actions).foreach {
          case (UpdateAction(_, as, _), df) =>
            // a key "assignment" is legal only as identity (UPDATE SET *
            // expands one from the ON equality): verify it changes no
            // key, then carry the TARGET key — a real key change is
            // DELETE + INSERT, not an in-place update
            val keyAssign = as.collectFirst {
              case a if a.key.isInstanceOf[AttributeReference] &&
                a.key.asInstanceOf[AttributeReference].name == key => a.value
            }
            if (carryTarget) keyAssign.foreach { kv =>
              val changed = df.filter(
                !(Bridge.column(kv) <=> tAttr(key))).limit(1).count()
              require(changed == 0,
                s"gamma MERGE cannot reassign the table key '$key' — a key " +
                  "change is DELETE + INSERT (docs are addressed by key)")
            }
            val effective = as.filterNot(a =>
              a.key.isInstanceOf[AttributeReference] &&
                a.key.asInstanceOf[AttributeReference].name == key && carryTarget)
            ups += assignedRows(df, effective, carryTarget)
          case (InsertAction(_, as), df) => ups += assignedRows(df, as, carryTarget = false)
          case (DeleteAction(_), df) => dels += df.select(tAttr(key).as(key))
          case (other, _) => throw new UnsupportedOperationException(
            s"gamma MERGE: unsupported action ${other.getClass.getSimpleName}")
        }
        (ups.toSeq, dels.toSeq)
      }

      val (mUps, mDels) = actionFrames(joined, matchedActions, carryTarget = true)
      val srcOnly =
        if (notMatchedActions.isEmpty) None
        else Some(src.join(target, cond, "left_anti"))
      val (iUps, _) = srcOnly.map(actionFrames(_, notMatchedActions,
        carryTarget = false)).getOrElse((Nil, Nil))
      // not-matched-by-source frames MUST bind to the PRE-merge snapshot:
      // their delete step runs AFTER the upsert batch commits, and with a
      // non-key ON condition a matched UPDATE can make freshly-updated
      // rows "not matched by source" in the post-commit state. The
      // snapshot must be DURABLE, not cached (r13 advisory): persist()
      // pins only cached blocks, and an executor lost after the upsert
      // commits would recompute the left_anti from LINEAGE against the
      // post-commit table — silently deleting the wrong rows. So the
      // fully-evaluated action frames (plain named columns — the raw
      // left_anti can't snapshot, its consumers are exprId-bound to the
      // live relation) go through a temp parquet write + re-read, which
      // severs the lineage for good; the directory dies in the finally.
      // lives under the TABLE root, not a driver-local temp dir — on a
      // real cluster the snapshot must sit on the shared filesystem the
      // executors read
      // ... and the same hazard holds for MATCHED deletes: mDels binds to
      // the persist()ed `joined`, but t.delete runs AFTER the upsert batch
      // commits — lost cache blocks would recompute the inner join against
      // the post-commit table, where freshly-updated rows match
      // differently. Every delete frame consumed post-commit gets pinned.
      val snapDir =
        if (notMatchedBySourceActions.isEmpty && mDels.isEmpty) None
        else Some(s"${GammaDml.rootOf(rel)}/.merge_snap_${java.util.UUID.randomUUID}")
      try {
        def pin(dir: String, frames: Seq[DataFrame], tag: String): Seq[DataFrame] =
          frames.zipWithIndex.map { case (f, i) =>
            val p = s"$dir/${tag}_$i"
            f.write.mode("overwrite").parquet(p)
            session.read.parquet(p)
          }
        val (nUps, nDels) = (snapDir, notMatchedBySourceActions) match {
          case (Some(dir), as) if as.nonEmpty =>
            val tgtOnly = target.join(src, cond, "left_anti")
            val (ups0, dels0) = actionFrames(tgtOnly, as, carryTarget = true)
            (pin(dir, ups0, "ups"), pin(dir, dels0, "dels"))
          case _ => (Nil, Nil)
        }
        val mDelsPinned =
          if (mDels.isEmpty) Nil else pin(snapDir.get, mDels, "mdels")

        (mUps ++ iUps ++ nUps).reduceOption(_.unionByName(_))
          .foreach(t.addOrUpdate(_))
        (mDelsPinned ++ nDels).reduceOption(_.unionByName(_))
          .foreach(t.delete)
      } finally snapDir.foreach { dir =>
        val p = new org.apache.hadoop.fs.Path(dir)
        p.getFileSystem(session.sessionState.newHadoopConf()).delete(p, true)
      }
      Nil
    } finally joined.unpersist(false)
  }
}
