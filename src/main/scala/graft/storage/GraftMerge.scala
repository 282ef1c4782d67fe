package graft.storage

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftSqlBridge, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, EqualTo, Expression}
import org.apache.spark.sql.catalyst.plans.logical.{Assignment, DeleteAction, InsertAction, LogicalPlan, MergeIntoTable, SubqueryAlias, UpdateAction}
import org.apache.spark.sql.execution.{LeafExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.functions.col

/** SQL `MERGE INTO` for lake tables — the DML statement a lakehouse SQL
  * user reaches for right after `DELETE FROM` (VERDICT r7 task #4).
  *
  * Spark plans `MergeIntoTable` only for DSv2 tables implementing
  * `SupportsRowLevelOperations` (a full v2 write stack); for everything
  * else the statement survives analysis fully resolved and dies at
  * PHYSICAL PLANNING with UNSUPPORTED_FEATURE.TABLE_OPERATION. That is
  * exactly the seam this strategy fills: it out-plans the built-in
  * strategies (`spark.experimental.extraStrategies` prepends; the
  * extension hook injects ahead too) for merges whose TARGET is a
  * [[GraftSqlTable]], routing the KEYED shapes through the engine's
  * merge-on-read machinery and refusing everything else at planning —
  * the same refuse-at-planning contract the DELETE path keeps.
  *
  * Supported (after Spark's own resolution/alignment):
  *  - `ON t.key = s.key` — one equality between a target and a source
  *    column (the key);
  *  - unconditional `WHEN MATCHED THEN UPDATE SET ...` or
  *    `WHEN MATCHED THEN DELETE` (not both);
  *  - unconditional `WHEN NOT MATCHED THEN INSERT ...`;
  * arbitrary assignment expressions are allowed — `SET *`/`INSERT *`
  * take a no-join fast path. Conditional actions,
  * `WHEN NOT MATCHED BY SOURCE`, multi-column ON, and schema evolution
  * are refused with a clear error.
  *
  * Execution is O(source), never a table rewrite: ONE txn carrying an
  * equality-delete of the source keys plus the replacement/insert batch
  * ([[TxnCatalog.mergeKeyed]]) — a 1 000-row MERGE against a
  * 10 000-partition fact table writes one key list and one batch
  * partition, and the delete-before-data txn rule keeps the appended
  * rows unmasked. MERGE cardinality (multiple source rows per key) is
  * rejected up front, as SQL requires.
  */
object GraftMerge {

  /** Prepend the merge strategy to `spark`'s experimental strategies —
    * the runtime hook for sessions not built with
    * `spark.sql.extensions=graft.GraftExtensions`. Idempotent. */
  def install(spark: SparkSession): Unit = {
    val cur = spark.experimental.extraStrategies
    if (!cur.exists(_.isInstanceOf[GraftMergeStrategy]))
      spark.experimental.extraStrategies = new GraftMergeStrategy +: cur
  }

  private[storage] def unwrap(plan: LogicalPlan): LogicalPlan = plan match {
    case SubqueryAlias(_, child) => unwrap(child)
    case other => other
  }

  /** The lake table under `plan`, when the merge target is ours. The
    * optimizer may already have rewritten the relation into a
    * scan-relation (V2ScanRelationPushDown) by planning time. */
  private[storage] def lakeTarget(plan: LogicalPlan): Option[GraftSqlTable] =
    unwrap(plan) match {
      case r: DataSourceV2Relation => r.table match {
        case t: GraftSqlTable => Some(t)
        case _ => None
      }
      case s: org.apache.spark.sql.execution.datasources.v2
          .DataSourceV2ScanRelation => s.relation.table match {
        case t: GraftSqlTable => Some(t)
        case _ => None
      }
      case _ => None
    }

  private def refuse(why: String): Nothing =
    throw new IllegalArgumentException(
      "graft-lake MERGE INTO supports only the keyed shape " +
        "(ON t.key = s.key, unconditional MATCHED UPDATE/DELETE, " +
        s"unconditional NOT MATCHED INSERT); $why")

  /** Validate + execute the keyed merge (called at execution time). */
  private[storage] def run(spark: SparkSession, target: GraftSqlTable,
      m: MergeIntoTable): Unit = {
    if (m.withSchemaEvolution) refuse("WITH SCHEMA EVOLUTION is not supported")
    if (m.notMatchedBySourceActions.nonEmpty)
      refuse("WHEN NOT MATCHED BY SOURCE is not supported")
    val tOut = m.targetTable.outputSet
    val sOut = m.sourceTable.outputSet
    val (tKey, sKey) = m.mergeCondition match {
      case EqualTo(a: AttributeReference, b: AttributeReference)
          if tOut.contains(a) && sOut.contains(b) => (a, b)
      case EqualTo(a: AttributeReference, b: AttributeReference)
          if tOut.contains(b) && sOut.contains(a) => (b, a)
      case other => refuse(s"ON must be one target-column = source-column " +
        s"equality, got: ${other.sql}")
    }
    m.matchedActions.foreach {
      case UpdateAction(Some(_), _, _) | DeleteAction(Some(_)) =>
        refuse("conditional WHEN MATCHED is not supported")
      case _: UpdateAction | _: DeleteAction => ()
      case other => refuse(s"unsupported MATCHED action: $other")
    }
    m.notMatchedActions.foreach {
      case InsertAction(Some(_), _) =>
        refuse("conditional WHEN NOT MATCHED is not supported")
      case _: InsertAction => ()
      case other => refuse(s"unsupported NOT MATCHED action: $other")
    }
    if (m.matchedActions.size > 1)
      refuse("at most one WHEN MATCHED action is supported")
    if (m.notMatchedActions.size > 1)
      refuse("at most one WHEN NOT MATCHED action is supported")
    val update = m.matchedActions.collectFirst { case u: UpdateAction => u }
    val delete = m.matchedActions.collectFirst { case d: DeleteAction => d }
    val insert = m.notMatchedActions.collectFirst { case i: InsertAction => i }
    if (update.isEmpty && delete.isEmpty && insert.isEmpty)
      refuse("MERGE needs at least one action")

    val srcDf = GraftSqlBridge.ofPlan(spark, m.sourceTable)
    val tgtDf = GraftSqlBridge.ofPlan(spark, m.targetTable)
    val targetAttrs: Seq[Attribute] = m.targetTable.output
    val sKeyCol = GraftSqlBridge.column(sKey)
    val tKeyCol = GraftSqlBridge.column(tKey)

    // SQL MERGE cardinality: a target row matched by >1 source rows is
    // an error — with matched actions present, duplicate source keys
    // would otherwise append twice (one source-sized aggregate)
    if ((update.isDefined || delete.isDefined) &&
        !srcDf.groupBy(sKeyCol).count()
          .filter(col("count") > 1).limit(1).isEmpty)
      throw new IllegalStateException(
        "MERGE_CARDINALITY_VIOLATION: the ON search condition matches " +
          "a single target row with multiple source rows; deduplicate " +
          "the source on the merge key")

    /** Project `df` (carrying both plans' attributes or just the
      * source's) into the TARGET schema: assigned columns take their
      * assignment expression, the rest take `fallback`. */
    def projected(df: DataFrame, assignments: Seq[Assignment],
        fallback: Attribute => Option[Expression]): DataFrame = {
      val byTarget: Map[String, Expression] = assignments.map { a =>
        val name = a.key match {
          case ar: AttributeReference => ar.name
          case other => refuse(s"unsupported assignment key: ${other.sql}")
        }
        name -> a.value
      }.toMap
      df.select(targetAttrs.map { attr =>
        val e = byTarget.get(attr.name).orElse(fallback(attr)).getOrElse(
          refuse(s"no value for target column ${attr.name}"))
        GraftSqlBridge.column(e).cast(attr.dataType).as(attr.name)
      }: _*)
    }

    /** Is every target column assigned exactly the same-named source
      * attribute (`SET *` / `INSERT *` after alignment)? Then the new
      * rows are the source rows — no join needed. */
    def isStarShape(assignments: Seq[Assignment]): Boolean =
      targetAttrs.forall { attr =>
        assignments.exists { a =>
          (a.key, a.value) match {
            case (k: AttributeReference, v: AttributeReference) =>
              k.name == attr.name && v.name == attr.name && sOut.contains(v)
            case _ => false
          }
        }
      }

    val matchedNew: Option[DataFrame] = update.map { u =>
      if (isStarShape(u.assignments))
        // SET *: replacement rows are the MATCHED source rows (semi
        // join on the key — the scan under tgtDf prunes by manifest)
        projected(srcDf.join(tgtDf.select(tKeyCol.as("__mk")).distinct(),
          sKeyCol === col("__mk"), "left_semi"), u.assignments, _ => None)
      else
        // general SET: assignments may read BOTH sides — evaluate on
        // the matched join (attribute ids from both plans are in scope)
        projected(tgtDf.join(srcDf, tKeyCol === sKeyCol, "inner"),
          u.assignments, attr => Some(attr))
    }
    val insertedNew: Option[DataFrame] = insert.map { i =>
      projected(srcDf.join(tgtDf.select(tKeyCol.as("__mk")).distinct(),
        sKeyCol === col("__mk"), "left_anti"), i.assignments, _ => None)
    }
    val append = (matchedNew, insertedNew) match {
      case (Some(a), Some(b)) => Some(a.unionByName(b))
      case (a, b) => a.orElse(b)
    }
    // keys to mask: matched updates/deletes mask the OLD rows; inserts
    // mask nothing. Masking ALL source keys is equivalent (keys absent
    // from the table mask nothing) and costs no target scan.
    val delKeys =
      if (update.isDefined || delete.isDefined)
        Some(srcDf.select(sKeyCol.cast(tKey.dataType).as(tKey.name)))
      else None
    TxnCatalog.mergeKeyed(spark, target.root, target.table, tKey.name,
      delKeys, append, statsColumns = Seq(tKey.name))
    ()
  }
}

/** Planner strategy: claims `MergeIntoTable` over a graft lake target
  * (built-ins would refuse it), validates the keyed shape AT PLANNING,
  * and emits a driver-side command node. */
final class GraftMergeStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case m: MergeIntoTable =>
      GraftMerge.lakeTarget(m.targetTable) match {
        case Some(t) => GraftMergeExec(t, m) :: Nil
        case None => Nil
      }
    case _ => Nil
  }
}

/** Driver-side MERGE command execution (the commit is a driver-side
  * manifest CAS; the data work inside runs as ordinary Spark jobs). */
final case class GraftMergeExec(target: GraftSqlTable, m: MergeIntoTable)
    extends LeafExecNode {
  override def output: Seq[Attribute] = Nil
  override protected def doExecute(): RDD[InternalRow] = {
    GraftMerge.run(session, target, m)
    sparkContext.emptyRDD[InternalRow]
  }
}
