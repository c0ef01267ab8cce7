package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, GraftSqlBridge, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeReference, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{Distribution, OrderedDistribution, Partitioning}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.types.LongType

/** Whole-operator custom plan for the sequential-id mint (G11).
  *
  * The reference's contract (`catalog search/stage4_update_csv.py:500-523`)
  * is "new rows get max(id) + rank in a caller-chosen total order" — an
  * ORDERING contract, not a physical plan. Spark has no operator for
  * "global dense rank without collapsing to one partition":
  * `Window.orderBy` is a single-partition sort, and the previous
  * `RDD.zipWithIndex` formulation paid a full InternalRow→Row→InternalRow
  * encoder round-trip plus the loss of all Tungsten formats.
  *
  * MintRank is the (c)-tier extension from the design brief — a custom
  * `LogicalPlan` + `SparkStrategy` + `SparkPlan`:
  *
  *  - the exec REQUIRES OrderedDistribution(sort) + in-partition ordering,
  *    so EnsureRequirements plants the range exchange + local sort — the
  *    planner, not the operator, owns the physical sort;
  *  - a lightweight first job counts rows per partition (it reads the
  *    exchange's shuffle output, so the second pass shows the map stage as
  *    skipped — single lineage, no divergence hazard);
  *  - the driver prefix-sums K integers and the data pass stamps
  *    `offset + local index` directly onto UnsafeRows (JoinedRow +
  *    UnsafeProjection — no encoder round-trip).
  *
  * Output is bit-identical to the zipWithIndex formulation (spec-pinned)
  * and every stage stays parallel at any scale.
  */
object MintRank {

  /** Logical node: child's rows ranked 1..N in `sortOrder`; output =
    * child.output :+ rank. */
  final case class MintRankLogical(child: LogicalPlan, sortOrder: Seq[SortOrder],
      rankAttr: Attribute) extends UnaryNode {
    override def output: Seq[Attribute] = child.output :+ rankAttr
    // the rank is minted here, not consumed from the child
    override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
      org.apache.spark.sql.catalyst.expressions.AttributeSet(rankAttr :: Nil)
    override protected def withNewChildInternal(newChild: LogicalPlan): LogicalPlan =
      copy(child = newChild)
  }

  /** Planner strategy (injected via extensions or experimental methods). */
  object Strategy extends SparkStrategy {
    override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
      case MintRankLogical(child, sortOrder, rankAttr) =>
        MintRankExec(planLater(child), sortOrder, rankAttr) :: Nil
      case _ => Nil
    }
  }

  final case class MintRankExec(child: SparkPlan, sortOrder: Seq[SortOrder],
      rankAttr: Attribute) extends UnaryExecNode {

    override def output: Seq[Attribute] = child.output :+ rankAttr
    override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
      org.apache.spark.sql.catalyst.expressions.AttributeSet(rankAttr :: Nil)
    override def requiredChildDistribution: Seq[Distribution] =
      Seq(OrderedDistribution(sortOrder))
    override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(sortOrder)
    override def outputOrdering: Seq[SortOrder] = sortOrder
    override def outputPartitioning: Partitioning = child.outputPartitioning

    override lazy val metrics = Map(
      "numOutputRows" -> org.apache.spark.sql.execution.metric.SQLMetrics
        .createMetric(sparkContext, "number of output rows"))

    override protected def doExecute(): RDD[InternalRow] = {
      val numOutputRows = longMetric("numOutputRows")
      val childRdd = child.execute()
      // K integers to the driver — metadata-scale at any data size. This
      // job materializes the required exchange; the data pass below reuses
      // its shuffle files (map stage skipped).
      val counts = childRdd
        .mapPartitions(it => Iterator.single(it.size.toLong),
          preservesPartitioning = true)
        .collect()
      val offsets = counts.scanLeft(0L)(_ + _)
      val outAttrs = output
      childRdd.mapPartitionsWithIndex({ (pid, it) =>
        val joined = new JoinedRow
        val rankRow = new GenericInternalRow(1)
        val project = UnsafeProjection.create(outAttrs, outAttrs)
        var i = offsets(pid)
        it.map { row =>
          i += 1
          numOutputRows += 1
          rankRow.setLong(0, i)
          project(joined(row, rankRow))
        }
      }, preservesPartitioning = true)
    }

    override protected def withNewChildInternal(newChild: SparkPlan): SparkPlan =
      copy(child = newChild)
  }

  /** Make the strategy available in this session (runtime path; the
    * config-time path is GraftExtensions). Idempotent. */
  def install(spark: SparkSession): Unit = {
    val exp = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession].experimental
    if (!exp.extraStrategies.contains(Strategy))
      exp.extraStrategies = exp.extraStrategies :+ Strategy
  }

  /** Rank `df`'s rows 1..N in the total order of `orderCols`, appended as
    * column `rankName`. */
  def withRank(df: DataFrame, orderCols: Seq[String],
      rankName: String = "_rank"): DataFrame = {
    val spark = df.sparkSession
    install(spark)
    val analyzed = df.queryExecution.analyzed
    val sortOrder = orderCols.map { c =>
      val attr = analyzed.output.find(_.name == c).getOrElse(
        throw new IllegalArgumentException(
          s"order column $c not in ${analyzed.output.map(_.name)}"))
      SortOrder(attr, Ascending)
    }
    val rankAttr = AttributeReference(rankName, LongType, nullable = false)()
    GraftSqlBridge.ofRows(spark, MintRankLogical(analyzed, sortOrder, rankAttr))
  }
}
