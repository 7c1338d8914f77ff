package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.spark.{IcebergTable, IcebergTables, TableWriter}
import graft.streaming.Changelog
import graft.tables.Tables

/** Incrementally-maintained JOIN materialized view — [[MatView]]'s
  * discipline extended from one source table to a two-table equi-join,
  * the classic incremental-view-maintenance (IVM) delta algebra made
  * Iceberg-native:
  *
  *   Δ(O ⋈ L) = ΔO ⋈ L_new  ∪  O_old ⋈ ΔL        (signed multisets)
  *
  * because O_new⋈L_new − O_old⋈L_old
  *       = (O_old+ΔO)⋈L_new − O_old⋈L_old
  *       = ΔO⋈L_new + O_old⋈(L_new−L_old).
  *
  * The two relations the algebra needs beyond the deltas — the OTHER
  * table's old and new states — are exactly what an Iceberg table gives
  * for free: `L_new` is the current snapshot, `O_old` is a TIME-TRAVEL
  * scan at the view's per-source watermark snapshot. No shadow copies, no
  * operator state: the table format IS the IVM state store.
  *
  * Cost shape: ΔO and ΔL are changelog windows (O(changed rows)); each
  * delta side is broadcast into an equi-join on the join key against the
  * other table's scan, so maintenance reads O(changed + matching) rows —
  * never a full O⋈L recomputation. The merge back into the view is
  * [[TableWriter.replaceEquality]]: ONE atomic commit retracting exactly
  * the touched group keys, appending their merged rows, and advancing
  * BOTH source watermarks in the same metadata swap — exactly-once with
  * or without re-delivery, O(touched groups) regardless of view size.
  *
  * All measures are integers (row count, quantity sum — `l_quantity` is
  * integral in the TPC-H data), so the incremental merge is exact and the
  * battery can hash-compare maintained vs from-scratch.
  *
  * Reference scope note: the reference (a metadata-plane Go client) has
  * no materialized-view surface; this module is engine-native
  * functionality layered on the same commit machinery the reference
  * stubs ("Writing is WIP", cmd/icegopher/main.go:314).
  */
object JoinView {

  /** The maintained join-aggregate: per customer, how many lineitems and
    * how much quantity their orders carry (orders ⋈ lineitem on
    * orderkey, grouped by custkey). */
  def aggregate(orders: DataFrame, lineitem: DataFrame): DataFrame =
    orders.select(col("o_orderkey"), col("o_custkey"))
      .join(lineitem.select(col("l_orderkey"),
        col("l_quantity").cast("long").as("qty")),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy("o_custkey")
      .agg(count(lit(1)).as("items"), sum(col("qty")).as("qty"))

  /** Per-source watermark properties: the snapshot id of each source
    * already folded into the view. Time travel to these ids reconstructs
    * the exact pre-window states the delta algebra needs. */
  val OrdersSnapProp = "graft.jv.orders-snapshot"
  val LineitemSnapProp = "graft.jv.lineitem-snapshot"

  /** Bootstrap: full join-aggregate into a new view table, watermarked at
    * both sources' current snapshots. */
  def build(orders: IcebergTable, lineitem: IcebergTable, location: String,
            s: SparkSession): IcebergTable =
    TableWriter.create(
      aggregate(orders.newScan().toDF(s), lineitem.newScan().toDF(s)),
      location,
      properties = Map(
        OrdersSnapProp -> orders.currentSnapshot.get.snapshotId.toString,
        LineitemSnapProp -> lineitem.currentSnapshot.get.snapshotId.toString))

  private def sgn = when(col("_change_type") === "insert", lit(1L))
    .otherwise(lit(-1L))

  /** The signed per-group deltas of one maintenance window — the IVM
    * algebra above, as two broadcast equi-joins. Returns
    * (o_custkey, d_items, d_qty), all-zero groups dropped. */
  private[queries] def deltas(s: SparkSession,
                              orders: IcebergTable, ordersSnap: Long,
                              lineitem: IcebergTable, lineitemSnap: Long)
      : DataFrame = {
    val dO = Changelog.changelogDF(s, orders, Some(ordersSnap))
      .select(col("o_orderkey"), col("o_custkey"), sgn.as("s"))
    val dL = Changelog.changelogDF(s, lineitem, Some(lineitemSnap))
      .select(col("l_orderkey"), col("l_quantity").cast("long").as("qty"),
        sgn.as("s"))
    // ΔO ⋈ L_new: the delta side is the small side — broadcast it
    val lNew = lineitem.newScan().toDF(s)
      .select(col("l_orderkey"), col("l_quantity").cast("long").as("qty"))
    val term1 = lNew.join(broadcast(dO),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey"), col("s"), col("qty"))
    // O_old ⋈ ΔL: time travel to the watermark snapshot
    val oOld = orders.newScan(snapshotId = Some(ordersSnap)).toDF(s)
      .select(col("o_orderkey"), col("o_custkey"))
    val term2 = oOld.join(broadcast(dL),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey"), col("s"), col("qty"))
    term1.unionByName(term2)
      .groupBy("o_custkey")
      .agg(sum(col("s")).as("d_items"), sum(col("s") * col("qty")).as("d_qty"))
      .filter(col("d_items") =!= 0 || col("d_qty") =!= 0)
  }

  /** Fold everything committed to either source since the watermarks into
    * the view, in ONE atomic commit (retract touched custkeys + append
    * merged rows + advance both watermarks). No-op when neither source
    * moved. */
  def applyChanges(view: IcebergTable, orders: IcebergTable,
                   lineitem: IcebergTable, s: SparkSession): IcebergTable = {
    val oSnap = view.properties.get(OrdersSnapProp).flatMap(_.toLongOption)
      .getOrElse(throw new IllegalStateException(
        s"view ${view.location} missing $OrdersSnapProp"))
    val lSnap = view.properties.get(LineitemSnapProp).flatMap(_.toLongOption)
      .getOrElse(throw new IllegalStateException(
        s"view ${view.location} missing $LineitemSnapProp"))
    val oHead = orders.currentSnapshot.get.snapshotId
    val lHead = lineitem.currentSnapshot.get.snapshotId
    if (oHead == oSnap && lHead == lSnap) view
    else {
      val dl = deltas(s, orders, oSnap, lineitem, lSnap).persist()
      try {
        val touched = dl.select("o_custkey")
        val current = view.newScan().toDF(s)
          .join(touched, Seq("o_custkey"), "left_semi")
        val merged = current.join(dl, Seq("o_custkey"), "full_outer")
          .select(col("o_custkey"),
            (coalesce(col("items"), lit(0L)) +
              coalesce(col("d_items"), lit(0L))).as("items"),
            (coalesce(col("qty"), lit(0L)) +
              coalesce(col("d_qty"), lit(0L))).as("qty"))
          .filter(col("items") > 0)
        TableWriter.replaceEquality(view, touched, Seq("o_custkey"), merged,
          Map(OrdersSnapProp -> oHead.toString,
            LineitemSnapProp -> lHead.toString))
      } finally { dl.unpersist(); () }
    }
  }

  /** REST-transactional sync: the same merge staged onto `tx` as one
    * retract-and-replace snapshot carrying both watermarks — the view
    * moves in lockstep with whatever else the transaction stages, or not
    * at all. Returns false when neither source moved. */
  def stageChanges(tx: graft.spark.TableWriter.RestTransaction,
                   catalog: graft.catalog.RestCatalog, viewIdent: Seq[String],
                   orders: IcebergTable, lineitem: IcebergTable,
                   s: SparkSession): Boolean = {
    val view = TableWriter.restTableOf(catalog.loadTable(viewIdent))
    val oSnap = view.properties.get(OrdersSnapProp).flatMap(_.toLongOption)
      .getOrElse(throw new IllegalStateException(
        s"view $viewIdent missing $OrdersSnapProp"))
    val lSnap = view.properties.get(LineitemSnapProp).flatMap(_.toLongOption)
      .getOrElse(throw new IllegalStateException(
        s"view $viewIdent missing $LineitemSnapProp"))
    val oHead = orders.currentSnapshot.get.snapshotId
    val lHead = lineitem.currentSnapshot.get.snapshotId
    if (oHead == oSnap && lHead == lSnap) false
    else {
      val dl = deltas(s, orders, oSnap, lineitem, lSnap).persist()
      try {
        val touched = dl.select("o_custkey")
        val current = view.newScan().toDF(s)
          .join(touched, Seq("o_custkey"), "left_semi")
        val merged = current.join(dl, Seq("o_custkey"), "full_outer")
          .select(col("o_custkey"),
            (coalesce(col("items"), lit(0L)) +
              coalesce(col("d_items"), lit(0L))).as("items"),
            (coalesce(col("qty"), lit(0L)) +
              coalesce(col("d_qty"), lit(0L))).as("qty"))
          .filter(col("items") > 0)
        tx.stageReplaceEquality(viewIdent, touched, Seq("o_custkey"), merged,
          Map(OrdersSnapProp -> oHead.toString,
            LineitemSnapProp -> lHead.toString))
        true
      } finally { dl.unpersist(); () }
    }
  }

  // ------------------------------------------------------------- battery

  /** mv02 fixture: orders + lineitem as Graft tables, view built at the
    * initial commit, then BOTH sources mutated — late-arriving lineitems
    * (append), a CoW quantity update, an orders delete AND a lineitem
    * delete — and the view synced ONCE over the combined multi-commit
    * window, exercising both delta terms and their interplay. */
  private def mv02Fixture(s: SparkSession, d: String): IcebergTable = {
    val root =
      s"${IcebergOps.cacheRoot}/${d.replaceAll("[^A-Za-z0-9]", "_")}/mv02"
    val ordersLoc = s"$root/orders"
    val lineitemLoc = s"$root/lineitem"
    val viewLoc = s"$root/view"
    IcebergOps.provisionOnce(new java.io.File(root)) {
      val oSrc = Tables.orders(s, d)
        .select("o_orderkey", "o_custkey", "o_orderstatus")
      val lSrc = Tables.lineitem(s, d)
        .select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey",
          "l_quantity")
      val o1 = TableWriter.create(oSrc, ordersLoc)
      val l1 = TableWriter.create(lSrc.filter(col("l_linenumber") <= 4),
        lineitemLoc)
      val v0 = build(o1, l1, viewLoc, s)
      // late-arriving lineitems
      val l2 = TableWriter.append(l1, lSrc.filter(col("l_linenumber") > 4))
      // CoW quantity correction
      val l3 = TableWriter.updateWhere(l2, s, col("l_partkey") % 10 === 0,
        Map("l_quantity" -> (col("l_quantity") + lit(5.0))))
      // customers leave ...
      val o2 = TableWriter.deleteWhere(o1, s, col("o_custkey") % 50 === 0)
      // ... and a supplier's lines are recalled
      val l4 = TableWriter.deleteWhere(l3, s, col("l_suppkey") % 25 === 3)
      applyChanges(v0, o2, l4, s)
      ()
    }
    IcebergTables.load(viewLoc)
  }

  /** Battery entry mv02: read the incrementally-maintained join view.
    * The oracle joins and aggregates the equivalent FINAL source states
    * from the raw parquet, so a hash match proves maintained ≡
    * from-scratch across appends, updates and deletes on BOTH join
    * sides. */
  def mv02IncrementalJoin(s: SparkSession, d: String): DataFrame =
    mv02Fixture(s, d).newScan().toDF(s)
      .select("o_custkey", "items", "qty")
      .orderBy("o_custkey")

  val mv02Sql: String =
    """SELECT o_custkey, COUNT(*) AS items,
              CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
       FROM (SELECT o_orderkey, o_custkey FROM orders
             WHERE o_custkey % 50 <> 0) o
       JOIN (SELECT l_orderkey,
                    CASE WHEN l_partkey % 10 = 0 THEN l_quantity + 5
                         ELSE l_quantity END AS l_quantity
             FROM lineitem WHERE l_suppkey % 25 <> 3) l
         ON o.o_orderkey = l.l_orderkey
       GROUP BY o_custkey ORDER BY o_custkey"""
}
