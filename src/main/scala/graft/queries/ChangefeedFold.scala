package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.spark.{IcebergTable, TableWriter}

/** The keyed incremental-maintenance core shared by every changefeed-fed
  * index in this engine ([[DedupIndex]] on `doc_id`, [[AnnIndex]] on
  * `vec_id`): collapse a changelog window to its net effect per key, then
  * fold it into the target table as ONE equality-delete commit (retract
  * every touched key) plus ONE append commit (freshly derived rows for the
  * net inserts). Both commits are O(changed keys) regardless of corpus
  * size, and the pair is content-idempotent on window re-delivery
  * (retract-then-insert of the net effect lands the same state). */
private[queries] object ChangefeedFold {

  /** Net effect of a changelog window, one row per touched key: the LAST
    * change per key wins (by `_commit_sequence`); within one commit an
    * insert outranks the delete — a CoW rewrite's delete applies to
    * pre-commit rows, so the commit's net state for the key is its
    * inserted version. Collapsing first means a key changed five times in
    * the window derives once, and inserted-then-dropped never touches the
    * index at all. */
  def netEffect(changes: DataFrame, keyCol: String): DataFrame = {
    val rowCols = changes.columns
      .filterNot(_.startsWith("_commit")).filterNot(_ == "_change_type")
    changes.groupBy(keyCol).agg(
      max_by(
        struct(col("_change_type") +: rowCols.map(col).toIndexedSeq: _*),
        struct(col("_commit_sequence"),
          (col("_change_type") === "insert").cast("int"))).as("_n"))
      .select("_n.*")
  }

  /** Stage one changelog window onto a REST transaction instead of
    * committing it: the same retract-touched + append-derived math as
    * [[applyChanges]], landed as ONE staged retract-and-replace snapshot
    * (the equality delete applies only to strictly smaller sequence
    * numbers, so the staged rows are exempt — one snapshot where the local
    * path takes two). Returns false when the window is empty (nothing
    * staged). Composed with a staged source-table change in the same
    * transaction, corpus and index move in lockstep or not at all. */
  def stageChanges(tx: TableWriter.RestTransaction, indexIdent: Seq[String],
                   changes: DataFrame, keyCol: String,
                   derive: DataFrame => DataFrame): Boolean = {
    val net = netEffect(changes, keyCol).persist()
    try {
      if (net.isEmpty) false
      else {
        val ins = net.filter(col("_change_type") === "insert")
        tx.stageReplaceEquality(indexIdent, net.select(keyCol), Seq(keyCol),
          derive(ins))
        true
      }
    } finally { net.unpersist(); () }
  }

  /** Apply one changelog window (batch or micro-batch) to `target`:
    * retract-all-touched (fresh inserts retract vacuously — that is what
    * keeps the commit pair idempotent), then append `derive(netInserts)`. */
  def applyChanges(target: IcebergTable, changes: DataFrame, keyCol: String,
                   derive: DataFrame => DataFrame): IcebergTable = {
    val net = netEffect(changes, keyCol).persist()
    try {
      if (net.isEmpty) target
      else {
        val afterRetract =
          TableWriter.deleteEquality(target, net.select(keyCol), Seq(keyCol))
        val ins = net.filter(col("_change_type") === "insert")
        if (ins.isEmpty) afterRetract
        else TableWriter.append(afterRetract, derive(ins))
      }
    } finally { net.unpersist(); () }
  }
}
