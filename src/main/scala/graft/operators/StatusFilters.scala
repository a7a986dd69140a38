package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** P9: the six status filters over (delayed_mode × completed × orphaned)
  * (/root/reference/gdutils/apis/filters.py:7-160).
  *
  * The reference writes six near-identical functions; here one predicate
  * builder covers all of them. Note: the reference's required-column check
  * is dead code (`had_required` typo, filters.py:22) — not replicated.
  * Predicates are plain Column conjunctions ⇒ pushed to the source scan.
  */
object StatusFilters {

  /** Core predicate: match delayed_mode and (unless dmOnly) completed;
    * orphaned rows excluded unless includeOrphaned. Null flags are treated
    * as false (the reference force-fills NA flags to False,
    * /root/reference/gdutils/__init__.py:916-917). */
  private def flag(c: String): Column = coalesce(col(c), lit(false))

  def statusPredicate(delayedMode: Boolean, completed: Option[Boolean],
                      includeOrphaned: Boolean): Column = {
    val base = flag("delayed_mode") === lit(delayedMode)
    val withCompleted = completed match {
      case Some(b) => base && flag("completed") === lit(b)
      case None => base
    }
    if (includeOrphaned) withCompleted
    else withCompleted && !flag("orphaned")
  }

  def realTime(df: DataFrame, includeOrphaned: Boolean = false): DataFrame =
    df.where(statusPredicate(delayedMode = false, None, includeOrphaned))
  def delayedMode(df: DataFrame, includeOrphaned: Boolean = false): DataFrame =
    df.where(statusPredicate(delayedMode = true, None, includeOrphaned))
  def realTimeActive(df: DataFrame, includeOrphaned: Boolean = false): DataFrame =
    df.where(statusPredicate(delayedMode = false, Some(false), includeOrphaned))
  def realTimeInactive(df: DataFrame, includeOrphaned: Boolean = false): DataFrame =
    df.where(statusPredicate(delayedMode = false, Some(true), includeOrphaned))
  def delayedModeActive(df: DataFrame, includeOrphaned: Boolean = false): DataFrame =
    df.where(statusPredicate(delayedMode = true, Some(false), includeOrphaned))
  def delayedModeInactive(df: DataFrame, includeOrphaned: Boolean = false): DataFrame =
    df.where(statusPredicate(delayedMode = true, Some(true), includeOrphaned))
}
