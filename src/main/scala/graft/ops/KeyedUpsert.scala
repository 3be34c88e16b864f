package graft.ops

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.functions._

/** K8: Firestore-style keyed write semantics as batch DataFrame ops
  * (reference setDoc/updateDoc/deleteDoc, admin/page.tsx:176-198,
  * saveUser.ts:34-78). Modeled as overwrite-by-key merge: updates win
  * over existing rows on the key; `merge` semantics keep existing
  * values where the update is null (setDoc merge:true).
  *
  * Scale shape: a full-outer join keyed on the document id — the same
  * sort-merge plan as Compare; at 100 TB this is the standard
  * copy-on-write merge pattern.
  */
object KeyedUpsert {

  /** Plain upsert: update row replaces existing row wholesale. */
  def upsert(existing: DataFrame, updates: DataFrame, key: String): DataFrame = {
    val cols = existing.columns
    val e = existing.as("e")
    val u = updates.as("u")
    e.join(u, col(s"e.$key") === col(s"u.$key"), "full_outer")
      .select(cols.map { c =>
        when(col(s"u.$key").isNotNull, col(s"u.$c")).otherwise(col(s"e.$c")).as(c)
      }.toSeq: _*)
  }

  /** setDoc(merge:true): null cells in the update keep existing values. */
  def upsertMerge(existing: DataFrame, updates: DataFrame, key: String): DataFrame = {
    val cols = existing.columns
    val e = existing.as("e")
    val u = updates.as("u")
    e.join(u, col(s"e.$key") === col(s"u.$key"), "full_outer")
      .select(cols.map { c =>
        (if (c == key) coalesce(col(s"u.$key"), col(s"e.$key"))
         else coalesce(col(s"u.$c"), col(s"e.$c"))).as(c)
      }.toSeq: _*)
  }

  /** deleteDoc: anti-join on the key. */
  def delete(existing: DataFrame, keys: DataFrame, key: String): DataFrame =
    existing.join(keys.select(col(key)), Seq(key), "left_anti")
}
