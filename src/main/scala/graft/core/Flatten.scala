package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.StructType

/** R3: recursive nested-struct flatten to dot-path columns (reference
  * xmlToRows flattening, random/page.tsx:159-166). Pure projection —
  * no shuffle, stays in whole-stage codegen. */
object Flatten {

  def columns(schema: StructType, prefix: String = ""): Seq[(String, Column)] =
    schema.fields.toSeq.flatMap { f =>
      val name = if (prefix.isEmpty) f.name else s"$prefix.${f.name}"
      f.dataType match {
        case st: StructType => columns(st, name)
        case _ => Seq(name -> col(s"`${name.split('.').mkString("`.`")}`").as(name))
      }
    }

  /** Flatten every nested struct; leaf columns named `a.b.c`. */
  def apply(df: DataFrame): DataFrame =
    df.select(columns(df.schema).map(_._2): _*)
}
