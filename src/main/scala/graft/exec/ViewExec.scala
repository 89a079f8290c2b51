package graft.exec

import graft.model._
import graft.sources.SourceReader
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** RML-LV logical views (SURVEY §2.10, V1-V5): a derived source built from
  * field projections, iterable-field explosion (with `field.#` positional
  * index), JSON flattening, view-on-view chaining, and inner/left view joins
  * (reference: lv_functions.py:271-551).
  */
object ViewExec {

  def compile(spark: SparkSession, view: LogicalSource.ViewSource,
      registry: Map[String, LogicalSource.ViewSource] = Map.empty): DataFrame = {
    val base = SourceReader.read(spark, view.base)
    var df = projectFields(base, view.fields)
    view.joins.foreach { vj =>
      val parentView = registry.getOrElse(vj.parentView,
        throw new IllegalArgumentException(s"unknown parent view: ${vj.parentView}"))
      val pdf0 = compile(spark, parentView, registry)
      // prefix parent columns to avoid collisions, then join on the condition
      val pdf = pdf0.columns.foldLeft(pdf0)((d, c) => d.withColumnRenamed(c, s"__p_$c"))
      val cond = vj.childAttrs.zip(vj.parentAttrs).map { case (c, p) =>
        df(c).cast("string") === pdf(s"__p_$p").cast("string")
      }.reduce(_ && _)
      val joined = df.join(pdf, cond, if (vj.kind == "left") "left" else "inner")
      // expose parent fields under their view names (left join → null fields,
      // reference: lv_functions.py:346-397)
      df = pdf0.columns.foldLeft(joined)((d, c) =>
        if (d.columns.contains(c)) d else d.withColumnRenamed(s"__p_$c", c))
      df = df.drop(df.columns.filter(_.startsWith("__p_")): _*)
    }
    df
  }

  /** V1/V2/V3: project each declared field; iterable fields explode with a
    * positional `name.#` column; embedded payloads (JSON-in-CSV / CSV-in-JSON)
    * parse with from_json/from_csv.
    */
  def projectFields(base: DataFrame, fields: List[ViewField]): DataFrame = {
    var df = base
    fields.foreach { f =>
      f.iterator match {
        case Some(_) =>
          // iterable field: one row per element + index column "name.#"
          val arrCol = resolveRef(df, f.reference.getOrElse(f.name))
          df = df.select(col("*"), posexplode(arrCol).as(Seq(s"${f.name}.#", "__elem")))
          df =
            if (f.innerFields.isEmpty) df.withColumnRenamed("__elem", f.name)
            else f.innerFields.foldLeft(df) { (d, inf) =>
              d.withColumn(inf.name, resolveOn(col("__elem"), inf.reference.getOrElse(inf.name)))
            }.drop("__elem")
        case None =>
          val c: Column = f.constant.map(lit(_))
            .orElse(f.template.map(t => graft.functions.rml.template(t, encode = false, df(_))))
            .orElse(f.reference.map(r => resolveRef(df, r)))
            .getOrElse(lit(null))
          df = df.withColumn(f.name, c)
      }
    }
    // keep only declared field columns (plus index cols); an iterable field
    // with inner fields exposes only those + the index
    val keep = fields.flatMap { f =>
      val own = if (f.iterator.isDefined && f.innerFields.nonEmpty) Nil else List(f.name)
      own ++ f.iterator.map(_ => s"${f.name}.#").toList ++ f.innerFields.map(_.name)
    }
    df.select(keep.distinct.map(n => col(s"`$n`")): _*)
  }

  /** Resolve a JSONPath-ish field reference ($.a.b / a.b) on a DataFrame. */
  private def resolveRef(df: DataFrame, ref: String): Column = {
    val steps = cleanRef(ref).split("\\.").filter(_.nonEmpty)
    require(steps.nonEmpty, s"empty field reference: $ref")
    steps.tail.foldLeft(df(steps.head))((c, s) => c.getField(s))
  }

  private def resolveOn(root: Column, ref: String): Column =
    cleanRef(ref).split("\\.").filter(_.nonEmpty).foldLeft(root)((c, s) => c.getField(s))

  private def cleanRef(ref: String): String =
    ref.stripPrefix("$").stripPrefix(".").replace("[*]", "")
}
