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
      val pdf0 = vj.parentSource match {
        case Some(v: LogicalSource.ViewSource) => compile(spark, v, registry)
        case Some(other) => SourceReader.read(spark, other)
        case None => compile(spark, registry.getOrElse(vj.parentView,
          throw new IllegalArgumentException(s"unknown parent view: ${vj.parentView}")), registry)
      }
      // prefix parent columns to avoid collisions, then join on the condition
      val pdf = pdf0.columns.foldLeft(pdf0)((d, c) => d.withColumnRenamed(c, s"__p_$c"))
      val cond = vj.childAttrs.zip(vj.parentAttrs).map { case (c, p) =>
        df(c).cast("string") === pdf(s"__p_$p").cast("string")
      }.reduce(_ && _)
      val joined = df.join(pdf, cond, if (vj.kind == "left") "left" else "inner")
      if (vj.fields.nonEmpty) {
        // the join declares which parent fields it pulls in, under new names
        // (reference join_view_query: semantify.py:2090-2133)
        var d = joined
        vj.fields.foreach { f =>
          val c = f.constant.map(lit(_))
            .orElse(f.reference.map(r => col(s"`__p_$r`")))
            .getOrElse(lit(null))
          d = d.withColumn(f.name, c)
        }
        df = d.drop(d.columns.filter(_.startsWith("__p_")).toIndexedSeq: _*)
      } else {
        // expose all parent fields under their view names (left join → null
        // fields, reference: lv_functions.py:346-397)
        df = pdf0.columns.foldLeft(joined)((d, c) =>
          if (d.columns.contains(c)) d else d.withColumnRenamed(s"__p_$c", c))
        df = df.drop(df.columns.filter(_.startsWith("__p_")).toIndexedSeq: _*)
      }
    }
    df
  }

  /** V1/V2/V3: project each declared field; iterable fields explode with a
    * positional `name.#` column; embedded payloads (JSON-in-CSV / CSV-in-JSON)
    * parse with from_json/from_csv.
    */
  def projectFields(base: DataFrame, fields: List[ViewField]): DataFrame = {
    var df = base
    val keep = scala.collection.mutable.ListBuffer.empty[String]
    fields.foreach { f =>
      (f.innerFormulation.map(_.toUpperCase), f.iterator) match {
        case (Some(fm), _) if fm.contains("CSV") =>
          // CSV-in-<anything> (reference: lv_functions.py:293-306): the cell
          // holds CSV text with a header line; one row per data line with a
          // positional "name.#" index. Header/schema inferred from one
          // sample cell (bounded driver-side peek).
          val raw = resolveRef(df, f.reference.getOrElse(f.name)).cast("string")
          val sample = df.select(raw.as("v")).na.drop().limit(1).collect()
            .headOption.map(_.getString(0)).getOrElse("")
          val header = sample.split("\r?\n").headOption.getOrElse("")
            .split(",").map(_.trim)
          val schema = org.apache.spark.sql.types.StructType(header.map(h =>
            org.apache.spark.sql.types.StructField(h, org.apache.spark.sql.types.StringType)))
          val lines = split(regexp_replace(raw, "\r", ""), "\n")
          val dataLines = filter(slice(lines, lit(2), greatest(size(lines) - 1, lit(0))),
            l => trim(l) =!= "")
          df = df.select(col("*"), posexplode(dataLines).as(Seq(s"${f.name}.#", "__line")))
          val parsed = from_csv(col("__line"), schema, Map.empty[String, String])
          val inner =
            if (f.innerFields.nonEmpty) f.innerFields.map(i => i.name -> i.reference.getOrElse(i.name))
            else header.toList.map(h => s"${f.name}.$h" -> h)
          inner.foreach { case (n, ref) => df = df.withColumn(n, parsed.getField(ref)) }
          df = df.drop("__line")
          keep ++= s"${f.name}.#" :: inner.map(_._1)
        case (Some(fm), _) if fm.contains("JSON") =>
          // JSON-in-<anything>: parse the cell with a schema inferred from
          // sample cells; nested refs address the resulting struct.
          // limit(20) bounds the driver-side peek to 20 cells regardless of
          // corpus size — schema inference only, never the data path.
          val raw = resolveRef(df, f.reference.getOrElse(f.name)).cast("string")
          val spark = df.sparkSession
          val samples = df.select(raw.as("v")).na.drop().limit(20).collect()
            .map(_.getString(0)).toSeq
          val schema = spark.read
            .json(spark.createDataset(samples)(org.apache.spark.sql.Encoders.STRING)).schema
          df = df.withColumn(f.name, from_json(raw, schema))
          f.innerFields.foreach(inf =>
            df = df.withColumn(inf.name, resolveOn(col(f.name), inf.reference.getOrElse(inf.name))))
          keep ++= f.name :: f.innerFields.map(_.name)
        case (_, Some(_)) =>
          // iterable field: one row per element + index column "name.#"
          val arrCol = resolveRef(df, f.reference.getOrElse(f.name))
          df = df.select(col("*"), posexplode(arrCol).as(Seq(s"${f.name}.#", "__elem")))
          df =
            if (f.innerFields.isEmpty) df.withColumnRenamed("__elem", f.name)
            else f.innerFields.foldLeft(df) { (d, inf) =>
              d.withColumn(inf.name, resolveOn(col("__elem"), inf.reference.getOrElse(inf.name)))
            }.drop("__elem")
          keep ++= (if (f.innerFields.isEmpty) List(f.name) else Nil) :::
            s"${f.name}.#" :: f.innerFields.map(_.name)
        case _ =>
          val c: Column = f.constant.map(lit(_))
            .orElse(f.template.map(t => graft.functions.rml.template(t, encode = false, df(_))))
            .orElse(f.reference.map(r => resolveRef(df, r)))
            .getOrElse(lit(null))
          df = df.withColumn(f.name, c)
          keep += f.name
      }
    }
    df.select(keep.distinct.map(n => col(s"`$n`")).toSeq: _*)
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
