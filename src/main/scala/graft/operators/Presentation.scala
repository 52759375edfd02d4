package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Presentation-tier transforms (SURVEY §2.8 F9-F11) — applied as the
  * final projection before serialization, never in the storage layer.
  */
object Presentation {

  /** F9: the API's numbers-as-strings convention
    * (database.py:93-120 recursive stringification, with an exclusion
    * set): cast every numeric column to string except the excluded ones. */
  def numericsAsStrings(df: DataFrame, exclude: Set[String] = Set.empty): DataFrame = {
    val cols = df.schema.fields.map { f =>
      f.dataType match {
        case _: NumericType if !exclude.contains(f.name) =>
          col(f.name).cast("string").as(f.name)
        case _ => col(f.name)
      }
    }
    df.select(cols.toIndexedSeq: _*)
  }

  /** F10: NSFW image substitution inside a metadata map column
    * (crud.go:185-202): replace the image-bearing keys with the blur
    * placeholder when flagged. */
  def blurNsfw(metadata: Column, nsfwFlag: Column,
      placeholder: String = "blurred://nsfw"): Column =
    when(nsfwFlag,
      transform_values(metadata, (k, v) =>
        when(k.isin("image", "image_data", "_image_medium", "_image_small",
          "_image_big"), lit(placeholder)).otherwise(v)))
      .otherwise(metadata)

  /** F11: imgproxy URL join — prefix rewrite on the cached-image keys
    * (crud.go:204-226). */
  def imgproxyRewrite(metadata: Column, proxyPrefix: String): Column =
    transform_values(metadata, (k, v) =>
      when(k.isin("_image_medium", "_image_small", "_image_big")
        && v.isNotNull && !v.startsWith(proxyPrefix),
        concat(lit(proxyPrefix), v)).otherwise(v))
}
