package graft

import graft.operators.Presentation
import org.apache.spark.sql.functions._

class PresentationSpec extends SparkSpec {

  test("F9: numerics serialize as strings, exclusions and non-numerics kept") {
    import spark.implicits._
    val df = Seq((1L, 2.5, "x", 7)).toDF("big", "dbl", "s", "code")
    val out = Presentation.numericsAsStrings(df, exclude = Set("code"))
    val f = out.schema.fields.map(f => f.name -> f.dataType.typeName).toMap
    assert(f("big") == "string" && f("dbl") == "string")
    assert(f("s") == "string" && f("code") == "integer")
    val r = out.collect().head
    assert(r.getString(0) == "1" && r.getString(1) == "2.5")
  }

  test("F10: nsfw blur replaces only image keys, only when flagged") {
    import spark.implicits._
    val df = Seq(
      (Map("image" -> "u1", "name" -> "n1"), true),
      (Map("image" -> "u2", "name" -> "n2"), false))
      .toDF("meta", "nsfw")
    val out = df.select(
      Presentation.blurNsfw(col("meta"), col("nsfw")).as("meta")).collect()
    val m1 = out(0).getAs[Map[String, String]]("meta")
    val m2 = out(1).getAs[Map[String, String]]("meta")
    assert(m1("image") == "blurred://nsfw" && m1("name") == "n1")
    assert(m2("image") == "u2")
  }

  test("F11: imgproxy prefix joins once and only on cache keys") {
    import spark.implicits._
    val df = Seq(Map("_image_small" -> "img/a.png",
      "_image_big" -> "https://proxy/img/b.png", "name" -> "n"))
      .toDF("meta")
    val out = df.select(Presentation.imgproxyRewrite(col("meta"),
      "https://proxy/").as("meta")).collect().head
      .getAs[Map[String, String]]("meta")
    assert(out("_image_small") == "https://proxy/img/a.png")
    assert(out("_image_big") == "https://proxy/img/b.png") // already prefixed
    assert(out("name") == "n")
  }
}
