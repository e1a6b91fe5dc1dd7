package graft

import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** The native codegen'd PortableNormalize must be indistinguishable from
  * its regex specification on any input. */
class NormalizeExprSpec extends SparkSpec {
  import spark.implicits._

  private def both(tokens: Seq[String]): Seq[(String, String, String)] =
    tokens.toDF("t")
      .select(col("t"),
        TextFunctions.portableNormalize(col("t")).as("native"),
        TextFunctions.portableNormalizeRegex(col("t")).as("regex"))
      .as[(String, String, String)].collect().toSeq

  test("native == regex on curated edge cases") {
    val cases = Seq(
      "", "a", "A", "-", "--a--", "Hello,", "co-op", "U.S.", "...",
      "ünïcödé", "日本語abc日本語", "猫", "a猫b", "猫a猫", "ABCxyz", "$$$x$$$",
      " ", "\t", "zzz", "[a]", "1a1", "ØØaØØ",
    )
    both(cases).foreach { case (t, n, r) => assert(n == r, s"input '$t'") }
  }

  test("native == regex on 5000 seeded random unicode strings") {
    val rnd = new scala.util.Random(42)
    val pool = "abcXYZ-.$<>| 0123456789üØ猫éΣ日本語\t"
    val tokens = Seq.fill(5000)(
      Seq.fill(rnd.nextInt(12))(pool(rnd.nextInt(pool.length))).mkString)
    both(tokens).foreach { case (t, n, r) => assert(n == r, s"input '$t'") }
  }

  test("graft_normalize is registered as a SQL function via extensions") {
    val got = spark.sql("SELECT graft_normalize('--Hello--') AS x")
      .as[String].head()
    assert(got == "hello")
  }
}
