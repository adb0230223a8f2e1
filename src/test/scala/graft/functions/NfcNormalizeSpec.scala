package graft.functions

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.SparkSpec
import graft.functions.GraftFunctions.nfcNormalize

/** The nfc_normalize expression: canonical composition semantics against
  * java.text.Normalizer ground truth, pass-through of already-normalized
  * input (the fast path returns the input reference), NULL handling, SQL
  * registration, and interpreted-vs-codegen agreement.
  */
class NfcNormalizeSpec extends SparkSpec {
  import spark.implicits._

  // decomposed: e+U+0301, A+U+030A (explicit escapes so the source
  // encoding can never silently precompose the fixtures)
  private val decomposed = "cafe\u0301 A\u030angstro\u0308m"
  private val composed = "caf\u00e9 \u00c5ngstr\u00f6m"

  test("composes decomposed sequences; already-NFC passes through") {
    val out = Seq(decomposed, composed, "plain ascii")
      .toDF("s").select(nfcNormalize(col("s")).as("n"))
      .as[String].collect().toList
    out shouldBe List(composed, composed, "plain ascii")
  }

  test("matches java.text.Normalizer on mixed samples incl codegen path") {
    val samples = Seq(decomposed, composed, "", "\u00e9\u00e9\u00e9",
      "\u00e9\u0301", // composed base + another combining mark
      "mixed e\u0301 and \u00e9 in one")
    val expected = samples.map(
      java.text.Normalizer.normalize(_, java.text.Normalizer.Form.NFC))
    val viaDf = samples.toDF("s")
      .select(nfcNormalize(col("s"))).as[String].collect().toList
    viaDf shouldBe expected
  }

  test("NULL input -> NULL; idempotent") {
    val df = Seq(Option(decomposed), None).toDF("s")
      .select(nfcNormalize(col("s")).as("n"))
    val rows = df.collect()
    rows(0).getString(0) shouldBe composed
    assert(rows(1).isNullAt(0))
    // idempotence: normalizing the normalized form is the identity
    df.select(nfcNormalize(col("n"))).collect()(0).getString(0) shouldBe
      composed
  }

  test("registered as SQL function nfc_normalize via GraftExtensions") {
    Seq(decomposed).toDF("s").createOrReplaceTempView("nfc_t")
    spark.sql("SELECT nfc_normalize(s) AS n FROM nfc_t")
      .as[String].head() shouldBe composed
  }

  test("interpreted eval path agrees with codegen/DataFrame result") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    val e = NfcNormalize(Literal(UTF8String.fromString(decomposed),
      org.apache.spark.sql.types.StringType))
    e.eval(null).toString shouldBe composed
    // fast path: already-normalized input comes back unchanged
    val id = UTF8String.fromString(composed)
    NfcNormalize(Literal(id,
      org.apache.spark.sql.types.StringType)).eval(null) shouldBe id
  }
}
