package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Scale.synthesize contract: schema matches the driver corpus, the
  * planted duplicates are really there, and words are tokenizer-visible
  * (purely alphabetic — the regression that once made every doc collapse
  * to one shingle set). */
class ScaleSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .appName("graft-scale-test")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("synthesized corpus: schema, dup plants, and alphabetic tokens") {
    val dir = s"/tmp/${Reset.ScratchPrefix}scale_spec"
    try {
      Scale.synthesize(spark, 1000L, dir)
      val docs = graft.sources.Tables.documents(spark, dir)
      assert(docs.columns.toSeq == Seq("doc_id", "text", "lang", "source", "n_chars"))
      assert(docs.count() == 1000L)
      val byId = docs.select("doc_id", "text").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      // exact-dup plant: doc 99 is a byte-exact copy of doc 98
      assert(byId(99L) == byId(98L))
      // near-dup plant: doc 97 is doc 96 plus one appended word
      assert(byId(97L) == byId(96L) + " extra")
      // tokenizer visibility: the [a-z]+ token count must equal the
      // whitespace word count (no digit-bearing words collapsing)
      val bad = docs.filter(
        size(expr("regexp_extract_all(lower(text), '[a-z]+', 0)")) =!=
          size(split(col("text"), " "))).count()
      assert(bad == 0, "every generated word must be purely alphabetic")
    } finally {
      // delete only THIS test's directory (not the whole JVM scratch,
      // and not skipped when an assertion above fails)
      val walk = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
      try walk.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
        .forEach(p => java.nio.file.Files.deleteIfExists(p))
      finally walk.close()
    }
  }
}
