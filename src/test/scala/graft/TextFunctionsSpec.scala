package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.TextFunctions._

/** Tokenizer/shingle edge cases from SURVEY.md §0.1 / FIXTURES.md §B.4 —
  * each pins a Java `split("\\W+")` parity quirk of the reference
  * (BookQuery.java:35,64,126).
  */
class TextFunctionsSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def toks(s: String): Seq[String] =
    Seq(s).toDF("t").select(tokenize(col("t"))).as[Seq[String]].head()

  private def sh3(s: String): Seq[String] =
    Seq(s).toDF("t").select(shingleSet(col("t"), 3)).as[Seq[String]].head()

  test("tokenize splits on non-word runs") {
    assert(toks("a b  c!!d") == Seq("a", "b", "c", "d"))
  }

  test("tokenize keeps leading empty token (Java split parity)") {
    assert(toks("!!! a b c") == Seq("", "a", "b", "c"))
  }

  test("tokenize drops trailing empty tokens (Java split parity)") {
    assert(toks("a b ") == Seq("a", "b"))
    assert(toks("a b!!!") == Seq("a", "b"))
  }

  test("tokenize of empty/all-punct text") {
    assert(toks("") == Seq.empty)
    assert(toks("!!!") == Seq.empty)
  }

  test("shingles: fewer than k tokens -> empty set") {
    assert(sh3("one two") == Seq.empty)
    assert(sh3("") == Seq.empty)
  }

  test("shingleSet dedups repeated shingles (HashSet parity)") {
    assert(sh3("a b c a b c a b c").sorted == Seq("a b c", "b c a", "c a b").sorted)
  }

  test("leading empty token produces space-prefixed shingle (reference parity)") {
    assert(sh3("!!! a b c").sorted == Seq(" a b", "a b c").sorted)
  }

  test("multi-line text shingles span line breaks") {
    // The reference joins lines with " " (BookQuery.java:57-61); \W+ treats
    // \n as a delimiter, so either path yields the same tokens.
    assert(sh3("a b\nc d").sorted == Seq("a b c", "b c d").sorted)
  }
}
