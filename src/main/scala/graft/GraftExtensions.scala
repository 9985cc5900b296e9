package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.IntegerType
import graft.functions.expressions._

/** Spark extension point: registers graft's native expressions as SQL
  * functions, so `spark.sql("SELECT graft_shingle_set(text, 3) ...")` works
  * anywhere the library is on the classpath. Enable with
  * `spark.sql.extensions=graft.GraftExtensions` (or
  * `builder.withExtensions(new GraftExtensions)`).
  *
  * No custom Rule/Strategy is injected — SURVEY.md §4's conclusion stands:
  * every reference operator plans well through vanilla Catalyst; the only
  * justified custom pieces are these scalar/array expressions.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def intLit(e: Expression, what: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got: $other")
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    def info(name: String, usage: String) =
      new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "")

    ext.injectFunction((
      FunctionIdentifier("graft_tokenize"),
      info("graft_tokenize", "graft_tokenize(text) - Java \\W+ split, reference parity"),
      (es: Seq[Expression]) => Tokenize(es.head)))

    ext.injectFunction((
      FunctionIdentifier("graft_shingle_set"),
      info("graft_shingle_set", "graft_shingle_set(text, k) - distinct k-word shingles"),
      (es: Seq[Expression]) => ShingleSet(es.head, intLit(es(1), "k"))))

    ext.injectFunction((
      FunctionIdentifier("graft_shingle_list"),
      info("graft_shingle_list",
        "graft_shingle_list(text, k) - ALL k-word shingles, duplicates kept (repetition analysis)"),
      (es: Seq[Expression]) => ShingleList(es.head, intLit(es(1), "k"))))

    ext.injectFunction((
      FunctionIdentifier("graft_shingle_explode"),
      info("graft_shingle_explode",
        "graft_shingle_explode(text, k) - UDTF: one row per distinct k-word shingle"),
      (es: Seq[Expression]) => ShingleExplode(es.head, intLit(es(1), "k"))))

    ext.injectFunction((
      FunctionIdentifier("graft_hash31"),
      info("graft_hash31", "graft_hash31(text) - portable rolling hash mod 2^31-1"),
      (es: Seq[Expression]) => PortableHash31(es.head)))

    ext.injectFunction((
      FunctionIdentifier("graft_minhash"),
      info("graft_minhash", "graft_minhash(hashes, n) - n-permutation MinHash signature"),
      (es: Seq[Expression]) => MinHashSignature(es.head, intLit(es(1), "n"))))

    ext.injectFunction((
      FunctionIdentifier("graft_simhash48"),
      info("graft_simhash48", "graft_simhash48(hashes) - 48-bit SimHash fingerprint"),
      (es: Seq[Expression]) => SimHash48(es.head)))

    ext.injectFunction((
      FunctionIdentifier("graft_hyperplane_sig"),
      info("graft_hyperplane_sig", "graft_hyperplane_sig(vec, p) - p-plane LSH signature"),
      (es: Seq[Expression]) => HyperplaneSignature(es.head, intLit(es(1), "p"))))

    ext.injectFunction((
      FunctionIdentifier("graft_hash62_set"),
      info("graft_hash62_set",
        "graft_hash62_set(strings) - sorted distinct 62-bit element hashes " +
          "(the dedup index's verification currency)"),
      (es: Seq[Expression]) => HashSet62(es.head)))

    ext.injectFunction((
      FunctionIdentifier("graft_intersect_count"),
      info("graft_intersect_count",
        "graft_intersect_count(a, b) - |a INTERSECT b| over sorted distinct long arrays (merge scan)"),
      (es: Seq[Expression]) => IntersectCountSorted(es.head, es(1))))
  }
}
