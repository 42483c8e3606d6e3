package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** All word k-shingle hashes of a document, position order, one tight
  * loop — the hashing kernel under every shingle-based operator (n-gram
  * Jaccard, span dedup, frequent-span mining, boilerplate removal,
  * repetition stats, MinHash input).
  *
  * Value-identical to the builtin formulation it replaces
  * (`split(text, " ")` -> `transform(_, xxhash64)` -> a `zip_with`
  * fold of `xxhash64(acc, next)`): same split semantics (every single
  * space is a separator, empty tokens kept — including the one empty
  * token of an empty string), same per-word hash (XXH64 over the word's
  * UTF-8 bytes, seed 42 = Spark's `xxhash64`), same fold
  * (`hashLong(next, hashLong(acc, 42))` per step, matching the two-arg
  * `xxhash64(acc, next)` chain). Documents shorter than k words yield an
  * empty array; a null document yields null.
  *
  * Exists because Spark's higher-order functions (`transform`,
  * `zip_with`) evaluate their lambda INTERPRETED per element even inside
  * a codegen'd stage — measured as the dominant CPU in the span-dedup /
  * Jaccard family at bench scale. Space bytes (0x20) cannot occur inside
  * a UTF-8 multibyte sequence, so the byte scan is multibyte-safe.
  */
case class WordShingleHashes(child: Expression, k: Int) extends UnaryExpression {

  require(k >= 1, s"shingle size must be >= 1, got $k")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"word_shingle_hashes needs string, got $t")
  }

  override def nullSafeEval(v: Any): Any =
    WordShingleHashes.compute(v.asInstanceOf[UTF8String], k)

  // same static-helper pattern as KgramHashMinMax: one monomorphic call
  // per row from generated code, no interpreted expression-tree walk
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.WordShingleHashes.compute($v, $k);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WordShingleHashes {

  /** Shared by interpreted and generated paths. One pass to hash words in
    * place (no token materialization), one pass to fold each window of k
    * word hashes — O(bytes + words*k), zero allocation beyond the two
    * primitive arrays.
    */
  def compute(s: UTF8String, k: Int): ArrayData = {
    import org.apache.spark.unsafe.Platform
    val base = s.getBaseObject
    val off = s.getBaseOffset
    val total = s.numBytes
    var spaces = 0
    var i = 0
    while (i < total) {
      if (Platform.getByte(base, off + i) == 0x20) spaces += 1
      i += 1
    }
    val words = spaces + 1
    val n = math.max(words - (k - 1), 0)
    if (n == 0) return new GenericArrayData(Array.emptyLongArray)
    val wh = new Array[Long](words)
    var wi = 0
    var start = 0
    i = 0
    while (i <= total) {
      if (i == total || Platform.getByte(base, off + i) == 0x20) {
        wh(wi) = XXH64.hashUnsafeBytes(base, off + start, i - start, 42L)
        wi += 1
        start = i + 1
      }
      i += 1
    }
    val out = new Array[Long](n)
    var p = 0
    while (p < n) {
      var acc = wh(p)
      var j = 1
      while (j < k) {
        acc = XXH64.hashLong(wh(p + j), XXH64.hashLong(acc, 42L))
        j += 1
      }
      out(p) = acc
      p += 1
    }
    new GenericArrayData(out)
  }

  def apply(text: Column, k: Int): Column =
    GraftBridge.toColumn(WordShingleHashes(GraftBridge.toExpression(text), k))
}
