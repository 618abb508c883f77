package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing fingerprint selection (Schleimer, Wilkerson & Aiken, SIGMOD
  * 2003) as ONE native expression: md5-hash every k-gram shingle, take the
  * lexicographic minimum over each FULL window of `w` consecutive
  * positions, and emit the distinct selected hashes in first-selection
  * order.
  *
  * Why native, not composed: the per-document selection is exactly what a
  * stateless streaming ingest needs (no explode, no per-doc window, no
  * shuffle — StreamingOps.winnowedPairsStream feeds it straight into the
  * band-state machine), but the composable form —
  * `transform(sequence(0, n-w), i -> array_min(slice(hashes, i+1, w)))` —
  * re-evaluates the `hashes` subtree INSIDE the lambda, i.e. re-md5s the
  * whole shingle array once per window position: O(n²) digests per
  * document (the FrameMath/WordShingles re-inlining pathology). This
  * expression is one plain JVM pass: n digests + an O(n) monotonic-deque
  * sliding minimum.
  *
  * Output parity: hashes are exactly Spark `md5()` of the shingle string
  * (lowercase hex over UTF-8 bytes) and the window minimum is the
  * lexicographic string minimum — bit-identical to the window-function
  * form in TextOps.winnowedPairs' original formulation and to the DuckDB
  * oracle (OracleExt.dedupWinnowed), both of which restate the selection
  * over the same md5 hex strings. Documents with fewer than `w` shingle
  * positions have no full window and select nothing (empty array), like
  * the window form's `pos <= n - w` filter.
  */
case class WinnowedFingerprints(child: Expression, w: Int)
    extends UnaryExpression {

  require(w >= 1, "winnowing window must be >= 1")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "winnowed_fingerprints"

  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires array<string>, got ${other.sql}")
    }

  private val hexDigits = "0123456789abcdef".toCharArray

  /** The selection loop — called from both the interpreted eval and the
    * generated code (public so janino can reach it through the
    * references-array cast).
    */
  def select(shingles: ArrayData): ArrayData = {
    val n = shingles.numElements()
    val full = n - w + 1
    if (full <= 0) return new GenericArrayData(Array.empty[Any])
    // one digest instance per row (MessageDigest resets after digest());
    // per-shingle getInstance would dominate the loop
    val md = java.security.MessageDigest.getInstance("MD5")
    val hashes = new Array[UTF8String](n)
    var i = 0
    while (i < n) {
      val d = md.digest(shingles.getUTF8String(i).getBytes)
      val hex = new Array[Char](32)
      var j = 0
      while (j < 16) {
        hex(j * 2) = hexDigits((d(j) >> 4) & 0xf)
        hex(j * 2 + 1) = hexDigits(d(j) & 0xf)
        j += 1
      }
      hashes(i) = UTF8String.fromString(new String(hex))
      i += 1
    }
    // monotonic deque of indices: front is the window minimum. Equal
    // hashes evict (compareTo >= 0), so ties keep the LATER index — which
    // is irrelevant to the emitted hash value (equal strings) since the
    // output is the hash set.
    val deque = new Array[Int](n)
    var head = 0
    var tail = 0 // exclusive
    val seen = new java.util.LinkedHashSet[UTF8String]()
    i = 0
    while (i < n) {
      while (tail > head && hashes(deque(tail - 1)).compareTo(hashes(i)) >= 0)
        tail -= 1
      deque(tail) = i; tail += 1
      if (deque(head) <= i - w) head += 1
      if (i >= w - 1) seen.add(hashes(deque(head)))
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var o = 0
    while (it.hasNext) { out(o) = it.next(); o += 1 }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any =
    select(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("winnower", this,
      classOf[WinnowedFingerprints].getName)
    nullSafeCodeGen(ctx, ev,
      c => s"${ev.value} = $self.select($c);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): WinnowedFingerprints =
    copy(child = newChild)
}

object WinnowedFingerprints {
  def winnowed_fingerprints(shingles: Column, w: Int): Column =
    ColumnBridge.column(WinnowedFingerprints(
      ColumnBridge.expression(shingles), w))
}
