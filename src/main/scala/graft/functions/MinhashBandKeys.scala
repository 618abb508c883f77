package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Banded MinHash keys of one document as ONE native expression: md5 each
  * shingle ceil(k/4) times (the slice-sharing hash family of
  * TextOps.withMinhashSignature — four independent 32-bit hex slices per
  * digest), keep the per-slice lexicographic minimum, and emit the
  * `bands` band hashes md5("j|sig|sig|…").
  *
  * Why native, not composed: the per-document projection is what the
  * stateless streaming ingest path needs (an aggregation before
  * `flatMapGroupsWithState` would stack a second stateful operator), but
  * the composable form — k × `array_min(transform(_h, substring))` over
  * staged md5 arrays — stays INTERPRETED and materializes one hash array
  * per md5 family per row (r20 JobProfile: the projection dominated the
  * near-minhash streams' per-trigger compute). This expression is one
  * plain JVM pass per document: n·ceil(k/4) digests + running 8-char
  * minima + `bands` closing digests, with whole-stage codegen calling
  * straight into [[bandKeys]].
  *
  * Output parity (the hard requirement — these keys feed queries whose
  * oracle restates the batch signature path): hashes are exactly Spark
  * `md5()` (lowercase hex over UTF-8 bytes), the slice of digest `i/4`
  * is chars [(i%4)·8, (i%4)·8+8), family h > 0 prefixes the shingle with
  * "h:", the per-slice minimum over fixed-width hex equals `array_min`'s
  * string minimum, and the band closes over
  * concat_ws("|", j, sig(j·r)…sig(j·r+r−1)) — bit-identical to
  * TextOps.withMinhashBandKeys' previous HOF formulation and to the
  * explode+partial-agg batch path (TextOps.bandedKeys), which
  * TextOpsSpec pins. Shingle-less documents return NULL (callers filter,
  * mirroring how such docs drop out of the batch explode).
  */
case class MinhashBandKeys(child: Expression, k: Int, bands: Int)
    extends UnaryExpression {

  require(k >= 1 && bands >= 1 && k % bands == 0,
    "minhash_band_keys needs k >= 1 divisible by bands")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "minhash_band_keys"

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
  private val r = k / bands
  private val slicesPerMd5 =
    32 / graft.operators.TextOps.MinhashSliceHexChars
  private val sliceChars = graft.operators.TextOps.MinhashSliceHexChars
  private val nMd5 = (k + slicesPerMd5 - 1) / slicesPerMd5

  /** The whole per-document pass — called from both the interpreted eval
    * and the generated code. Returns null for shingle-less documents.
    */
  def bandKeys(shingles: ArrayData): ArrayData = {
    val n = shingles.numElements()
    if (n == 0) return null
    // one digest instance per row (MessageDigest resets after digest())
    val md = java.security.MessageDigest.getInstance("MD5")
    val prefixes = Array.tabulate(nMd5)(h =>
      if (h == 0) Array.emptyByteArray else s"$h:".getBytes("UTF-8"))
    val mins = Array.ofDim[Char](k, sliceChars)
    var have = false
    val hex = new Array[Char](32)
    var i = 0
    while (i < n) {
      val sb = shingles.getUTF8String(i).getBytes
      var h = 0
      while (h < nMd5) {
        md.reset()
        md.update(prefixes(h))
        val d = md.digest(sb)
        var j = 0
        while (j < 16) {
          hex(j * 2) = hexDigits((d(j) >> 4) & 0xf)
          hex(j * 2 + 1) = hexDigits(d(j) & 0xf)
          j += 1
        }
        var s = 0
        while (s < slicesPerMd5 && h * slicesPerMd5 + s < k) {
          val sig = h * slicesPerMd5 + s
          val off = s * sliceChars
          val m = mins(sig)
          if (!have) { System.arraycopy(hex, off, m, 0, sliceChars) }
          else {
            // lexicographic compare of the 8-char window against the
            // running minimum (ASCII hex: char compare == string compare)
            var c = 0
            var cmp = 0
            while (c < sliceChars && cmp == 0) {
              cmp = java.lang.Character.compare(hex(off + c), m(c))
              c += 1
            }
            if (cmp < 0) System.arraycopy(hex, off, m, 0, sliceChars)
          }
          s += 1
        }
        h += 1
      }
      have = true
      i += 1
    }
    val out = new Array[Any](bands)
    var b = 0
    while (b < bands) {
      val sb = new java.lang.StringBuilder(2 + (sliceChars + 1) * r)
      sb.append(b).append('|')
      var q = 0
      while (q < r) {
        sb.append(mins(b * r + q))
        if (q < r - 1) sb.append('|')
        q += 1
      }
      md.reset()
      val d = md.digest(sb.toString.getBytes("UTF-8"))
      val bh = new Array[Char](32)
      var j = 0
      while (j < 16) {
        bh(j * 2) = hexDigits((d(j) >> 4) & 0xf)
        bh(j * 2 + 1) = hexDigits(d(j) & 0xf)
        j += 1
      }
      out(b) = UTF8String.fromString(new String(bh))
      b += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any =
    bandKeys(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("bander", this,
      classOf[MinhashBandKeys].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = $self.bandKeys($c);
         |${ev.isNull} = ${ev.value} == null;""".stripMargin)
  }

  override protected def withNewChildInternal(
      newChild: Expression): MinhashBandKeys =
    copy(child = newChild)
}

object MinhashBandKeys {
  def minhash_band_keys(shingles: Column, k: Int, bands: Int): Column =
    ColumnBridge.column(MinhashBandKeys(
      ColumnBridge.expression(shingles), k, bands))
}
