package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** DEFLATE-compressed byte length of a string (raw deflate, no zlib/gzip
  * framing) — the primitive behind the compression-ratio quality signal
  * used by large-corpus curation pipelines (e.g. Gopher's quality rules):
  * text that compresses too WELL is repetitive boilerplate, text that
  * compresses too POORLY is high-entropy noise (minified blobs, base64);
  * natural language sits in a stable band between them.
  *
  * A scalar per-row JVM computation with no Spark-side state: each call
  * allocates its own `Deflater` (expressions are shared across tasks, so
  * no instance reuse), streams the UTF-8 bytes through it, and returns
  * only the compressed LENGTH — the compressed bytes themselves are never
  * materialized as a row value, so memory per row is one 8 KiB scratch
  * buffer regardless of document size.
  */
case class DeflateLen(child: Expression, level: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"deflate_len expects a string, got ${child.dataType.simpleString}")

  override def prettyName: String = "deflate_len"

  override protected def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    val d = new java.util.zip.Deflater(level, /* nowrap = */ true)
    try {
      d.setInput(bytes)
      d.finish()
      val buf = new Array[Byte](8192)
      var total = 0L
      while (!d.finished()) total += d.deflate(buf)
      total
    } finally d.end()
  }

  override protected def withNewChildInternal(newChild: Expression): DeflateLen =
    copy(child = newChild)
}
