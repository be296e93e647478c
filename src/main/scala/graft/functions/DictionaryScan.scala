package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Multi-term dictionary scanner — the scale path for masking/counting a
  * LARGE fixed term set (PII vocabularies, blocklisted phrases) where K
  * chained `regexp_replace` passes would scan the corpus K times and a
  * K-way regex alternation backtracks per position. One trie walk per
  * position, one output pass, leftmost-longest semantics: at each position
  * mask the longest dictionary term starting there (single fixed `mask`
  * token), else copy the character — exactly what RE2 does with a
  * length-descending alternation, so a DuckDB oracle reproduces the masked
  * text byte-for-byte (proved via md5 in q124).
  *
  * The trie is built once on the driver and shipped to executors inside
  * the expression (`ctx.addReferenceObj`), so generated code pays one
  * virtual call per document, not per term. */
final class DictTrie(terms: Seq[String], val mask: String) extends Serializable {
  require(terms.nonEmpty && terms.forall(_.nonEmpty), "terms must be non-empty")

  private final class Node extends Serializable {
    val children = new java.util.HashMap[Character, Node](4)
    var terminal = false
  }

  private val root: Node = {
    val r = new Node
    terms.foreach { t =>
      var cur = r
      t.foreach { c =>
        var nxt = cur.children.get(c)
        if (nxt == null) { nxt = new Node; cur.children.put(c, nxt) }
        cur = nxt
      }
      cur.terminal = true
    }
    r
  }

  /** Length of the longest dictionary term starting at `i`, or 0. */
  private def longestMatch(s: String, i: Int): Int = {
    var cur = root
    var best = 0
    var j = i
    while (j < s.length) {
      cur = cur.children.get(s.charAt(j))
      if (cur == null) return best
      j += 1
      if (cur.terminal) best = j - i
    }
    best
  }

  /** One pass: (n_hits, text with every occurrence replaced by `mask`). */
  def scan(text: UTF8String): InternalRow = {
    val s = text.toString
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    var hits = 0L
    while (i < s.length) {
      val len = longestMatch(s, i)
      if (len > 0) { sb.append(mask); hits += 1; i += len }
      else { sb.append(s.charAt(i)); i += 1 }
    }
    new GenericInternalRow(Array[Any](hits, UTF8String.fromString(sb.toString)))
  }
}

/** `dict_scan(text) -> struct<n_hits: long, masked: string>` — one-pass
  * count + mask against the compiled dictionary. */
case class DictScan(child: Expression, trie: DictTrie) extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("n_hits", LongType, nullable = false),
    StructField("masked", StringType, nullable = false)))
  override def prettyName: String = "dict_scan"
  override def nullSafeEval(v: Any): Any = trie.scan(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("dictTrie", trie, classOf[DictTrie].getName)
    defineCodeGen(ctx, ev, c => s"$ref.scan($c)")
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
