package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, Predicate}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.unsafe.types.UTF8String

/** Is row `pos` of data file `file` marked deleted by a deletion vector?
  *
  * The merge-on-read half of [[graft.sink.VersionedTable.deleteWhereVectored]]:
  * a DV-bearing snapshot reads its files WITH `_metadata.file_path` /
  * `_metadata.row_index` and drops rows where this predicate holds. The
  * position sets ride a BROADCAST (one copy per executor, fetched once —
  * the same shape as a broadcast dim table, never per-task closure bytes),
  * keyed by MANIFEST ENTRY and resolved from the row's full file path by
  * longest boundary-safe suffix match — file NAMES are not unique across
  * hive partition directories (one write job emits a part-00000 under
  * every k=v dir), so a name-keyed map would merge distinct files'
  * vectors and delete the wrong rows. Membership is a binary search over
  * the file's sorted position array; the per-row resolution is memoized
  * per thread because `file_path` is constant within a split. Codegen'd
  * (static call), so the surrounding scan + filter stays one whole-stage
  * span.
  *
  * Both inputs are file-source metadata columns and never null.
  */
case class DvDeletedExpr(left: Expression, right: Expression,
                         dv: Broadcast[Map[String, Array[Long]]])
    extends BinaryExpression with Predicate {

  override def nullable: Boolean = false

  override protected def nullSafeEval(file: Any, pos: Any): Any =
    DvDeletedExpr.contains(dv.value, file.asInstanceOf[UTF8String],
      pos.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("dvBc", dv, classOf[Broadcast[_]].getName)
    nullSafeCodeGen(ctx, ev, (f, p) =>
      s"""${ev.value} = graft.functions.DvDeletedExpr.contains(
         |  (scala.collection.immutable.Map) $ref.value(), $f, $p);""".stripMargin)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DvDeletedExpr =
    copy(left = newLeft, right = newRight)
}

object DvDeletedExpr {
  // per-thread memo of the last (map, file) -> positions resolution:
  // file_path is constant across a split, so the suffix resolution
  // amortizes to one per task. The memo keys on the MAP IDENTITY too —
  // two snapshots of one table share file paths but carry different
  // vectors, and a memo keyed on path alone would serve one version's
  // deletes to the other.
  private val last = new ThreadLocal[(AnyRef, UTF8String, Array[Long])]

  /** The manifest entry (relative "data/…" or absolute clone path) that
    * `path` — a full scan-reported file path, scheme included — refers
    * to: the LONGEST entry that is a whole-segment suffix of `path`.
    * Longest wins because a clone's absolute entry can itself end with
    * another entry's relative form. Suffix matching sidesteps URI
    * scheme/encoding renderings entirely; within one read the candidate
    * set is exactly the scanned entries, so a boundary-safe suffix match
    * is an identity. */
  def resolveEntry(entries: Iterable[String], path: String): Option[String] = {
    // an ABSOLUTE entry (a clone's "/…" path) sits right after the URI
    // scheme/authority, so the char before it is ':' or an authority —
    // its own leading '/' is the segment boundary; a relative entry
    // ("data/…") must be preceded by '/'
    def matches(e: String): Boolean =
      path.endsWith(e) && (path.length == e.length ||
        e.charAt(0) == '/' || path.charAt(path.length - e.length - 1) == '/')
    val hits = entries.filter(matches)
    if (hits.isEmpty) None else Some(hits.maxBy(_.length))
  }

  /** An O(1)-per-path resolver over a FIXED candidate set: entries bucket
    * by basename (the only component two entries can collide past), and a
    * path probes just its basename's bucket. The linear [[resolveEntry]]
    * scan would make a wide vectored delete O(files²) on the driver at a
    * million-file table; this keeps it O(files). */
  def resolverFor(entries: Seq[String]): String => Option[String] = {
    val byName = entries.groupBy(e => e.substring(e.lastIndexOf('/') + 1))
    def probe(path: String): Option[String] = {
      val name = path.substring(path.lastIndexOf('/') + 1)
      byName.get(name).flatMap(c => resolveEntry(c, path))
    }
    path => probe(path).orElse {
      // rendering fallback: a runtime may percent-encode special chars in
      // _metadata.file_path that the manifest stores in on-disk form
      // (hive-escaped partition values) — retry with the decoded form
      val decoded =
        try new java.net.URI(path).getPath
        catch { case _: Exception => null }
      if (decoded != null && decoded != path) probe(decoded) else None
    }
  }

  // per-EXECUTOR basename index of each broadcast's entry set, built once
  // per (broadcast value) rather than once per task — without it every
  // task's memo miss rescans all entries, O(files²) across a wide read.
  // WeakHashMap keyed on the map's identity: the index dies with the
  // broadcast value, never pinning a deserialized snapshot.
  private val resolverCache =
    new java.util.WeakHashMap[AnyRef, String => Option[String]]

  private def cachedResolver(m: Map[String, Array[Long]]): String => Option[String] =
    resolverCache.synchronized {
      var r = resolverCache.get(m)
      if (r == null) { r = resolverFor(m.keys.toSeq); resolverCache.put(m, r) }
      r
    }

  def contains(m: Map[String, Array[Long]], file: UTF8String, pos: Long): Boolean = {
    val memo = last.get()
    val arr =
      if (memo != null && (memo._1 eq m) && memo._2.equals(file)) memo._3
      else {
        val a = cachedResolver(m)(file.toString)
          .map(m).getOrElse(Array.emptyLongArray)
        last.set((m, file.clone(), a))
        a
      }
    arr.length > 0 && java.util.Arrays.binarySearch(arr, pos) >= 0
  }
}
