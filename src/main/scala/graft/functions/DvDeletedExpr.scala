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

/** [[DvDeletedExpr]] with EXECUTOR-side vector loading: the broadcast
  * carries only (manifest entry → sidecar path) REFERENCES — O(files)
  * bytes through the driver no matter how many positions the vectors
  * hold — and each executor lazily reads, decodes and caches exactly
  * the vectors of the files its own tasks scan. At 100 TB a scattered
  * delete's vectors total gigabytes; with this expression the driver
  * never materializes any of them (the read path's old shape), and no
  * executor holds more than its splits' share. The eager
  * [[DvDeletedExpr]] stays for callers whose position sets are
  * COMPUTED, not sidecar contents (the CDC vector-delta rows). */
case class DvDeletedLazyExpr(left: Expression, right: Expression,
                             refs: Broadcast[Map[String, String]],
                             root: String,
                             conf: Broadcast[graft.sink.VersionedTable.SerializableHadoopConf])
    extends BinaryExpression with Predicate {

  override def nullable: Boolean = false

  override protected def nullSafeEval(file: Any, pos: Any): Any =
    DvDeletedLazyExpr.contains(refs, root, conf,
      file.asInstanceOf[UTF8String], pos.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val refsRef = ctx.addReferenceObj("dvRefsBc", refs, classOf[Broadcast[_]].getName)
    val rootRef = ctx.addReferenceObj("dvRoot", root, "java.lang.String")
    val confRef = ctx.addReferenceObj("dvConfBc", conf, classOf[Broadcast[_]].getName)
    nullSafeCodeGen(ctx, ev, (f, p) =>
      s"""${ev.value} = graft.functions.DvDeletedLazyExpr.contains(
         |  $refsRef, $rootRef, $confRef, $f, $p);""".stripMargin)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DvDeletedLazyExpr =
    copy(left = newLeft, right = newRight)
}

object DvDeletedLazyExpr {
  // same per-thread memo discipline as DvDeletedExpr (file_path is
  // constant within a split), keyed WEAKLY on the refs MAP identity: a
  // strong ThreadLocal reference would pin the WeakHashMap cache entry
  // (every decoded vector this executor loaded for the read) long after
  // the query and its broadcast die — pooled task threads live for the
  // executor lifetime, so a streaming CDF creating fresh refs per
  // micro-batch would accumulate one dead cache per thread
  // the WHOLE memo tuple sits behind the weak reference: the tuple holds
  // the map strongly, so when the broadcast dies the tuple (and with it
  // the last decoded position ARRAY — megabytes on a wide delete, per
  // pooled task thread) becomes unreachable together; weakening only the
  // map key would still pin every thread's last array forever
  private val last = new ThreadLocal[
    java.lang.ref.WeakReference[(AnyRef, UTF8String, Array[Long])]]

  // per-executor decoded-vector cache, one inner map per broadcast refs
  // value: lives exactly as long as the broadcast, concurrent tasks of
  // one read share loads (computeIfAbsent dedups the sidecar IO)
  private val vecCache =
    new java.util.WeakHashMap[AnyRef, java.util.concurrent.ConcurrentHashMap[String, Array[Long]]]

  private def cacheFor(refs: AnyRef): java.util.concurrent.ConcurrentHashMap[String, Array[Long]] =
    vecCache.synchronized {
      var c = vecCache.get(refs)
      if (c == null) {
        c = new java.util.concurrent.ConcurrentHashMap[String, Array[Long]]
        vecCache.put(refs, c)
      }
      c
    }

  // generic Broadcast params keep the codegen call site erasure-clean
  def contains(refsBc: Broadcast[_], root: String, confBc: Broadcast[_],
               file: UTF8String, pos: Long): Boolean = {
    val refs = refsBc.value.asInstanceOf[Map[String, String]]
    // plain null checks: this runs per ROW inside the scan filter —
    // an Option wrap here would allocate on every memo hit
    val memoRef = last.get()
    val memo = if (memoRef == null) null else memoRef.get()
    val arr =
      if (memo != null && (memo._1 eq refs) && memo._2.equals(file)) memo._3
      else {
        val a = DvDeletedExpr.cachedResolverFor(refs, refs.keys)(file.toString)
          .map { entry =>
            cacheFor(refs).computeIfAbsent(entry, { e =>
              refs.get(e) match {
                case Some(dvRel) =>
                  val conf = confBc.value
                    .asInstanceOf[graft.sink.VersionedTable.SerializableHadoopConf].value
                  val p = new org.apache.hadoop.fs.Path(root, dvRel)
                  val in = p.getFileSystem(conf).open(p)
                  val bytes =
                    try org.apache.commons.io.IOUtils.toByteArray(in)
                    finally in.close()
                  graft.sink.VersionedTable.decodeDvPositions(bytes)
                case None => Array.emptyLongArray
              }
            })
          }.getOrElse(Array.emptyLongArray)
        last.set(new java.lang.ref.WeakReference((refs: AnyRef, file.clone(), a)))
        a
      }
    arr.length > 0 && java.util.Arrays.binarySearch(arr, pos) >= 0
  }
}

object DvDeletedExpr {
  // per-thread memo of the last (map, file) -> positions resolution:
  // file_path is constant across a split, so the suffix resolution
  // amortizes to one per task. The memo keys on the MAP IDENTITY too —
  // two snapshots of one table share file paths but carry different
  // vectors, and a memo keyed on path alone would serve one version's
  // deletes to the other. Weakly referenced: a pooled task thread must
  // not pin a dead broadcast's position map (and with it the resolver
  // cache entry) for the executor's lifetime.
  private val last = new ThreadLocal[
    java.lang.ref.WeakReference[(AnyRef, UTF8String, Array[Long])]]

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
  // broadcast value, never pinning a deserialized snapshot. Shared with
  // [[DvDeletedLazyExpr]] (its key is the sidecar-reference map).
  private val resolverCache =
    new java.util.WeakHashMap[AnyRef, String => Option[String]]

  private[functions] def cachedResolverFor(
      key: AnyRef, entries: => Iterable[String]): String => Option[String] =
    resolverCache.synchronized {
      var r = resolverCache.get(key)
      if (r == null) { r = resolverFor(entries.toSeq); resolverCache.put(key, r) }
      r
    }

  private def cachedResolver(m: Map[String, Array[Long]]): String => Option[String] =
    cachedResolverFor(m, m.keys)

  def contains(m: Map[String, Array[Long]], file: UTF8String, pos: Long): Boolean = {
    val memoRef = last.get()
    val memo = if (memoRef == null) null else memoRef.get()
    val arr =
      if (memo != null && (memo._1 eq m) && memo._2.equals(file)) memo._3
      else {
        val a = cachedResolver(m)(file.toString)
          .map(m).getOrElse(Array.emptyLongArray)
        last.set(new java.lang.ref.WeakReference((m: AnyRef, file.clone(), a)))
        a
      }
    arr.length > 0 && java.util.Arrays.binarySearch(arr, pos) >= 0
  }
}
