package graft.functions

/** Space-filling-curve key construction shared by the query-level layout
  * audits (q109/q123) and the physical `zorderBy` commit — engine-neutral
  * integer SQL so the DuckDB oracle can replay it verbatim. */
object SpaceCurves {

  /** Hilbert grid width: 8 bits per dimension (n = 256). */
  val HilbertN = 256L

  /** One xy2d level (s = 2^k) over the packed state acc = d·2^16 + x·2^8
    * + y, as engine-neutral integer SQL (`divOp` is `div` for Spark,
    * `//` for DuckDB). Wikipedia's public xy2d construction: quadrant
    * digit (3·rx) XOR ry = 2·rx + (rx+ry) mod 2, then the ry=0 rotation
    * (flip at full n width when rx=1, then swap x/y). */
  def hilbertLevelSql(s: Long, acc: String, divOp: String): String = {
    val d = s"(($acc) $divOp 65536)"
    val x = s"((($acc) $divOp 256) % 256)"
    val y = s"(($acc) % 256)"
    val rx = s"(($x $divOp $s) % 2)"
    val ry = s"(($y $divOp $s) % 2)"
    val quad = s"(2 * $rx + ($rx + $ry) % 2)"
    val d1 = s"($d + ${s * s} * $quad)"
    val x1 = s"(CASE WHEN $ry = 0 THEN (CASE WHEN $rx = 1 THEN ${HilbertN - 1} - $y ELSE $y END) ELSE $x END)"
    val y1 = s"(CASE WHEN $ry = 0 THEN (CASE WHEN $rx = 1 THEN ${HilbertN - 1} - $x ELSE $x END) ELSE $y END)"
    s"($d1 * 65536 + $x1 * 256 + $y1)"
  }
}
