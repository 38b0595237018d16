package graft

import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String

/** Scratch main: microbenchmark JaccardGeq / IntersectCount eval. */
object Dev {
  def main(args: Array[String]): Unit = {
    val rnd = new scala.util.Random(1)
    def arr(): GenericArrayData = new GenericArrayData(
      Array.fill[Any](204)(UTF8String.fromString(
        (0 until 5).map(_ => ('a' + rnd.nextInt(20)).toChar).mkString))
        .sortBy(_.toString))
    val a = arr(); val b = arr()
    val nullE: org.apache.spark.sql.catalyst.expressions.Expression = null
    val jg = graft.expressions.JaccardGeq(nullE, nullE, nullE)
    val ic = graft.expressions.IntersectCount(nullE, nullE)
    // warmup
    (1 to 20000).foreach { _ => jg.nullSafeEval(a, b, 0.3); ic.nullSafeEval(a, b) }
    var t0 = System.nanoTime()
    (1 to 500000).foreach(_ => jg.nullSafeEval(a, b, 0.3))
    println(f"JaccardGeq:     ${(System.nanoTime() - t0) / 500000.0}%.0f ns/eval")
    t0 = System.nanoTime()
    (1 to 500000).foreach(_ => ic.nullSafeEval(a, b))
    println(f"IntersectCount: ${(System.nanoTime() - t0) / 500000.0}%.0f ns/eval")
  }
}
