package graft

import java.nio.file.{Files, Paths}
import java.time.LocalDate

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder

import graft.etl.MjlogParser
import graft.model.ParsedGame
import graft.sources.MjlogTable

/** Dev probe: per-stage cost of the V2 reader's row production, single
  * thread, no Spark. Run: sbt "Test/runMain graft.V2Probe2 <xmlFile>".
  */
object V2Probe2 {
  def main(args: Array[String]): Unit = {
    val xml = new String(Files.readAllBytes(Paths.get(args(0))),
                         java.nio.charset.StandardCharsets.UTF_8)
    def timed[A](label: String, n: Int)(f: => A): A = {
      val t0 = System.nanoTime()
      var r: A = null.asInstanceOf[A]
      var i = 0
      while (i < n) { r = f; i += 1 }
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[v2probe2] $label: ${dt}%.2f s total, ${dt / n * 1000}%.3f ms/iter ($n iters)")
      r
    }
    val dt = LocalDate.of(2024, 1, 1)
    // warm JIT
    (1 to 50).foreach(_ => MjlogParser.parse(xml, "g", dt))
    val game = timed("parse", 500) { MjlogParser.parse(xml, "g", dt) }
    val enc = ExpressionEncoder[ParsedGame]()
    val ser = enc.createSerializer()
    (1 to 50).foreach(_ => ser(game))
    timed("serialize (ExpressionEncoder)", 500) { ser(game) }
    val row = ser(game)
    val full = MjlogTable.Schema
    import org.apache.spark.sql.catalyst.expressions.{BoundReference, UnsafeProjection}
    val refs = full.fields.map { f =>
      val i = full.fieldIndex(f.name)
      BoundReference(i, full(i).dataType, full(i).nullable)
    }
    val proj = UnsafeProjection.create(refs.toSeq)
    (1 to 50).foreach(_ => proj(row).copy())
    timed("project+copy", 500) { proj(row).copy() }
    println("[v2probe2] serializer class: " + ser.getClass.getName)
    println("[v2probe2] projection class: " + proj.getClass.getName)
  }
}
