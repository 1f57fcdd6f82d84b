package graft

import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{MjlogFileSpec, MjlogFilesPartition, MjlogListing}

/** Property-style invariants for the whole-file bin-packing the mjlog
  * DSv2 applies (FileSourceScanExec's split policy over unsplittable
  * files, `MjlogListing.pack`). Seeded-RNG sampling, as in CodecsSpec
  * (the scalatest/scalacheck bridge isn't in the offline cache).
  */
class MjlogPackingSpec extends AnyFunSuite {

  private def mkFiles(rng: Random, n: Int): Array[MjlogFileSpec] =
    Array.tabulate(n) { i =>
      MjlogFileSpec(f"/logs/20240101/g$i%05d.xml",
                    rng.nextInt(1 << 20).toLong, 19723L, f"g$i%05d")
    }

  test("every file lands in exactly one partition; size bound holds") {
    val rng = new Random(42)
    for (_ <- 1 to 200) {
      val files = mkFiles(rng, rng.nextInt(400))
      val openCost = rng.nextInt(1 << 22).toLong
      val minParts = 1 + rng.nextInt(64)
      val maxPB = (1L << 16) + rng.nextInt(1 << 27)
      val parts = MjlogListing.pack(files, openCost, minParts, maxPB)
        .map(_.asInstanceOf[MjlogFilesPartition])
      // exactly-once
      val packed = parts.flatMap(_.files.map(_.file)).sorted
      assert(packed.toSeq == files.map(_.file).sorted.toSeq)
      // the effective bound pack() derives from the knobs
      val totalBytes = files.map(_.len + openCost).sum
      val maxSplit = math.min(maxPB,
        math.max(openCost, totalBytes / math.max(1, minParts)))
      parts.foreach { p =>
        val sz = p.files.map(_.len + openCost).sum
        assert(p.files.size == 1 || sz <= maxSplit,
          s"multi-file partition of ${p.files.size} files / $sz bytes " +
            s"exceeds maxSplit=$maxSplit")
      }
    }
  }

  test("packing is deterministic and independent of input order") {
    val rng = new Random(7)
    for (_ <- 1 to 50) {
      val files = mkFiles(rng, 1 + rng.nextInt(300))
      val openCost = 64L * 1024
      val a = MjlogListing.pack(files, openCost, 8, 128L << 20)
      val b = MjlogListing.pack(rng.shuffle(files.toSeq).toArray, openCost, 8, 128L << 20)
      assert(a.toSeq == b.toSeq, "partition layout must not depend on listing order")
    }
  }

  test("degenerate knobs: zero open-cost packs everything; empty input") {
    assert(MjlogListing.pack(Array.empty, 0L, 1, 128L << 20).isEmpty)
    val files = (new Random(1)).shuffle((0 until 50).toList).toArray
      .map(i => MjlogFileSpec(s"/l/20240101/g$i.xml", 10L, 19723L, s"g$i"))
    val one = MjlogListing.pack(files, 0L, 1, 128L << 20)
    assert(one.length == 1 &&
      one.head.asInstanceOf[MjlogFilesPartition].files.size == 50)
  }
}
