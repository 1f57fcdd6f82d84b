package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.codecs.{GoFlags, Lookups, Melds, Tiles}

/** Property + golden tests for the pure codec layer (reference F1-F8).
  * The meld decoder is exercised exhaustively over the full 16-bit field
  * space — cheap, and it is the highest-risk bit logic in the project.
  * Property-style cases sample deterministically (seeded RNG) since the
  * scalatest/scalacheck bridge isn't in the offline artifact cache.
  */
class CodecsSpec extends AnyFunSuite {
  private def samples[A](n: Int)(gen: scala.util.Random => A): Seq[A] = {
    val rng = new scala.util.Random(42)
    Seq.fill(n)(gen(rng))
  }

  // ---------------------------------------------------------- tiles (F3)

  test("numToHai renders sorted digits with one letter per suit run") {
    samples(500)(r => Seq.fill(14)(r.nextInt(136))).foreach { ids =>
      val s = Tiles.numToHai(ids, hasAka = false)
      val letters = s.filter(_.isLetter)
      assert(letters.toSeq == letters.toSeq.distinct) // no repeated suit runs
      assert(s.count(_.isDigit) == ids.size)
      // letters appear in m < p < s < z order
      val order = letters.map("mpsz".indexOf(_))
      assert(order.toSeq == order.toSeq.sorted)
    }
  }

  test("numToHai golden: plain and red-five rendering") {
    assert(Tiles.numToHai(Seq(0, 4, 8, 12, 16), hasAka = false) == "m12345")
    assert(Tiles.numToHai(Seq(0, 4, 8, 12, 16), hasAka = true) == "m12340")
    assert(Tiles.numToHai(Seq(17), hasAka = true) == "m5") // copy 1, not red
    assert(Tiles.numToHai(Seq(52, 16, 88), hasAka = true) == "m0p0s0")
    assert(Tiles.numToHai(Seq(124, 108), hasAka = true) == "z15") // honors never red
    assert(Tiles.numToHai(Seq(35, 36), hasAka = false) == "m9p1")
  }

  // ----------------------------------------------------------- dora (F2)

  test("dora indicator golden: number wrap, wind cycle, dragon cycle") {
    assert(Tiles.doraFromIndicator(8) == 12)    // m3 -> m4
    assert(Tiles.doraFromIndicator(32) == 0)    // m9 -> m1
    assert(Tiles.doraFromIndicator(108) == 112) // E -> S
    assert(Tiles.doraFromIndicator(120) == 108) // N -> E
    assert(Tiles.doraFromIndicator(124) == 128) // haku -> hatsu
    assert(Tiles.doraFromIndicator(132) == 124) // chun -> haku
  }

  test("dora preserves suit and copy index") {
    (0 to 135).foreach { id =>
      val d = Tiles.doraFromIndicator(id)
      assert(Tiles.suit(d) == Tiles.suit(id))
      assert(Tiles.copy(d) == Tiles.copy(id))
      assert(d >= 0 && d <= 135)
    }
  }

  test("dora cycles: numbers have period 9, winds 4, dragons 3") {
    def iterate(id: Int, n: Int): Int =
      (1 to n).foldLeft(id)((x, _) => Tiles.doraFromIndicator(x))
    assert(iterate(0, 9) == 0)     // m1 nine steps -> m1
    assert(iterate(108, 4) == 108) // E four steps -> E
    assert(iterate(124, 3) == 124) // haku three steps -> haku
  }

  // -------------------------------------------------------- melds (F1/F4)

  test("meld decode is total and well-formed over the full 16-bit space") {
    val paisPattern = "^[mpsz][0-9]+[+=-]?[0-9]*$".r
    for (m <- 0 until 65536; aka <- Seq(false, true)) {
      Melds.decode(m, aka).foreach { meld =>
        assert(Set("tii", "pon", "kan").contains(meld.atype), s"m=$m")
        assert(paisPattern.findFirstIn(meld.pais).isDefined,
               s"m=$m pais=${meld.pais}")
        assert(meld.packed >= 0 && meld.packed < (1L << 31), s"m=$m")
        // packed `by` field must echo the low bits of m
        assert(((meld.packed >> 27) & 3) == (m & 3), s"m=$m")
        val typ = (meld.packed >> 24) & 7
        assert(Set(Melds.TypeAnkan, Melds.TypeTii, Melds.TypePon,
                   Melds.TypeMinkan).map(_.toLong).contains(typ), s"m=$m")
      }
    }
  }

  test("meld decode golden: each branch") {
    assert(Melds.decode(7, hasAka = false).get.pais == "m1-23")      // chii
    assert(Melds.decode(7, hasAka = false).get.atype == "tii")
    // pt=93 -> pn=31 -> suit z, rank 5 (haku): pon of white dragon
    assert(Melds.decode(47625, hasAka = false).get.pais == "z555+")  // pon
    assert(Melds.decode(47625, hasAka = false).get.atype == "pon")
    assert(Melds.decode(47633, hasAka = false).get.pais == "z555+5") // kakan
    assert(Melds.decode(47633, hasAka = false).get.atype == "kan")
    // pt=24 -> pn=8 -> suit m, rank 9
    assert(Melds.decode(12297, hasAka = false).get.pais == "m999+")
    assert(Melds.decode(17408, hasAka = false).get.pais == "p9999")  // ankan
    assert(Melds.decode(17408, hasAka = false).get.atype == "kan")
    assert(Melds.decode(17410, hasAka = false).get.pais == "p9999=") // daiminkan
    assert(Melds.decode(20522, hasAka = true).get.pais == "p505=")   // red 5 pon
    assert(Melds.decode(33, hasAka = false).isEmpty)                 // nuki
  }

  test("pack layout roundtrip") {
    samples(500) { r =>
      (r.nextInt(256), r.nextInt(256), r.nextInt(256),
       r.nextInt(8), r.nextInt(4), r.nextInt(4))
    }.foreach { case (p0, p1, p2, typ, by, idx) =>
        val v = Melds.pack(p0, p1, p2, typ, by, idx)
        assert((v & 0xFF) == p0)
        assert(((v >> 8) & 0xFF) == p1)
        assert(((v >> 16) & 0xFF) == p2)
        assert(((v >> 24) & 7) == typ)
        assert(((v >> 27) & 3) == by)
        assert(((v >> 29) & 3) == idx)
    }
  }

  // ------------------------------------------------------ GO flags (F7)

  test("GO flag decode golden") {
    val g = GoFlags(171) // 0xAB
    assert(g.hasAka); assert(!g.demo); assert(g.ariari)
    assert(!g.tonpu); assert(!g.isSanma); assert(!g.soku)
    assert(g.level == 3)
    assert(g.akaType == 73); assert(g.initialScore == 25000)
    val s = GoFlags(0x10)
    assert(s.isSanma); assert(s.initialScore == 35000); assert(s.demo)
    assert(GoFlags(0x10000).kanInRiichi == 1)
  }

  // -------------------------------------------------------- lookups (F5/F6)

  test("yaku table shape") {
    assert(Lookups.YakuTable.size == 55)
    assert(Lookups.YakuTable(36) == "")
    assert(Lookups.YakuTable(0).nonEmpty)
    assert(Lookups.YakuTable(54).nonEmpty)
    assert(Lookups.YakuTable.zipWithIndex.count(_._1.isEmpty) == 1)
  }

  test("nagare names default") {
    assert(Lookups.nagareName(Some("yao9")) == "九種九牌")
    assert(Lookups.nagareName(Some("unknown")) == Lookups.NagareDefault)
    assert(Lookups.nagareName(None) == Lookups.NagareDefault)
  }
}
