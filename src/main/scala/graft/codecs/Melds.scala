package graft.codecs

/** Meld (naki) codec for Tenhou's 16-bit `m` attribute
  * (reference: scrape.py:204-352).
  *
  * Divergence note (SURVEY.md §1.5.3): the reference's tile-id packing
  * `(suit * 9 + n) << 2 + copy` binds as `<< (2 + copy)` in Python — an
  * operator-precedence bug. We implement the *intended* packing
  * `((suit * 9 + n) << 2) | copy` (n is the 1-based rank, as in the
  * reference's formula).
  */
object Melds {
  val TypeNone   = 0
  val TypeRiichi = 1
  val TypeAnkan  = 2
  val TypeTii    = 4
  val TypePon    = 5
  val TypeMinkan = 6

  /** One decoded meld: rendered tile string, action type
    * ("tii"|"pon"|"kan"), and the 31-bit packed representation.
    */
  final case class Meld(pais: String, atype: String, packed: Long)

  /** Bit-pack a meld (reference F1, scrape.py:212-213):
    * p0 | p1<<8 | p2<<16 | typ<<24 | by<<27 | index<<29 (bits 0–30).
    */
  def pack(p0: Int, p1: Int, p2: Int, typ: Int, by: Int, index: Int): Long =
    (p0.toLong) | (p1.toLong << 8) | (p2.toLong << 16) |
      (typ.toLong << 24) | (by.toLong << 27) | (index.toLong << 29)

  /** Intended per-tile packing: 1-based-rank tile index <<2 | copy. */
  private def tileCode(suit: Int, n1: Int, copy: Int): Int =
    ((suit * 9 + n1) << 2) | copy

  private val FromMarks = Vector("", "+", "=", "-")

  /** Decode the 16-bit meld field. Returns None for undecodable melds
    * (nuki-dora in sanma; the caller counts them — scrape.py:507-508).
    */
  def decode(m: Int, hasAka: Boolean): Option[Meld] = {
    val fromWho = m & 0x03
    val d = FromMarks(fromWho)

    if ((m & 0x0004) != 0) {
      // chii: consecutive run n, n+1, n+2
      val pt = (m & 0xFC00) >> 10
      val r = pt % 3       // which of the three came from the discard
      val pn = pt / 3
      val suit = pn / 7
      val n = pn % 7 + 1
      val nn = Array(n, n + 1, n + 2)
      val copies = Array((m & 0x0018) >> 3, (m & 0x0060) >> 5, (m & 0x0180) >> 7)
      val digits = (0 until 3).map { i =>
        val base =
          if (hasAka && copies(i) == 0 && nn(i) == 5) "0" else nn(i).toString
        if (i == r) base + d else base
      }
      val ids = (0 until 3).map(i => tileCode(suit, nn(i), copies(i)))
      Some(Meld(Tiles.SuitLetters(suit) + digits.mkString,
                "tii", pack(ids(0), ids(1), ids(2), TypeTii, fromWho, r)))
    } else if ((m & 0x0018) != 0) {
      // pon (m&8) or added kan (m&16)
      val pt = (m & 0xFE00) >> 9
      val r = pt % 3
      val pn = pt / 3
      val suit = pn / 9
      if (suit > 3) return None // field values past z7 are not tiles
      val s = Tiles.SuitLetters(suit)
      val n = pn % 9 + 1
      val nn = Array(n, n, n, n)
      val unused = (m & 0x0060) >> 5
      val copies = (0 to 3).filter(_ != unused)
      if (hasAka && s != "z" && n == 5) {
        // place the red '0' where the 0th copy sits in the rendering
        if (unused == 0) nn(3) = 0
        else if (r == 0) nn(2) = 0
        else nn(1) = 0
      }
      val ids = copies.map(c => tileCode(suit, n, c))
      if ((m & 0x0008) != 0)
        Some(Meld(s + nn.take(3).mkString + d, "pon",
                  pack(ids(0), ids(1), ids(2), TypePon, fromWho, r)))
      else
        Some(Meld(s + nn.take(3).mkString + d + nn(3), "kan",
                  pack(tileCode(suit, n, 0), 0, 0, TypeMinkan, fromWho, r)))
    } else if ((m & 0x0030) == 0) {
      // closed kan (fromWho==0) or open daiminkan
      val pt = m >> 8
      val r = pt % 4
      val pn = pt / 4
      val suit = pn / 9
      if (suit > 3) return None // field values past z7 are not tiles
      val s = Tiles.SuitLetters(suit)
      val n = pn % 9 + 1
      val nn = Array(n, n, n, n)
      if (hasAka && s != "z" && n == 5) {
        if (d == "" || r == 0) nn(3) = 0 else nn(2) = 0
      }
      val typ = if (fromWho == 0) TypeAnkan else TypeMinkan
      Some(Meld(s + nn.mkString + d, "kan",
                pack(tileCode(suit, n, 0), 0, 0, typ, fromWho, r)))
    } else None
  }
}
