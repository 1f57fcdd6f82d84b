package graft.codecs

/** GO `type` bitfield decode (reference F7, scrape.py:371-417).
  * Note the inverted bits: bit0=0 → real game, bit2=0 → ariari
  * (kuitan+atozuke allowed), bit3=0 → East-only (tonpu).
  */
final case class GoFlags(tp: Int) {
  val hasAka: Boolean  = (tp & 0x02) != 0
  val isSanma: Boolean = (tp & 0x10) != 0
  val tonpu: Boolean   = (tp & 0x08) == 0
  val ariari: Boolean  = (tp & 0x04) == 0
  val demo: Boolean    = (tp & 0x01) == 0
  val soku: Boolean    = (tp & 0x40) != 0
  val level: Int       = ((tp & 0x20) >> 4) | ((tp & 0x80) >> 7)
  val kanInRiichi: Int = (tp & 0x10000) >> 16
  /** aka_type 73 = octal 111: one red five per numbered suit under
    * 3-bit-per-suit packing (scrape.py:404; see SURVEY.md §1.5.8 on the
    * ER discrepancy).
    */
  val akaType: Int       = if (hasAka) 73 else 0
  val initialScore: Int  = if (isSanma) 35000 else 25000
  val nannyuScore: Int   = if (tonpu) 0 else -1
}
