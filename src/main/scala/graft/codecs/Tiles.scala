package graft.codecs

/** Tile codec (reference: scrape.py:216-259).
  *
  * Tile-id model: ids 0–135; suit = id/36 (0=m man, 1=p pin, 2=s sou,
  * 3=z honor), rank = (id%36)/4 (0-based), copy = id%4. The 0th copy of
  * rank-5 in each numbered suit is the red five when aka rules are on.
  */
object Tiles {
  val SuitLetters: Vector[String] = Vector("m", "p", "s", "z")

  def suit(id: Int): Int = id / 36
  def rank0(id: Int): Int = (id % 36) / 4 // 0-based rank
  def copy(id: Int): Int = id % 4

  def isRedFive(id: Int, hasAka: Boolean): Boolean =
    hasAka && suit(id) != 3 && rank0(id) == 4 && copy(id) == 0

  /** Dora indicated by an indicator tile: the "next" tile in its suit
    * with wraparound; honor suit cycles winds E→S→W→N→E and dragons
    * 白→發→中→白 separately (scrape.py:216-235). Copy index is preserved.
    */
  def doraFromIndicator(id: Int): Int = {
    val s = suit(id)
    val n0 = rank0(id)
    val next =
      if (s == 3) {
        val n = n0 + 1
        if (n == 4) 0      // N wraps to E
        else if (n == 7) 4 // 中 wraps to 白
        else n
      } else {
        val n = n0 + 1
        if (n >= 9) 0 else n
      }
    s * 36 + next * 4 + copy(id)
  }

  def doraFromIndicators(ids: Seq[Int]): Seq[Int] = ids.map(doraFromIndicator)

  /** Render tile ids as a compact mpsz string (scrape.py:238-259): sort,
    * emit the suit letter once per suit run, digits are 1-based ranks,
    * red five renders as '0'.
    */
  def numToHai(ids: Seq[Int], hasAka: Boolean): String = {
    val sb = new StringBuilder
    var cur = -1
    ids.sorted.foreach { id =>
      val s = suit(id)
      if (s != cur) { sb.append(SuitLetters(s)); cur = s }
      val digit = if (isRedFive(id, hasAka)) 0 else rank0(id) + 1
      sb.append(digit)
    }
    sb.toString
  }
}
