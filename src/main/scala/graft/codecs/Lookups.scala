package graft.codecs

/** Static lookup tables (reference F5/F6, scrape.py:137-202).
  * The yaku names are the standard Tenhou yaku-id ordering (0–54; index
  * 36 is unused, 37+ are yakuman); nagare names map Tenhou abort codes.
  */
object Lookups {
  val YakuTable: Vector[String] =
    ("門前清自摸和/立直/一発/槍槓/嶺上開花/海底摸月/河底撈魚/平和/断幺九/一盃口/" +
     "自風 東/自風 南/自風 西/自風 北/場風 東/場風 南/場風 西/場風 北/" +
     "役牌 白/役牌 發/役牌 中/両立直/七対子/混全帯幺九/一気通貫/三色同順/" +
     "三色同刻/三槓子/対々和/三暗刻/小三元/混老頭/二盃口/純全帯幺九/混一色/" +
     "清一色//天和/地和/大三元/四暗刻/四暗刻単騎/字一色/緑一色/清老頭/" +
     "九蓮宝燈/純正九蓮宝燈/国士無双/国士無双１３面/大四喜/小四喜/四槓子/" +
     "ドラ/裏ドラ/赤ドラ").split("/", -1).toVector

  def yakuName(id: Int): String = YakuTable(id)

  val NagareTable: Map[String, String] = Map(
    "nm"     -> "流し満貫",
    "yao9"   -> "九種九牌",
    "kaze4"  -> "四風連打",
    "reach4" -> "四家立直",
    "ron3"   -> "三家和了",
    "kan4"   -> "四槓散了"
  )

  val NagareDefault = "流局"

  def nagareName(typ: Option[String]): String =
    typ.flatMap(NagareTable.get).getOrElse(NagareDefault)

  /** Seat winds per dealer index (scrape.py:442): kazes(seat) = wind of
    * that seat when `oya` deals (0=E 1=S 2=W 3=N).
    */
  val KazeTable: Vector[Vector[Int]] =
    Vector(Vector(0, 1, 2, 3), Vector(3, 0, 1, 2),
           Vector(2, 3, 0, 1), Vector(1, 2, 3, 0))
}
