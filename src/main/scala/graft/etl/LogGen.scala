package graft.etl

import java.nio.file.{Files, Paths}

import scala.util.Random

/** Deterministic synthetic mjlog generator for throughput measurement
  * AND the cross-engine ETL gate corpus: emits structurally-valid game
  * files that both this engine and the reference parser accept.
  *
  * The generated corpus deliberately spans the parser's BRANCHY paths,
  * not just the happy path (reference coverage in parens):
  *   - GO types cycling 4p/sanma × aka × level × soku × kan-in-riichi
  *     (scrape.py:371-417), so win-rate-by-rule has ≥ 3 rule groups;
  *   - URL-encoded UN names (scrape.py:419-431) and sanma's empty n3;
  *   - chii / pon / added-kan / closed-kan / daiminkan meld calls
  *     spanning nakimentsu's branch space incl. red-5 rendering
  *     (scrape.py:262-352), plus sanma nuki-dora (undecodable m →
  *     skipped as an action, counted as nukidora in AGARI hands);
  *   - REACH step-1/step-2 markers so discards carry `*` (and `_` for
  *     tsumogiri) (scrape.py:474-475,599-603);
  *   - DORA reveal events after kans (row-less, scrape.py:472);
  *   - ron (who ≠ fromWho), double-ron (two AGARI per kyoku,
  *     scrape.py:476-560), tsumo, yakuman (han += 13, yaku absent),
  *     and 0-han yaku entries the parser must drop;
  *   - named RYUUKYOKU abort types (scrape.py:195-202) plus default.
  *
  * Usage: LogGen <outDir> <nDates> <gamesPerDate> [seed]
  */
object LogGen {

  /** GO types exercised, cycled per game (bit meanings in GoFlags):
    * 169 4p base (level 3) · 171 +aka · 41 level 2 · 137 level 1 ·
    * 9 level 0 · 233 +soku · 185 sanma · 187 sanma+aka ·
    * 65705 kan-in-riichi rule bit set.
    */
  private val GoTypes = Vector(169, 171, 41, 137, 9, 233, 185, 187, 65705)

  /** Yaku-id pool for normal (id, han) pairs — names span ≥ 10 rows of
    * the yaku frequency table (ids into scrape.py's yaku_table).
    */
  private val YakuPool = Vector(0, 1, 2, 5, 7, 8, 9, 14, 18, 20, 22, 24, 28, 34, 52, 53)

  private val YakumanPool = Vector(37, 39, 40, 47, 49)

  // --- valid Tenhou meld (`m`) encodings, per nakimentsu's bit layout ---

  /** Chii: bit2 set; pt=(suit*7+n-1)*3+r at bits 10+, per-tile copies at
    * bits 3-4/5-6/7-8; fromWho=3 (chii is always from the left seat).
    */
  private def chiiM(rng: Random): Int = {
    val suit = rng.nextInt(3)
    val n = 1 + rng.nextInt(7)
    val pt = (suit * 7 + (n - 1)) * 3 + rng.nextInt(3)
    (pt << 10) | (rng.nextInt(4) << 7) | (rng.nextInt(4) << 5) |
      (rng.nextInt(4) << 3) | 0x4 | 3
  }

  /** Pon (bit3) or added kan (bit4): pt=(suit*9+n-1)*3+r at bits 9+,
    * unused-copy index at bits 5-6. Honors capped at z7 (pn ≤ 33).
    */
  private def ponLikeM(rng: Random, added: Boolean): Int = {
    val suit = rng.nextInt(4)
    val n = 1 + (if (suit == 3) rng.nextInt(7) else rng.nextInt(9))
    val pt = (suit * 9 + (n - 1)) * 3 + rng.nextInt(3)
    val bit = if (added) 0x10 else 0x8
    (pt << 9) | (rng.nextInt(4) << 5) | bit | (1 + rng.nextInt(3))
  }

  /** Closed kan (fromWho=0) or daiminkan: low 6 bits clear except
    * fromWho; pt=(suit*9+n-1)*4+r at bits 8+.
    */
  private def kanM(rng: Random, closed: Boolean): Int = {
    val suit = rng.nextInt(4)
    val n = 1 + (if (suit == 3) rng.nextInt(7) else rng.nextInt(9))
    val pt = (suit * 9 + (n - 1)) * 4 + rng.nextInt(4)
    (pt << 8) | (if (closed) 0 else 1 + rng.nextInt(3))
  }

  /** Sanma nuki-dora: bit5 set with chii/pon/kan bits clear — both
    * decoders return None (an AGARI `m` entry then counts as nukidora;
    * an N event emits no action row). 120 = a north-wind tile id.
    */
  private def nukiM(rng: Random): Int = (120 << 8) | 0x20 | rng.nextInt(4)

  private def meldM(rng: Random, kind: Int): Int = kind match {
    case 0 => chiiM(rng)
    case 1 => ponLikeM(rng, added = false)
    case 2 => ponLikeM(rng, added = true)
    case 3 => kanM(rng, closed = true)
    case 4 => kanM(rng, closed = false)
  }

  private def isKan(kind: Int): Boolean = kind >= 2

  /** One yaku attribute: normal games pick 2-4 (id, han) pairs from the
    * pool (occasionally including a 0-han entry the parser must drop);
    * ~1 game in 16 wins with yakuman instead (yaku attr absent).
    * Returns (attrString, isYakuman).
    */
  private def yakuAttrs(rng: Random, hasAka: Boolean, riichiWon: Boolean): (String, Boolean) = {
    if (rng.nextInt(16) == 0) {
      val ids = if (rng.nextInt(4) == 0)
        Seq(YakumanPool(rng.nextInt(YakumanPool.size)),
            YakumanPool(rng.nextInt(YakumanPool.size)))
      else Seq(YakumanPool(rng.nextInt(YakumanPool.size)))
      (s"""yakuman="${ids.mkString(",")}"""", true)
    } else {
      val pool = if (hasAka) YakuPool :+ 54 else YakuPool
      val n = 2 + rng.nextInt(3)
      val picked = rng.shuffle(pool).take(n)
        .map(id => s"$id,${1 + rng.nextInt(3)}")
      val withZero =
        if (rng.nextInt(3) == 0) picked :+ s"${pool(rng.nextInt(pool.size))},0"
        else picked
      val withRiichi = if (riichiWon) "1,1" +: withZero else withZero
      (s"""yaku="${withRiichi.mkString(",")}"""", false)
    }
  }

  def genGame(rng: Random, gameIdx: Int): String = {
    val goType = GoTypes(gameIdx % GoTypes.size)
    val sanma = (goType & 0x10) != 0
    val hasAka = (goType & 0x02) != 0
    val nP = if (sanma) 3 else 4

    val sb = new StringBuilder
    sb.append("<mjloggm ver=\"2.3\">\n")
    sb.append(s"""<GO type="$goType" lobby="0"/>""").append('\n')
    // every 3rd game carries URL-encoded (UTF-8 Japanese) names the
    // parser must unquote; sanma keeps n3 present-but-empty
    def uname(seat: Char): String =
      if (gameIdx % 3 == 0) s"%E9%9B%80%E5%A3%ABp$gameIdx$seat"
      else s"p$gameIdx$seat"
    val n3 = if (sanma) "" else uname('d')
    sb.append(s"""<UN n0="${uname('a')}" n1="${uname('b')}" n2="${uname('c')}" n3="$n3" dan="1,1,1,1"/>""").append('\n')
    sb.append("<TAIKYOKU oya=\"0\"/>\n")

    val nKyoku = 4 + rng.nextInt(4)
    for (k <- 0 until nKyoku) {
      val wall = rng.shuffle((0 until 136).toVector)
      val oya = k % nP
      val honba = rng.nextInt(3)
      val hais = (0 until nP).map(p => wall.slice(p * 13, p * 13 + 13))
      val haiAttrs = (0 until 4).map { p =>
        val ids = if (p < nP) hais(p).mkString(",") else ""
        s"""hai$p="$ids""""
      }
      sb.append(s"""<INIT seed="$k,$honba,${rng.nextInt(2)},${rng.nextInt(6)},${rng.nextInt(6)},${wall(52)}" """)
      sb.append(s"""ten="${if (sanma) "350,350,350,0" else "250,250,250,250"}" oya="$oya" """)
      sb.append(haiAttrs.mkString(" "))
      sb.append("/>\n")

      val seats = "TUVW"
      val outs = "DEFG"
      // deterministic plan: which rounds call melds / declare riichi
      val meldRounds: Map[Int, Int] =
        Map(5 -> ((gameIdx + k) % 5)) ++
          (if (rng.nextInt(2) == 0) Map(9 -> rng.nextInt(5)) else Map.empty)
      val riichi = (k + gameIdx) % 2 == 0
      val riichiRound = 6 + rng.nextInt(4)
      var riichiPlayer = -1

      var pos = 53
      val rounds = 12 + rng.nextInt(6)
      var kanPending = false
      for (r <- 0 until rounds if pos < 130) {
        val p = r % nP
        val letter = (p + oya) % 4
        val t = wall(pos); pos += 1
        sb.append(s"<${seats(letter)}$t/>")
        kanPending = false
        val declares = riichi && r == riichiRound
        if (declares) {
          riichiPlayer = p
          sb.append(s"""<REACH who="$p" step="1"/>""")
        }
        // alternate tsumogiri (drawn tile back out → `_` marker) with a
        // hand-tile discard; riichi discards are tsumogiri + `*`
        val dTile = if (declares || r % 3 != 2) t else hais(p)(r % 13)
        sb.append(s"<${outs(letter)}$dTile/>")
        if (declares)
          sb.append(s"""<REACH who="$p" step="2" ten="${if (sanma) "340,350,350,0" else "240,250,250,250"}"/>""")
        sb.append('\n')
        meldRounds.get(r).foreach { kind =>
          val caller = (p + 1) % nP
          sb.append(s"""<N who="$caller" m="${meldM(rng, kind)}"/>""").append('\n')
          if (isKan(kind)) {
            // kan → new-dora reveal; the next draw parses as tsumo_k
            sb.append(s"""<DORA hai="${wall(pos)}"/>""").append('\n')
            kanPending = true
          }
        }
        // sanma: occasional nuki-dora declaration (no action row)
        if (sanma && r == 4)
          sb.append(s"""<N who="$p" m="${nukiM(rng)}"/>""").append('\n')
      }
      if (kanPending) { // land the pending rinshan draw as tsumo_k
        val p = rounds % nP
        sb.append(s"<${seats((p + oya) % 4)}${wall(pos)}/>\n"); pos += 1
      }

      def agariXml(winner: Int, fromWho: Int, owari: Boolean): Unit = {
        val machi = wall(pos % 136)
        val hand = (hais(winner) :+ machi).mkString(",")
        val fu = Seq(20, 25, 30, 40)(rng.nextInt(4))
        val score = Seq(1000, 1300, 2000, 3900, 7700, 8000, 12000)(rng.nextInt(7))
        val (yakuAttr, _) = yakuAttrs(rng, hasAka, riichiPlayer == winner)
        // winning-hand melds: ~40% of wins are open; sanma hands may
        // carry nuki-dora entries (decode → None → nukidora count)
        val mAttr =
          if (rng.nextInt(5) < 2) {
            val codes = Seq.fill(1 + rng.nextInt(2))(meldM(rng, rng.nextInt(5))) ++
              (if (sanma) Seq(nukiM(rng)) else Seq.empty)
            s""" m="${codes.mkString(",")}""""
          } else if (sanma && rng.nextInt(2) == 0) s""" m="${nukiM(rng)}""""
          else ""
        val ura =
          if (riichiPlayer == winner) s""" doraHaiUra="${wall(60)}""""
          else ""
        val owariAttr =
          if (owari) {
            val pts = Seq(45.1 + rng.nextInt(20), 3.2, -12.0 - rng.nextInt(10), -30.0)
            val sc = Seq(300, 250, 220, 180)
            s""" owari="${sc.zip(pts).map { case (s0, p0) => s"$s0,$p0" }.mkString(",")}""""
          } else ""
        val deltas = (0 until 4).map(i =>
          if (i == winner) score / 100 else -(score / 300)).map(d => s"250,$d")
        sb.append(s"""<AGARI ba="$honba,0" hai="$hand" machi="$machi" ten="$fu,$score,0" """)
        sb.append(yakuAttr)
        sb.append(s""" doraHai="${wall(52)}"$ura who="$winner" fromWho="$fromWho"$mAttr """)
        sb.append(s"""sc="${deltas.mkString(",")}"$owariAttr/>""").append('\n')
      }

      val isLast = k == nKyoku - 1
      val ending = if (isLast) 0 else rng.nextInt(10)
      ending match {
        case e if e <= 2 => // tsumo (who == fromWho); winner may be the declarer
          val w = if (riichiPlayer >= 0 && e == 0) riichiPlayer else rng.nextInt(nP)
          agariXml(w, w, owari = isLast)
        case 3 | 4 => // ron
          val w = rng.nextInt(nP)
          val from = (w + 1 + rng.nextInt(nP - 1)) % nP
          agariXml(w, from, owari = false)
        case 5 => // double ron: two AGARI off the same discard
          val from = rng.nextInt(nP)
          val w1 = (from + 1) % nP
          val w2 = (from + 2) % nP
          agariXml(w1, from, owari = false)
          agariXml(w2, from, owari = false)
        case _ => // abort — named types + default 流局
          val typ = Seq(None, Some("yao9"), Some("nm"), Some("kaze4"),
                        Some("reach4"), Some("ron3"), Some("kan4"))(rng.nextInt(7))
          val t = typ.map(v => s""" type="$v"""").getOrElse("")
          sb.append(s"""<RYUUKYOKU$t sc="250,0,250,0,250,0,250,0"/>""").append('\n')
      }
    }
    sb.append("</mjloggm>\n")
    sb.toString
  }

  def main(args: Array[String]): Unit = {
    val out = args(0)
    val nDates = args(1).toInt
    val perDate = args(2).toInt
    val seed = if (args.length > 3) args(3).toLong else 42L
    val rng = new Random(seed)
    var total = 0
    for (d <- 0 until nDates) {
      val date = java.time.LocalDate.of(2024, 1, 1).plusDays(d)
        .format(java.time.format.DateTimeFormatter.BASIC_ISO_DATE)
      val dir = Paths.get(out, date)
      Files.createDirectories(dir)
      for (g <- 0 until perDate) {
        Files.writeString(dir.resolve(f"$date${g}%05dgm.xml"),
                          genGame(rng, d * perDate + g))
        total += 1
      }
    }
    println(s"[loggen] wrote $total games under $out")
  }
}
