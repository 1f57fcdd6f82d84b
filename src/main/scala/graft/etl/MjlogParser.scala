package graft.etl

import java.io.StringReader
import java.net.URLDecoder
import java.sql.Date
import java.time.LocalDate

import javax.xml.stream.{XMLInputFactory, XMLStreamConstants}

import scala.collection.mutable.ArrayBuffer
import scala.util.matching.Regex
import scala.xml.{Elem, Node}

import graft.codecs.{GoFlags, Lookups, Melds, Tiles}
import graft.model._

/** mjlog XML → typed event model (reference E7/E8, scrape.py:355-609).
  *
  * One game parses in a single sequential fold — the state machine
  * (dealer, riichi pending, kan pending, last draw) is scoped to one
  * file, so games are embarrassingly parallel across Spark tasks
  * (SURVEY.md §7.4.2). The default path is a StAX pull parser (no DOM
  * allocation — mjlog events are flat, so streaming start-elements is
  * all we need); a scala-xml entry point remains for pre-parsed trees.
  *
  * Documented divergences from the reference (SURVEY.md §1.5):
  *  - discards render the *discarded* tile; the reference renders the
  *    last drawn tile (scrape.py:597 uses `tsumohai`, a bug). The `_`
  *    tsumogiri and `*` riichi markers are kept.
  *  - meld packing uses the intended `(tile<<2)|copy` (see Melds).
  *  - kyoku ids are assigned deterministically downstream, not by file
  *    iteration order.
  */
object MjlogParser {

  private val DrawTag: Regex = "^([TUVW])(\\d+)$".r
  private val DiscardTag: Regex = "^([DEFG])(\\d+)$".r

  // XMLInputFactory is not guaranteed thread-safe; one per task thread.
  private val staxFactory = new ThreadLocal[XMLInputFactory] {
    override def initialValue(): XMLInputFactory = {
      val f = XMLInputFactory.newInstance()
      f.setProperty(XMLInputFactory.SUPPORT_DTD, false)
      f.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, false)
      f
    }
  }

  /** Streaming (StAX) parse — the ETL hot path. */
  def parse(xmlText: String, gameId: String, dt: LocalDate): ParsedGame = {
    val b = new GameBuilder(gameId, dt)
    val r = staxFactory.get().createXMLStreamReader(new StringReader(xmlText))
    try {
      while (r.hasNext) {
        if (r.next() == XMLStreamConstants.START_ELEMENT) {
          val label = r.getLocalName
          if (label != "mjloggm")
            b.onEvent(label, name => Option(r.getAttributeValue(null, name)))
        }
      }
    } finally r.close()
    b.result()
  }

  /** Parse a pre-built scala-xml tree (tests / interop). */
  def parse(root: Elem, gameId: String, dt: LocalDate): ParsedGame = {
    val b = new GameBuilder(gameId, dt)
    def attr(n: Node, name: String): Option[String] =
      n.attribute(name).map(_.text)
    root.child.foreach {
      case e: Elem => b.onEvent(e.label, name => attr(e, name))
      case _       => // text/comment nodes
    }
    b.result()
  }

  /** Sequential event fold for one game (reference scrape.py:355-368). */
  private final class GameBuilder(gameId: String, dt: LocalDate) {
    private var goFlags: GoFlags = GoFlags(0)
    private var rule: Option[RuleRow] = None
    private val playerNames = scala.collection.mutable.SortedMap.empty[String, String]
    private val gameScores = ArrayBuffer.empty[GameScoreRow]
    private val kyokus = ArrayBuffer.empty[ParsedKyoku]

    private var oya = 0
    private var reach = false
    private var kan = false
    private var tsumohai = 0
    private var actionCount = 0
    private var cur: KyokuAcc = null

    private def flushKyoku(): Unit =
      if (cur != null) { kyokus += cur.build(); cur = null }

    def onEvent(label: String, attr: String => Option[String]): Unit =
      label match {
        case "GO" =>
          val tp = attr("type").map(_.toInt).getOrElse(0)
          goFlags = GoFlags(tp)
          rule = Some(RuleRow(
            enable_kuitan = goFlags.ariari, enable_atozuke = goFlags.ariari,
            enable_pao = true, enable_tobi = true, enable_wareme = false,
            enable_kunaoshi = true, enable_kuriage = false,
            enable_agariyame = true, enable_minus_riichi = true,
            enable_ryanhan_shibari = false, enable_keiten = true,
            aka_type = goFlags.akaType, shanyu_score = 30000,
            nannyu_score = goFlags.nannyuScore, uradora_type = 2,
            furiten_riichi_type = 3, oyanagare_type = 0xF,
            double_ron_type = 1, kan_in_riichi_type = goFlags.kanInRiichi,
            initial_score = goFlags.initialScore, is_demo = goFlags.demo,
            is_soku = goFlags.soku, is_sanma = goFlags.isSanma,
            level = goFlags.level))

        case "UN" =>
          Seq("n0", "n1", "n2", "n3").foreach { k =>
            attr(k).foreach { v =>
              playerNames(k) = URLDecoder.decode(v, "UTF-8")
            }
          }

        case "TAIKYOKU" => // carries only the initial dealer; ignored

        case "INIT" =>
          flushKyoku()
          val seeds = attr("seed").get.split(",")
          oya = attr("oya").get.toInt
          kan = false; reach = false; actionCount = 0
          cur = new KyokuAcc(
            idx = kyokus.size,
            kyokuNum = seeds(0).toInt, honba = seeds(1).toInt,
            reachbou = seeds(2).toInt,
            scores = attr("ten").get.split(",").map(_.toInt * 100).toSeq,
            kazes = Lookups.KazeTable(oya))
          (0 until 4).foreach { n =>
            attr(s"hai$n").filter(_.nonEmpty).foreach { haistr =>
              val ids = haistr.split(",").map(_.toInt).toSeq
              cur.haipais += HaipaiRow(n, Tiles.numToHai(ids, goFlags.hasAka), ids)
            }
          }

        case "DORA" => // new-dora reveals carry no rows (scrape.py:472)

        case "REACH" =>
          reach = attr("step").contains("1")

        case "N" =>
          val who = attr("who").get.toInt
          Melds.decode(attr("m").get.toInt, goFlags.hasAka).foreach { meld =>
            cur.actions += ActionRow(who, actionCount, meld.atype,
                                     meld.pais, Some(meld.packed))
            actionCount += 1
            if (meld.atype == "kan") kan = true
          }

        case "AGARI" =>
          val ten = attr("ten").get.split(",")
          val sc = attr("sc").get.split(",").map(_.toInt * 100)
          val who = attr("who").get.toInt
          val fromWho = attr("fromWho").get.toInt
          val machi = attr("machi").get.toInt
          val owari = attr("owari")

          // winning hand: machi moved to the end (scrape.py:490-491)
          val handIds = attr("hai").get.split(",").map(_.toInt)
            .filter(_ != machi).toSeq :+ machi
          val tehais = ArrayBuffer(Tiles.numToHai(handIds, goFlags.hasAka))
          val paiIds = ArrayBuffer[Long](handIds.map(_.toLong): _*)
          var nukidora = 0
          attr("m").foreach { mstr =>
            mstr.split(",").reverse.foreach { mentsu =>
              Melds.decode(mentsu.toInt, goFlags.hasAka) match {
                case Some(meld) => tehais += meld.pais; paiIds += meld.packed
                case None       => nukidora += 1
              }
            }
          }

          // yakuman count 13 han each; normal yaku are (id, count) pairs
          val yakuStats = ArrayBuffer.empty[YakuStat]
          var han = 0
          attr("yakuman").foreach(_.split(",").foreach { id =>
            yakuStats += YakuStat(Lookups.yakuName(id.toInt), 0)
            han += 13
          })
          attr("yaku").foreach { ystr =>
            ystr.split(",").grouped(2).foreach { pair =>
              val cnt = pair(1).toInt
              if (cnt > 0) {
                yakuStats += YakuStat(Lookups.yakuName(pair(0).toInt), cnt)
                han += cnt
              }
            }
          }

          val doras = attr("doraHai").get.split(",").map(_.toInt).toSeq
          val uradoras = attr("doraHaiUra")
            .map(_.split(",").map(_.toInt).toSeq).getOrElse(Seq.empty)

          cur.agaris += AgariRow(
            machipai = machi, score = ten(1).toInt, fu = ten(0).toInt,
            han = han, tehai = tehais.mkString(","), pai_ids = paiIds.toSeq,
            yaku = yakuStats.toSeq,
            dora = Tiles.doraFromIndicators(doras),
            uradora = Tiles.doraFromIndicators(uradoras),
            dora_orig = doras, uradora_orig = uradoras,
            who = who, by = fromWho,
            score_diff = Seq(sc(1), sc(3), sc(5), sc(7)),
            owari = owari.isDefined, nukidora = nukidora)

          owari.foreach { ostr =>
            val parts = ostr.split(",")
            parts.grouped(2).zipWithIndex.foreach { case (pair, idx) =>
              gameScores += GameScoreRow(idx, pair(0).toInt * 100,
                                         BigDecimal(pair(1)))
            }
          }

        case "RYUUKYOKU" =>
          val sc = attr("sc").get.split(",").map(_.toInt * 100)
          cur.nagares += NagareRow(Lookups.nagareName(attr("type")),
                                   Seq(sc(1), sc(3), sc(5), sc(7)))

        case DrawTag(letter, num) =>
          val who = (letter.head - 'T' + 4 - oya) % 4
          tsumohai = num.toInt
          val typ = if (kan) "tsumo_k" else "tsumo"
          cur.actions += ActionRow(who, actionCount, typ,
            Tiles.numToHai(Seq(tsumohai), goFlags.hasAka), None)
          actionCount += 1
          kan = false

        case DiscardTag(letter, num) =>
          val who = (letter.head - 'D' + 4 - oya) % 4
          val sutehai = num.toInt
          var p = Tiles.numToHai(Seq(sutehai), goFlags.hasAka)
          if (sutehai == tsumohai) p += "_"
          if (reach) p += "*"
          reach = false
          cur.actions += ActionRow(who, actionCount, "sutehai", p, None)
          actionCount += 1

        case _ => // unknown tags are skipped
      }

    def result(): ParsedGame = {
      flushKyoku()
      ParsedGame(
        game_id = gameId, dt = Date.valueOf(dt),
        tonpu = goFlags.tonpu, ariari = goFlags.ariari, sanma = goFlags.isSanma,
        demo = goFlags.demo, soku = goFlags.soku, has_aka = goFlags.hasAka,
        level = goFlags.level,
        rule = rule,
        players = playerNames.values.toSeq,
        game_scores = gameScores.toSeq,
        kyokus = kyokus.toSeq)
    }
  }

  /** Mutable accumulator for the kyoku being parsed. */
  private final class KyokuAcc(idx: Int, kyokuNum: Int, honba: Int,
                               reachbou: Int, scores: Seq[Int], kazes: Seq[Int]) {
    val haipais = ArrayBuffer.empty[HaipaiRow]
    val actions = ArrayBuffer.empty[ActionRow]
    val agaris  = ArrayBuffer.empty[AgariRow]
    val nagares = ArrayBuffer.empty[NagareRow]
    def build(): ParsedKyoku =
      ParsedKyoku(idx, kyokuNum, honba, reachbou, scores, kazes,
                  haipais.toSeq, actions.toSeq, agaris.toSeq, nagares.toSeq)
  }
}
