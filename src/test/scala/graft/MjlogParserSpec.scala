package graft

import java.time.LocalDate

import org.scalatest.funsuite.AnyFunSuite

import graft.etl.MjlogParser
import graft.model._

/** Golden-output tests per parser event branch (SURVEY.md §5.2.2),
  * using the fixture games in src/test/resources/mjlog/.
  */
class MjlogParserSpec extends AnyFunSuite {

  private def fixture(name: String): String = {
    val in = getClass.getResourceAsStream(s"/mjlog/$name")
    try scala.io.Source.fromInputStream(in, "UTF-8").mkString
    finally in.close()
  }

  private lazy val g1 = MjlogParser.parse(
    fixture("20240101/2024010100gm-0001.xml"), "2024010100gm-0001",
    LocalDate.of(2024, 1, 1))
  private lazy val g2 = MjlogParser.parse(
    fixture("20240101/2024010101gm-0002.xml"), "2024010101gm-0002",
    LocalDate.of(2024, 1, 1))
  private lazy val g3 = MjlogParser.parse(
    fixture("20240102/2024010200gm-0003.xml"), "2024010200gm-0003",
    LocalDate.of(2024, 1, 2))

  test("GO flags and rules (type=171)") {
    assert(g1.has_aka && g1.ariari && !g1.tonpu && !g1.sanma && !g1.demo)
    assert(g1.level == 3)
    val r = g1.rule.get
    assert(r.enable_kuitan && r.enable_atozuke)
    assert(r.aka_type == 73)
    assert(r.initial_score == 25000)
    assert(r.nannyu_score == -1) // hanchan
    assert(r.level == 3)
  }

  test("UN url-decoded player names in index order") {
    assert(g1.players == Seq("一", "二", "三", "四"))
    assert(g2.players == Seq("alice", "bob", "carol", "dave"))
    assert(g3.players == Seq("p北", "q", "r")) // sanma: 3 names
  }

  test("INIT kyoku fields and haipai rendering") {
    assert(g1.kyokus.size == 1)
    val k = g1.kyokus.head
    assert(k.kyoku_num == 0 && k.honba == 0 && k.reachbou == 0)
    assert(k.scores == Seq(25000, 25000, 25000, 25000))
    assert(k.kazes == Seq(0, 1, 2, 3)) // oya=0
    assert(k.haipais.size == 4)
    assert(k.haipais.head.haipai == "m123406789p1234") // aka: 16 renders 0
    assert(k.haipais(1).haipai == "m123456789p1234")   // copy 1: plain 5
    assert(k.haipais.head.pai_ids == (0 to 48 by 4))
  }

  test("draw/discard actions: seats, tsumogiri and riichi markers") {
    val as = g1.kyokus.head.actions
    // T52 by oya seat 0: red five p0
    assert(as(0) == ActionRow(0, 0, "tsumo", "p0", None))
    // D52: tsumogiri -> underscore; renders the discarded tile
    assert(as(1) == ActionRow(0, 1, "sutehai", "p0_", None))
    assert(as(2) == ActionRow(1, 2, "tsumo", "p5", None))
    assert(as(3) == ActionRow(1, 3, "sutehai", "p5_", None))
    // N who=2 m=12345: pon of m9 from shimocha
    assert(as(4).`type` == "pon" && as(4).pais == "m999+" && as(4).player_index == 2)
    assert(as(4).pai_id.isDefined)
    // F41 after REACH step=1: riichi star, not tsumogiri
    assert(as(5) == ActionRow(2, 5, "sutehai", "p2*", None))
  }

  test("kyoku kazes rotate with oya") {
    assert(g2.kyokus.head.kazes == Seq(3, 0, 1, 2)) // oya=1
    assert(g2.kyokus(1).kazes == Seq(2, 3, 0, 1))   // oya=2
  }

  test("meld branches: ankan, pon, kakan in action stream") {
    val as = g2.kyokus.head.actions
    val melds = as.filter(_.pai_id.isDefined)
    assert(melds.map(_.`type`) == Seq("kan", "pon", "kan"))
    assert(melds.map(_.pais) == Seq("p9999", "z555+", "z555+5"))
    assert(melds.map(_.player_index) == Seq(0, 3, 1))
    // draw after a kan is flagged tsumo_k
    val afterKan = as(as.indexWhere(_.`type` == "kan") + 1)
    assert(afterKan.`type` == "tsumo_k")
  }

  test("RYUUKYOKU: named abort and default, score diffs x100") {
    val n1 = g2.kyokus.head.nagares.head
    assert(n1.name == "九種九牌")
    assert(n1.score_diff == Seq(0, 0, 0, 0))
    val n2 = g2.kyokus(1).nagares.head
    assert(n2.name == "流局")
    assert(n2.score_diff == Seq(-1000, -1000, 2000, 0))
  }

  test("AGARI: ron with yaku, dora mapping, owari scores") {
    val a = g1.kyokus.head.agaris.head
    assert(a.machipai == 52 && a.fu == 30 && a.score == 7700)
    assert(a.who == 0 && a.by == 1 && a.owari)
    assert(a.han == 4) // 1 + 1 + 2
    assert(a.yaku == Seq(YakuStat("門前清自摸和", 1), YakuStat("平和", 1),
                         YakuStat("ドラ", 2)))
    assert(a.tehai == "m123406789p12340") // machi moved last, aka digits
    assert(a.pai_ids.last == 52L)
    assert(a.dora_orig == Seq(92) && a.dora == Seq(96)) // s6 -> s7
    assert(a.uradora_orig == Seq(16) && a.uradora == Seq(20))
    assert(a.score_diff == Seq(7700, -7700, 0, 0))
    assert(a.nukidora == 0)
    assert(g1.game_scores == Seq(
      GameScoreRow(0, 32700, BigDecimal("32.7")),
      GameScoreRow(1, 16300, BigDecimal("-16.3")),
      GameScoreRow(2, 25000, BigDecimal("5.0")),
      GameScoreRow(3, 25000, BigDecimal("-21.4"))))
  }

  test("sanma: empty hai3 skipped, nuki melds counted as nukidora, yakuman han") {
    assert(g3.sanma)
    assert(g3.rule.get.initial_score == 35000)
    val k = g3.kyokus.head
    assert(k.haipais.size == 3) // hai3 empty
    assert(k.scores == Seq(35000, 35000, 35000, 0))
    // N who=1 m=33: 0x20 set -> undecodable (nuki) -> no action row
    assert(!k.actions.exists(_.`type` == "pon"))
    val a = k.agaris.head
    assert(a.han == 13 + 1 + 3) // yakuman 37 + riichi 1 + aka 3
    assert(a.yaku.head == YakuStat("天和", 0))
  }

  test("multi-kyoku games index sequentially") {
    assert(g2.kyokus.map(_.idx) == Seq(0, 1))
  }
}
