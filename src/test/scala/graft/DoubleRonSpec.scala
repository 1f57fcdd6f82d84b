package graft

import java.time.LocalDate

import org.scalatest.funsuite.AnyFunSuite

import graft.etl.MjlogParser

/** Double-ron: Tenhou emits two AGARI tags for one kyoku (two players
  * win off the same discard); both rows must land on the same kyoku
  * (reference behavior: two appends with the same kyoku_id,
  * scrape.py:534). Also covers AGARI with melds (m attr) and nukidora
  * counting inside AGARI.
  */
class DoubleRonSpec extends AnyFunSuite {

  private val xml =
    """<mjloggm ver="2.3">
      |  <GO type="169" lobby="0"/>
      |  <UN n0="a" n1="b" n2="c" n3="d" dan="1,1,1,1"/>
      |  <TAIKYOKU oya="0"/>
      |  <INIT seed="0,0,0,0,0,10" ten="250,250,250,250" oya="0"
      |        hai0="0,4,8,12,16,20,24,28,32,36,40,44,48"
      |        hai1="1,5,9,13,17,21,25,29,33,37,41,45,49"
      |        hai2="2,6,10,14,18,22,26,30,34,38,42,46,50"
      |        hai3="3,7,11,15,19,23,27,31,35,39,43,47,51"/>
      |  <T52/> <D52/>
      |  <AGARI ba="0,0" hai="0,4,8,12,16,20,24,28,32,36,40,44,48,52" machi="52"
      |         ten="30,3900,0" yaku="7,1" doraHai="10"
      |         who="1" fromWho="0" sc="250,-39,250,39,250,0,250,0"/>
      |  <AGARI ba="0,0" hai="2,6,10,14,18,22,26,30,34,52" machi="52"
      |         ten="40,8000,1" yaku="0,2" m="12297,33" doraHai="10"
      |         who="2" fromWho="0" sc="250,-80,250,0,250,80,250,0"
      |         owari="131,-50.0,289,8.9,330,53.0,250,-11.9"/>
      |</mjloggm>""".stripMargin

  private lazy val g = MjlogParser.parse(xml, "dron", LocalDate.of(2024, 2, 1))

  test("both AGARI rows attach to the single kyoku") {
    assert(g.kyokus.size == 1)
    val agaris = g.kyokus.head.agaris
    assert(agaris.size == 2)
    assert(agaris.map(_.who) == Seq(1, 2))
    assert(agaris.map(_.by) == Seq(0, 0)) // both off the dealer's discard
    assert(agaris.head.score == 3900 && agaris(1).score == 8000)
    assert(agaris.head.owari == false && agaris(1).owari == true)
  }

  test("second winner's melds decode and nuki counts as nukidora") {
    val a = agari2
    // m="12297,33": 12297 is a pon of m9, 33 is an undecodable nuki
    assert(a.nukidora == 1)
    assert(a.tehai.split(",").length == 2) // hand + one meld string
    assert(a.tehai.split(",")(1) == "m999+")
  }

  test("owari on the second AGARI yields game scores once") {
    assert(g.game_scores.size == 4)
    assert(g.game_scores.map(_.score) == Seq(13100, 28900, 33000, 25000))
  }

  private def agari2 = g.kyokus.head.agaris(1)
}
