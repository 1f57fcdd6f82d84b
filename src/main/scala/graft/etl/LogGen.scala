package graft.etl

import java.nio.file.{Files, Paths}

import scala.util.Random

/** Deterministic synthetic mjlog generator for throughput measurement:
  * emits structurally-valid game files (GO/UN/TAIKYOKU/INIT/draw/discard/
  * AGARI/RYUUKYOKU) that both this engine and the reference parser
  * accept. Usage: LogGen <outDir> <nDates> <gamesPerDate> [seed]
  */
object LogGen {

  def genGame(rng: Random, gameIdx: Int): String = {
    val sb = new StringBuilder
    sb.append("<mjloggm ver=\"2.3\">\n")
    sb.append("<GO type=\"169\" lobby=\"0\"/>\n")
    sb.append(s"""<UN n0="p${gameIdx}a" n1="p${gameIdx}b" n2="p${gameIdx}c" n3="p${gameIdx}d" dan="1,1,1,1"/>""").append('\n')
    sb.append("<TAIKYOKU oya=\"0\"/>\n")
    val nKyoku = 6 + rng.nextInt(4)
    for (k <- 0 until nKyoku) {
      val wall = rng.shuffle((0 until 136).toVector)
      val oya = k % 4
      val hais = (0 until 4).map(p => wall.slice(p * 13, p * 13 + 13))
      sb.append(s"""<INIT seed="$k,0,0,${rng.nextInt(6)},${rng.nextInt(6)},${wall(52)}" """)
      sb.append(s"""ten="250,250,250,250" oya="$oya" """)
      sb.append((0 until 4).map(p => s"""hai$p="${hais(p).mkString(",")}"""").mkString(" "))
      sb.append("/>\n")
      // draw/discard rounds from the live wall
      var pos = 53
      val seats = "TUVW"
      val outs = "DEFG"
      val rounds = 12 + rng.nextInt(8)
      for (r <- 0 until rounds if pos < 135) {
        val p = r % 4
        val t = wall(pos); pos += 1
        sb.append(s"<${seats(p)}$t/> <${outs(p)}$t/>\n")
        // occasional meld call (pon of m9; valid for both decoders —
        // also keeps the reference's pandas schema inference alive,
        // which requires ≥1 pai_id-bearing action per date batch)
        if (r == 5) sb.append(s"""<N who="${(p + 1) % 4}" m="12297"/>""").append('\n')
      }
      val isLast = k == nKyoku - 1
      if (isLast || rng.nextInt(3) == 0) {
        val winner = rng.nextInt(4)
        val hand = (hais(winner) :+ wall(pos % 136)).mkString(",")
        val machi = wall(pos % 136)
        val owari = if (isLast) """ owari="300,30.0,250,10.0,250,-10.0,200,-30.0"""" else ""
        sb.append(s"""<AGARI ba="0,0" hai="$hand" machi="$machi" ten="30,3900,0" """)
        sb.append(s"""yaku="7,1,52,${rng.nextInt(3)}" doraHai="${wall(52)}" who="$winner" fromWho="$winner" """)
        sb.append(s"""sc="250,39,250,-13,250,-13,250,-13"$owari/>""").append('\n')
      } else {
        sb.append("""<RYUUKYOKU sc="250,0,250,0,250,0,250,0"/>""").append('\n')
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
