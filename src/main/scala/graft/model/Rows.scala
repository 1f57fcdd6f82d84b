package graft.model

import java.sql.Date

/** Typed event model for one parsed game (reference tables, SURVEY.md
  * §1.3). Children of a kyoku are nested so the whole game parses in one
  * task with no cross-row state; kyoku ids are assigned afterwards with
  * one narrow shuffle (SURVEY.md §7.4) and children are exploded out.
  *
  * Unsigned arrow types in the reference map to signed Spark types — all
  * values provably fit (SURVEY.md §1.4).
  */
final case class YakuStat(name: String, han: Int)

final case class HaipaiRow(player_index: Int, haipai: String, pai_ids: Seq[Int])

final case class ActionRow(player_index: Int, seq: Int, `type`: String,
                           pais: String, pai_id: Option[Long])

final case class AgariRow(
    machipai: Int, score: Int, fu: Int, han: Int, tehai: String,
    pai_ids: Seq[Long], yaku: Seq[YakuStat],
    dora: Seq[Int], uradora: Seq[Int],
    dora_orig: Seq[Int], uradora_orig: Seq[Int],
    who: Int, by: Int, score_diff: Seq[Int], owari: Boolean, nukidora: Int)

final case class NagareRow(name: String, score_diff: Seq[Int])

final case class ParsedKyoku(
    idx: Int, // INIT order within the game; global id assigned later
    kyoku_num: Int, honba: Int, reachbou: Int,
    scores: Seq[Int], kazes: Seq[Int],
    haipais: Seq[HaipaiRow], actions: Seq[ActionRow],
    agaris: Seq[AgariRow], nagares: Seq[NagareRow])

final case class GameScoreRow(player_index: Int, score: Int, point: BigDecimal)

final case class RuleRow(
    enable_kuitan: Boolean, enable_atozuke: Boolean, enable_pao: Boolean,
    enable_tobi: Boolean, enable_wareme: Boolean, enable_kunaoshi: Boolean,
    enable_kuriage: Boolean, enable_agariyame: Boolean,
    enable_minus_riichi: Boolean, enable_ryanhan_shibari: Boolean,
    enable_keiten: Boolean, aka_type: Int, shanyu_score: Int,
    nannyu_score: Int, uradora_type: Int, furiten_riichi_type: Int,
    oyanagare_type: Int, double_ron_type: Int, kan_in_riichi_type: Int,
    initial_score: Int, is_demo: Boolean, is_soku: Boolean,
    is_sanma: Boolean, level: Int)

/** One fully-parsed game: everything the 9 reference tables need.
  * `games` keeps the richer flag set the reference computes but drops at
  * write time (divergence decision, SURVEY.md §1.5.1).
  */
final case class ParsedGame(
    game_id: String,
    dt: Date,
    tonpu: Boolean, ariari: Boolean, sanma: Boolean, demo: Boolean,
    soku: Boolean, has_aka: Boolean, level: Int,
    rule: Option[RuleRow],
    players: Seq[String],        // by player_index
    game_scores: Seq[GameScoreRow],
    kyokus: Seq[ParsedKyoku])
