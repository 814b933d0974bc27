package graft.ml

import scala.util.Random

/** Seeded Monte-Carlo tournament simulation (SURVEY.md §2.9 M3–M5;
  * ml_project.py:245-340): match outcome = mode of 50 categorical draws
  * over (win, draw, loss) probabilities from the outer product of two
  * Poisson score pmfs; winner/loser scores = modes of renormalized
  * marginal pmfs; round-robin groups with 3/1/0 points and
  * points→diff→goals tiebreak; knockout bracket with elimination mode
  * (no draws).
  *
  * Driver-side by design, like the reference: the relational engine
  * produces team strengths (λ); the sim is O(matches × draws) scalar work
  * on a handful of teams. Deterministic under a fixed seed.
  */
object Simulate {

  val maxGoals = 10

  def poissonPmf(k: Int, lambda: Double): Double = {
    var logP = -lambda + k * math.log(lambda)
    var i = 2
    while (i <= k) { logP -= math.log(i); i += 1 }
    math.exp(logP)
  }

  /** Joint score matrix → (pWin, pDraw, pLoss) for team1 vs team2. */
  def outcomeProbs(l1: Double, l2: Double): (Double, Double, Double) = {
    val p1 = Array.tabulate(maxGoals + 1)(poissonPmf(_, l1))
    val p2 = Array.tabulate(maxGoals + 1)(poissonPmf(_, l2))
    var win = 0.0; var draw = 0.0; var loss = 0.0
    for (i <- 0 to maxGoals; j <- 0 to maxGoals) {
      val p = p1(i) * p2(j)
      if (i > j) win += p else if (i == j) draw += p else loss += p
    }
    (win, draw, loss)
  }

  case class MatchResult(homeGoals: Int, awayGoals: Int) {
    def winner: Int = Integer.compare(homeGoals, awayGoals) // 1 home, 0 draw, -1 away
  }

  /** M3: mode of `draws` categorical samples; in elimination mode the draw
    * outcome is excluded and probabilities renormalized (ml_project.py:
    * 252-257). Scores are modes of the truncated renormalized pmfs
    * conditioned on the outcome. */
  def simulateMatch(rng: Random, l1: Double, l2: Double,
                    elimination: Boolean, draws: Int = 50): MatchResult = {
    val (w, d, l) = outcomeProbs(l1, l2)
    val (pw, pd) = if (elimination) (w / (w + l), 0.0) else (w / (w + d + l), d / (w + d + l))
    val outcomes = Array.fill(draws) {
      val u = rng.nextDouble()
      if (u < pw) 1 else if (u < pw + pd) 0 else -1
    }
    val outcome = outcomes.groupBy(identity).toSeq
      .maxBy { case (k, v) => (v.length, k) }._1
    def modeScore(lambda: Double, atLeast: Int): Int =
      (atLeast to maxGoals).maxBy(k => poissonPmf(k, lambda))
    outcome match {
      case 1 =>
        val hg = math.max(modeScore(l1, 1), 1); MatchResult(hg, math.min(hg - 1, modeScore(l2, 0)))
      case -1 =>
        val ag = math.max(modeScore(l2, 1), 1); MatchResult(math.min(ag - 1, modeScore(l1, 0)), ag)
      case _ =>
        val g = modeScore((l1 + l2) / 2, 0); MatchResult(g, g)
    }
  }

  case class Standing(team: String, points: Int, diff: Int, goals: Int)

  /** M4: round-robin group of 4 (all unordered pairs), 3/1/0 points,
    * ranked by points → goal diff → goals. */
  def groupStage(rng: Random, group: Seq[String], strength: Map[String, Double]): Seq[Standing] = {
    val table = collection.mutable.Map(group.map(t => t -> Standing(t, 0, 0, 0)): _*)
    for (Seq(t1, t2) <- group.combinations(2)) {
      val r = simulateMatch(rng, strength(t1), strength(t2), elimination = false)
      def upd(t: String, gf: Int, ga: Int): Unit = {
        val s = table(t)
        val pts = if (gf > ga) 3 else if (gf == ga) 1 else 0
        table(t) = Standing(t, s.points + pts, s.diff + gf - ga, s.goals + gf)
      }
      upd(t1, r.homeGoals, r.awayGoals)
      upd(t2, r.awayGoals, r.homeGoals)
    }
    table.values.toSeq.sortBy(s => (-s.points, -s.diff, -s.goals, s.team))
  }

  /** M5: knockout among `teams` (power of two), elimination mode. Returns
    * (round, team) eliminations plus the champion with round = 0. */
  def knockout(rng: Random, teams: Seq[String], strength: Map[String, Double]): Seq[(Int, String)] = {
    var field = teams
    var round = math.ceil(math.log(teams.size) / math.log(2)).toInt
    val out = collection.mutable.Buffer[(Int, String)]()
    while (field.size > 1) {
      val next = field.grouped(2).map { case Seq(a, b) =>
        val r = simulateMatch(rng, strength(a), strength(b), elimination = true)
        val (winner, loser) = if (r.winner >= 0) (a, b) else (b, a)
        out += ((round, loser))
        winner
      }.toSeq
      field = next
      round -= 1
    }
    out += ((0, field.head))
    out.toSeq
  }

  /** Full tournament: groups of 4 → top-2 advance → knockout. */
  def tournament(seed: Long, groups: Seq[Seq[String]],
                 strength: Map[String, Double]): (Seq[(String, Standing)], Seq[(Int, String)]) = {
    val rng = new Random(seed)
    val standings = groups.zipWithIndex.flatMap { case (g, i) =>
      groupStage(rng, g, strength).map(s => (s"group_$i", s))
    }
    val qualifiers = groups.zipWithIndex.flatMap { case (g, i) =>
      standings.filter(_._1 == s"group_$i").map(_._2).take(2).map(_.team)
    }
    (standings, knockout(rng, qualifiers, strength))
  }
}
