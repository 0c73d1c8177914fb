package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.crawl.Politeness
import graft.crawl.Politeness.HostPolicy

class PolitenessSpec extends AnyFunSuite {

  test("budgets derive from reference rate limits in simulated time") {
    val b1 = Politeness.budgets(Politeness.referencePolicies, roundMinutes = 1)
    // zenodo allows 100/min BUT only 5000/h: sustained budget = 5000/60 = 83
    assert(b1("zenodo") === 83)
    assert(b1("figshare") === 60) // 1 req/s
    assert(b1("osf") === 120)

    // hourly cap binds on long rounds: 60 simulated minutes at 100/min
    // would be 6000, but zenodo caps at 5000/h
    val b60 = Politeness.budgets(Politeness.referencePolicies, roundMinutes = 60)
    assert(b60("zenodo") === 5000)
    assert(b60("figshare") === 3600)
  }

  test("budgets never starve a host to zero") {
    val b = Politeness.budgets(Map("slow" -> HostPolicy(1)), roundMinutes = 0.1)
    assert(b("slow") === 1)
  }

  test("drain schedule spaces fetches at the host rate") {
    val p = HostPolicy(60) // 1/s
    assert(Politeness.scheduledSecond(p, 0, 0) === 0.0)
    assert(Politeness.scheduledSecond(p, 0, 10) === 10.0)
    assert(Politeness.scheduledSecond(p, 300, 5) === 305.0)
  }

  test("zenodo-shaped sequence: 5000/h cap holds across 60 one-minute rounds") {
    val p = Politeness.referencePolicies("zenodo")
    val perRound = Politeness.budgets(Politeness.referencePolicies, 1)("zenodo")
    // a full simulated hour of rounds, every round draining its whole budget
    val times = for {
      r <- 0 until 60
      k <- 0 until perRound
    } yield Politeness.scheduledSecond(p, r * Politeness.RoundSeconds, k)

    // every simulated-hour window stays under the cap
    times.foreach { t0 =>
      val inHour = times.count(t => t >= t0 && t < t0 + 3600.0)
      assert(inHour <= p.hourlyCap.get,
        s"$inHour fetches in the hour starting at $t0")
    }
    // and it is the budgets() proration that enforces it — the burst rate
    // alone would blow the cap (100/min × 60 min = 6000 > 5000)
    assert(p.ratePerMinute * 60 > p.hourlyCap.get)
    assert(perRound * 60 <= p.hourlyCap.get)

    // within a round, fetches are spaced at the rate (never bunched)
    val round0 = times.take(perRound)
    round0.sliding(2).foreach {
      case Seq(a, b) => assert(b - a >= 60.0 / p.ratePerMinute - 1e-9)
      case _ =>
    }
  }
}
